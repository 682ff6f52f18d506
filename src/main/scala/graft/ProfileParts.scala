package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only scratch profiling harness (edit freely per investigation;
  * for whole-query timing use [[Profile]]). Historical findings from
  * past investigations live in the relevant operators' scaladocs and
  * commit messages, not here.
  *
  * Current shape: per named query, run `reps` times and on each rep
  * report wall seconds plus scheduler-level counters (jobs launched,
  * stages, tasks, summed task time, summed executor run+GC time) —
  * separating driver/planning overhead from actual cluster work.
  *
  * Usage: runMain graft.ProfileParts <q1,q2,...> [sfDir] [reps]
  */
object ProfileParts {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.ProfileParts <q1,q2,...> [sfDir] [reps]")
      sys.exit(2)
    }
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
    // PARTS_CONF="k=v;k=v" — extra session confs for A/B experiments
    sys.env.get("PARTS_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var runMs = 0L
    @volatile var gcMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
        if (t.taskMetrics != null) {
          runMs += t.taskMetrics.executorRunTime
          gcMs += t.taskMetrics.jvmGCTime
        }
      }
    })

    graft.util.Tables.names.foreach { n =>
      try graft.util.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L; runMs = 0L; gcMs = 0L
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+planning
        val tPlan = System.nanoTime()
        val n = df.count()
        val tEnd = System.nanoTime()
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        // listener events are async; drain by waiting until the
        // counters go quiet (a fixed sleep undercounts on a loaded
        // host; the listener bus itself is private[spark])
        var snap = (jobs, stages, tasks)
        var quiet = 0
        val drainDeadline = System.currentTimeMillis() + 5000L
        while (quiet < 2 && System.currentTimeMillis() < drainDeadline) {
          Thread.sleep(100)
          val now = (jobs, stages, tasks)
          if (now == snap) quiet += 1 else { quiet = 0; snap = now }
        }
        println(f"[parts] $name rep $i: wall ${(tEnd - t0) / 1e9}%.2f s " +
          f"(build ${(tBuild - t0) / 1e9}%.2f plan ${(tPlan - tBuild) / 1e9}%.2f) " +
          f"rows $n jobs $jobs stages $stages " +
          f"tasks $tasks taskSum ${taskMs / 1e3}%.1f s run ${runMs / 1e3}%.1f s gc ${gcMs / 1e3}%.1f s")
      }
    }
    spark.stop()
  }
}
