package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time one named query from [[SparkEntry.queries]] repeatedly
  * and print its formatted physical plan.
  *
  * Usage: runMain graft.Profile <name> [sfDir] [reps] [--explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      // keep the dev profiler's session identical to Bench's (see the
      // rationale there), or its numbers stop predicting bench numbers
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tables.names.foreach { n =>
      try graft.util.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    val fn = SparkEntry.queries(name)
    if (explain) {
      // queries that end in Tables.released return a checkpointed RDD
      // scan; the plan that actually ran is stashed by released —
      // print that one when present (reset first: it is sticky across
      // queries in one session)
      graft.util.Tables.lastReleasedPlan = None
      val df = fn(spark, sfDir)
      graft.util.Tables.lastReleasedPlan match {
        case Some(qe) => println(qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        case None => df.explain("formatted")
      }
    }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
