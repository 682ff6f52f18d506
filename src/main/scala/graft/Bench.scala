package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // no static broadcasts: planning-time broadcast of expensive
      // *derived* tables (dedup signature/posting self-joins) re-executes
      // their whole subtree in a single-threaded broadcast job — measured
      // 10-100x outliers at sf0.1.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // ...but DO let AQE convert at runtime: the adaptive threshold
      // DEFAULTS to the static one (so -1 alone disables broadcast
      // everywhere). Runtime conversion builds the broadcast from the
      // already-materialized shuffle output — no subtree re-execution —
      // which is exactly the stats-driven plan a real cluster wants.
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      // shuffle writer: never take the bypass-merge path (it creates one
      // file per REDUCE partition per map task — R*M file opens/commits;
      // jstack sampling showed ~35% of executor CPU in shuffle-file
      // open/commit at sf0.1). The sort-based writer writes 1 data + 1
      // index file per map task at any reduce count — and at production
      // reduce counts (>200) bypass never fires anyway, so this only
      // changes the small-shuffle regime where it was measured 1.3-3x.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // AQE partition coalescing: size-based, not parallelism-first —
      // parallelismFirst=true (default) coalesces only down to the core
      // count, pinning every tiny stage at 32 tasks whose per-task
      // shuffle-file overhead dwarfs its rows. false lets AQE derive the
      // partition count from bytes (advisoryPartitionSizeInBytes), the
      // scale-adaptive behavior the optimization guide prescribes; at
      // 100 TB the same setting yields thousands of right-sized tasks.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed session warmup: parquet file indexes, codegen compiler,
    // JIT — one-time costs that would otherwise land on the first query
    graft.util.Tables.names.foreach { n =>
      try graft.util.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    // JMH-style steady-state measurement: run the full suite N times and
    // report the per-query minimum. Iteration 1 absorbs Janino codegen
    // compilation and JIT warmup; the min is also robust to transient
    // host contention (observed 8x uniform inflation on identical code
    // between two runs of the same suite). Mode is declared in the JSON.
    val iters = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_ITERS").flatMap(_.toIntOption).getOrElse(3))
    // wall-clock budget: on a contended host one pass can inflate ~8x,
    // so later passes are skipped rather than risking an unbounded run;
    // the first pass always completes (full coverage), extra passes
    // only tighten the minimum. Sized so the FULL suite fits min-of-3
    // at its current ~300 s/pass: the r12 default of 600 silently
    // degraded the driver run to min-of-2 once the suite outgrew it,
    // making the round-over-round comparison noisier by construction —
    // the budget is a contention backstop, never the mode selector.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1800").toLong
    // SPARK_GRAFT_BENCH_ONLY=q1,q2,... isolates a subset — the tool for
    // distinguishing a real plan regression from whole-suite JVM
    // contention (162 min-of-3 queries share one JVM: GC pressure and
    // codegen-cache thrash inflate heavy queries uniformly)
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(list) =>
        val want = list.split(",").map(_.trim).filter(_.nonEmpty)
        want.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query $n"))
        want.toSeq
      case None => SparkEntry.queries.keys.toSeq
    }
    val best = scala.collection.mutable.Map[String, Double]()
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val wall0 = System.nanoTime()
    var pass = 0
    while (pass < iters &&
        (pass == 0 || (System.nanoTime() - wall0) / 1e9 < budgetSec)) {
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        // a failure must be loud, and its time-to-failure must NOT enter
        // the timings — silently recording it would report a broken
        // query as a speedup in round-over-round comparisons
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
          finally {
            // queries may persist() intermediates; drop them so later
            // queries (and later iterations) never time against a warm
            // cache. localCheckpoint() blocks live at the RDD layer,
            // outside cacheManager — drop those too.
            spark.sharedState.cacheManager.clearCache()
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      }
      pass += 1
    }
    // a query that never succeeded has no timing: report it under
    // "errors" rather than inventing a number (the JSON consumer sees
    // the shrunken coverage explicitly). Queries that failed in SOME
    // pass but still have a valid min timing are transient — counted
    // separately so subtracting "errors" from coverage never
    // double-books them against "queries"
    val results = names.filter(best.contains).map(n => n -> best(n))
    val total = results.map(_._2).sum
    val neverSucceeded = failed.filterNot(best.contains)
    val nTransient = failed.size - neverSucceeded.size
    val errJson = "\"errors\":[" +
      neverSucceeded.map(n => "\"" + n + "\"").mkString(",") + "]"
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    // full-precision per-query detail goes to a file; stdout gets ONE
    // compact line. The harness that collects this output keeps only the
    // last ~2000 chars of the run log, and with 60+ queries a
    // full-precision line overflows that window — the line's head (the
    // "metric"/"value" fields) scrolls out and the collector parses
    // nothing. Seconds at millisecond precision are far below run-to-run
    // noise (±30%), so the compact line loses no information.
    val fullJson = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","mode":"min-of-$pass",$errJson,"n_transient":$nTransient,"queries":$qs,"sf":"$sfDir"}"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"),
      (fullJson + "\n").getBytes("UTF-8"))

    // slowest-first so that, if the line must shrink, only the fastest
    // queries collapse into a single "_rest" sum (totals stay exact)
    val sorted = results.sortBy { case (n, v) => (-v, n) }
    def render(keep: Int): String = {
      val kept = sorted.take(keep)
      val rest = sorted.drop(keep)
      val entries = kept.map { case (k, v) => "\"" + k + "\":" + f3(v) } ++
        (if (rest.nonEmpty) Seq("\"_rest\":" + f3(rest.map(_._2).sum)) else Nil)
      val qs = entries.mkString("{", ",", "}")
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","mode":"min-of-$pass","elided":${rest.size},"n_failed":${neverSucceeded.size},"n_transient":$nTransient,"detail":"bench_detail.json","queries":$qs,"sf":"$sfDir"}"""
    }
    val maxLine = 1850 // tail window 2000 minus sbt's trailing [success] line
    var keep = sorted.size
    while (keep > 0 && render(keep).length > maxLine) keep -= 1
    println(render(keep))
    spark.stop()
  }
}
