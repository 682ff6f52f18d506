package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.AnnStalenessMonitor

/** ANN geometry staleness: a fresh index must audit (0, 0) against its
  * own build sample, a planted distribution shift (appended delta
  * collapsing into one region of vector space) must raise the alert,
  * and a rebuild — which retrains/re-baselines the geometry over the
  * grown corpus — must clear it. */
class AnnStalenessSpec extends SparkSpec {
  import spark.implicits._

  private def dropIndex(prefix: String): Unit = dropPrefix(prefix)

  test("planted shift raises the alert; rebuild clears it") {
    val rnd = new scala.util.Random(17)
    def noise(): Array[Float] = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    // corpus: 800 spread-out vectors (ids 200-999). Delta: 200 vectors
    // collapsed around ONE direction the corpus barely occupies (ids
    // 0-199) — the distribution shift a drifting embedding model
    // produces. Delta ids sit INSIDE the deterministic centroid/seed
    // selectors (vec_id % 40 = 7, vec_id < 500 && % 16 = 7) so the
    // REBUILD's retrained geometry genuinely absorbs the new mass —
    // the corpus-only build never sees them (its where-clause excludes
    // the id range).
    val spike = Array.tabulate(64)(i => if (i < 4) 8f else 0.05f)
    val corpus = (200L until 1000L).map(id => (id, "c", noise()))
    val delta = (0L until 200L).map { id =>
      val n = noise()
      (id, "d", spike.zip(n).map { case (s, x) => s + 0.1f * x })
    }
    val d = tmpDir("graft-annstale")
    writeFixture(d, "embeddings",
      (corpus ++ delta).toDF("vec_id", "label", "embedding"))
    val dir = d.toString
    dropIndex("stale_ix")
    AnnIndexLayout.build(spark, dir, "stale_ix", buckets = 4,
      where = col("vec_id") >= 200L)
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      // fresh index vs its own build sample: exactly (0, 0) — the
      // audit reproduces the build-time reference
      val buildSample = emb.filter(col("vec_id") >= 200L &&
        AnnIndexLayout.QrefSamplePred)
      val fresh = AnnIndexLayout.stalenessMetrics(spark, "stale_ix",
        buildSample).head()
      assert(fresh.getAs[Long]("occ_skew_ppm") == 0L, fresh.toString)
      assert(fresh.getAs[Long]("qerr_rise_ppm") == 0L, fresh.toString)

      // shift arrives: file the collapsed delta, audit with it as the
      // freshness probe — occupancy skews toward the spike's cell and
      // the frozen codebook reconstructs the spike badly
      val deltaVecs = emb.filter(col("vec_id") < 200L)
        .select(col("vec_id"), col("embedding"))
      AnnIndexLayout.appendDeltaVectors(spark, "stale_ix", deltaVecs,
        buckets = 4)
      val monitor = new AnnStalenessMonitor()
      val (occ, qerr) = monitor.check(spark, "stale_ix", deltaVecs, atMs = 0L)
      assert(monitor.firing,
        s"planted shift did not raise: occ=$occ ppm, qerr=$qerr ppm")

      // rebuild over the grown corpus: geometry retrained/re-baselined
      // (the reference tables recapture the union), next audit clears
      AnnIndexLayout.build(spark, dir, "stale_ix", buckets = 4)
      val (occ2, qerr2) = monitor.check(spark, "stale_ix", deltaVecs,
        atMs = 1000L)
      assert(!monitor.firing,
        s"rebuild did not clear: occ=$occ2 ppm, qerr=$qerr2 ppm")
      assert(occ2 == 0L, s"rebuilt index occupancy should re-baseline: $occ2")
      // the alert history records exactly raise -> clear
      assert(monitor.transitions.map(_.firing) == Seq(true, false))
    } finally dropIndex("stale_ix")
  }

  test("maintenance stream ticks the monitor per filed batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(29)
    def noise(): Array[Float] = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val spike = Array.tabulate(64)(i => if (i < 4) 8f else 0.05f)
    val corpus = (200L until 1000L).map(id => (id, "c", noise()))
    val delta = (0L until 200L).map { id =>
      val n = noise()
      (id, "d", spike.zip(n).map { case (s, x) => s + 0.1f * x })
    }
    val d = tmpDir("graft-annstale-stream")
    writeFixture(d, "embeddings",
      (corpus ++ delta).toDF("vec_id", "label", "embedding"))
    dropIndex("stale_sx")
    AnnIndexLayout.build(spark, d.toString, "stale_sx", buckets = 4,
      where = col("vec_id") >= 200L)
    try {
      val monitor = new AnnStalenessMonitor()
      val rows = spark.read.parquet(s"$d/embeddings.parquet")
        .filter(col("vec_id") < 200L)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val mem = MemoryStream[(Long, Array[Float])]
      val q = AnnIndexLayout.maintainStream(spark, "stale_sx",
        mem.toDF().toDF("vec_id", "embedding"), buckets = 4,
        monitor = Some(monitor))
      try {
        mem.addData(b1.toSeq); q.processAllAvailable()
        mem.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      // the collapsed-delta shift raised the alert during maintenance
      // — no separate audit job needed, the ingest cadence IS the
      // scrape cadence
      assert(monitor.firing, monitor.transitions.toString)
    } finally dropIndex("stale_sx")
  }
}
