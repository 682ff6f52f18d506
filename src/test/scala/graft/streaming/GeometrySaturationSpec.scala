package graft.streaming

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sources.CuratedCorpusLayout

/** The live-geometry saturation alert
  * ([[GeometrySaturationMonitor]] over
  * [[CuratedCorpusLayout.geometryAudit]]): a corpus outgrowing its
  * frozen band width W must raise the same breach-sustain-clear signal
  * the other index monitors have — planted saturation fires it, a
  * rebuild at a wider W clears it. */
class GeometrySaturationSpec extends SparkSpec {
  import spark.implicits._

  test("breach-sustain-clear rule on a crafted timeline") {
    val m = new GeometrySaturationMonitor(evictedPpmMax = 0L,
      sustainMs = 100L)
    m.record(0L, 0L, 0L)
    assert(!m.firing)
    m.record(10L, 500L, 1L) // breach starts; not yet sustained
    assert(!m.firing)
    m.record(120L, 600L, 2L) // sustained past 100 ms
    assert(m.firing)
    m.record(200L, 0L, 0L) // a rebuild cleared the eviction
    assert(!m.firing)
    assert(m.transitions.map(_.firing) == Seq(true, false))
  }

  test("planted saturation on the LIVE band state fires; a wider-W rebuild clears") {
    val dir = tmpDir("geomsat")
    // pseudo-random 64-dim directions (deterministic, no RNG): at a
    // 1-plane band (2 buckets) 2400 of them overfill the 1000-row
    // pool cap; at W=8 (256 buckets) the same corpus sits far below it
    val n = 2400
    writeFixture(dir, "embeddings",
      (1 to n).map(i => (i.toLong,
        Array.tabulate(64)(d => math.sin(i * 64.0 + d).toFloat)))
        .toDF("vec_id", "embedding"))
    writeFixture(dir, "documents",
      (1 to 50).map(i => (i.toLong, "s0",
        (0 until 20).map(t => s"w${i}_$t").mkString(" ")))
        .toDF("doc_id", "source", "text"))

    dropPrefix("geomsat")
    try {
      CuratedCorpusLayout.buildIncremental(spark, dir.toString,
        "geomsat", buckets = 4, cosNBands = 1, cosPlanesPerBand = 1)
      // fixture strength: the frozen W=1 geometry must actually be
      // saturated on the persisted state
      val audit = CuratedCorpusLayout.geometryAudit(spark, "geomsat")
        .collect()
      assert(audit.exists(_.getAs[Long]("n_saturated_buckets") > 0L),
        audit.mkString("; "))
      assert(audit.exists(_.getAs[Long]("evicted_ppm") > 0L))

      val m = new GeometrySaturationMonitor()
      val (ppm1, sat1) = m.check(spark, "geomsat", atMs = 1000L)
      assert(ppm1 > 0L && sat1 > 0L)
      assert(m.firing, "saturated live geometry must raise the alert")

      // the rebuild that re-freezes a wider W (the dial the alert
      // tells the operator to turn) clears it on the next tick
      CuratedCorpusLayout.buildIncremental(spark, dir.toString,
        "geomsat", buckets = 4, cosNBands = 1, cosPlanesPerBand = 8)
      val (ppm2, sat2) = m.check(spark, "geomsat", atMs = 2000L)
      assert(ppm2 == 0L && sat2 == 0L,
        s"W=8 rebuild still saturated: ppm=$ppm2 sat=$sat2")
      assert(!m.firing)
      assert(m.transitions.map(_.firing) == Seq(true, false))

      // the audit reads ONLY the narrow persisted band state — no
      // embeddings, no text (the per-tick cost claim)
      val plan = CuratedCorpusLayout.geometryAudit(spark, "geomsat")
        .queryExecution.executedPlan.toString
      assert(plan.contains("geomsat_cos_bands"))
      assert(!plan.contains("embeddings.parquet") &&
        !plan.contains("documents.parquet"), plan)
    } finally dropPrefix("geomsat")
  }
}
