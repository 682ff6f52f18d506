package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Publish atomicity of the generational ANN index: a rebuild killed
  * at ANY point must leave readers resolving one COMPLETE generation —
  * the old one if the pointer never flipped, the new one after — and a
  * re-run must repair the catalog/warehouse without manual steps. This
  * is the contract that replaced the rename-loop swap (which had a
  * window where a table was under neither name). */
class AnnPublishSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val P = "ann_pub"

  private case class Boom(at: String) extends RuntimeException(at)

  private def buildKilledAt(at: String, where: org.apache.spark.sql.Column)
      : Unit = {
    val thrown = intercept[Boom] {
      AnnIndexLayout.buildImpl(spark, dir, P, 4, where,
        dropSuperseded = true, step => if (step == at) throw Boom(at))
    }
    assert(thrown.at == at)
  }

  test("a build killed before the pointer flip leaves the old generation serving; re-run repairs") {
    dropPrefix(P)
    try {
      AnnIndexLayout.build(spark, dir, P, buckets = 4,
        where = col("vec_id") < 600L)
      val gen1 = AnnIndexLayout.livePrefix(spark, P)
      val before = AnnIndexLayout.query(spark, dir, P).collect().toSeq
      assert(before.nonEmpty)

      // kill the rebuild AFTER the new generation is fully written but
      // BEFORE the pointer flips: a concurrent reader must still
      // resolve the complete OLD index
      buildKilledAt("before-publish", where = col("vec_id") < 900L)
      assert(AnnIndexLayout.livePrefix(spark, P) == gen1)
      assert(AnnIndexLayout.query(spark, dir, P).collect().toSeq == before)

      // the re-run sweeps the stranded half-published generation and
      // completes; readers flip to the new index
      AnnIndexLayout.build(spark, dir, P, buckets = 4,
        where = col("vec_id") < 900L)
      val gen2 = AnnIndexLayout.livePrefix(spark, P)
      assert(gen2 != gen1)
      assert(AnnIndexLayout.query(spark, dir, P).collect().nonEmpty)
      // the superseded generation is gone (catalog and warehouse)
      assert(!spark.catalog.tableExists(s"${gen1}_cells"))
    } finally dropPrefix(P)
  }

  test("a build killed after the flip serves the NEW generation complete; sweep reclaims the old") {
    dropPrefix(P)
    try {
      AnnIndexLayout.build(spark, dir, P, buckets = 4,
        where = col("vec_id") < 600L)
      val gen1 = AnnIndexLayout.livePrefix(spark, P)

      // kill between the flip and the old-generation drop: readers see
      // the complete NEW index immediately; the old tables linger as
      // reclaimable bytes, never as a serving surface
      buildKilledAt("after-publish", where = col("vec_id") < 900L)
      val gen2 = AnnIndexLayout.livePrefix(spark, P)
      assert(gen2 != gen1)
      val served = AnnIndexLayout.query(spark, dir, P).collect().toSeq
      assert(served.nonEmpty)
      assert(spark.catalog.tableExists(s"${gen1}_cells")) // leftover bytes

      // the deferred sweep (what a deployment runs after its max query
      // latency) reclaims the superseded generation without touching
      // the live one
      AnnIndexLayout.sweepStaleGenerations(spark, P, keepGenerations = 0)
      assert(!spark.catalog.tableExists(s"${gen1}_cells"))
      assert(AnnIndexLayout.query(spark, dir, P).collect().toSeq == served)
    } finally dropPrefix(P)
  }

  test("dropSuperseded = false defers the old-generation drop for in-flight readers") {
    dropPrefix(P)
    try {
      AnnIndexLayout.build(spark, dir, P, buckets = 4,
        where = col("vec_id") < 600L)
      val gen1 = AnnIndexLayout.livePrefix(spark, P)
      // a long-running reader resolved the old generation BEFORE the
      // rebuild published — its plan reads gen1's physical tables
      val inFlight = spark.table(s"${gen1}_cells")
      AnnIndexLayout.build(spark, dir, P, buckets = 4,
        where = col("vec_id") < 900L, dropSuperseded = false)
      assert(AnnIndexLayout.livePrefix(spark, P) != gen1)
      // the in-flight plan still completes against the old generation
      assert(inFlight.count() > 0L)
      AnnIndexLayout.sweepStaleGenerations(spark, P, keepGenerations = 0)
      assert(!spark.catalog.tableExists(s"${gen1}_cells"))
    } finally dropPrefix(P)
  }
}
