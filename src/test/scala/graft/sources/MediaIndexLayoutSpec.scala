package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.queries.MultimodalQueries

/** Incremental perceptual-dedup contract of the persisted tile index:
  * a delta check must return EXACTLY the full-corpus
  * `mm_near_dup_pairs` rows touching the delta, appends must be
  * idempotent (retries, replays, within-batch dups), and purge +
  * compact must follow the layouts' tombstone lifecycle. sf0.01: the
  * sf0.001 corpus has no delta-touching perceptual pair under the
  * stride-2 signature. */
class MediaIndexLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def docs(pred: org.apache.spark.sql.Column): DataFrame =
    graft.util.Tables.load(spark, dir, "documents")
      .filter(pred).select(col("doc_id"), col("text"))

  private def dropIndex(prefix: String): Unit =
    Seq("tiles", "ids", "tombstones").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  private def pairSet(df: DataFrame): Seq[(String, Long, Long, Long, Boolean)] =
    df.select(col("media_format"), col("doc_a"), col("doc_b"),
      col("hamming"), col("same_bytes")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
      .toSeq.sorted

  test("dedupDelta equals the registered query and the full-corpus restriction") {
    dropIndex("mi_idx")
    val deltaPred = col("doc_id") % 5 === 3
    MediaIndexLayout.buildDocs(spark, "mi_idx", docs(!deltaPred), buckets = 4)
    try {
      val served = MediaIndexLayout.dedupDelta(spark, "mi_idx",
        docs(deltaPred))
      val got = pairSet(served)
      assert(got.nonEmpty)
      assert(got == pairSet(MultimodalQueries.deltaPairs(spark, dir)))
      assert(got == pairSet(MultimodalQueries.nearDupPairs(spark, dir)
        .filter(col("doc_a") % 5 === 3 || col("doc_b") % 5 === 3)))
      val p = served.queryExecution.executedPlan.toString
      assert(p.contains("mi_idx_tiles"), p)
    } finally dropIndex("mi_idx")
  }

  test("append idempotence and replayed-delta stability") {
    dropIndex("mi_retry")
    val deltaPred = col("doc_id") % 5 === 3
    MediaIndexLayout.buildDocs(spark, "mi_retry", docs(!deltaPred), buckets = 4)
    try {
      val before = pairSet(MediaIndexLayout.dedupDelta(spark, "mi_retry",
        docs(deltaPred)))
      MediaIndexLayout.appendDeltaDocs(spark, "mi_retry", docs(deltaPred),
        buckets = 4)
      val n = spark.table("mi_retry_tiles").count()
      MediaIndexLayout.appendDeltaDocs(spark, "mi_retry", docs(deltaPred),
        buckets = 4)
      assert(spark.table("mi_retry_tiles").count() == n)
      MediaIndexLayout.appendDeltaDocs(spark, "mi_retry",
        docs(col("doc_id") === 3L).unionAll(docs(col("doc_id") === 3L)),
        buckets = 4)
      assert(spark.table("mi_retry_tiles").count() == n)
      // the index holds the delta now; a replayed check is identical
      assert(pairSet(MediaIndexLayout.dedupDelta(spark, "mi_retry",
        docs(deltaPred))) == before)
      // and the appended index equals a one-shot full build
      dropIndex("mi_ref")
      MediaIndexLayout.buildDocs(spark, "mi_ref", docs(col("doc_id").isNotNull),
        buckets = 4)
      try {
        assert(spark.table("mi_retry_tiles").collect().toSet ==
          spark.table("mi_ref_tiles").collect().toSet)
        assert(spark.table("mi_retry_tiles").count() ==
          spark.table("mi_ref_tiles").count())
      } finally dropIndex("mi_ref")
    } finally dropIndex("mi_retry")
  }

  test("staleness gauge: coverage + tombstone backlog") {
    dropIndex("mi_stale")
    MediaIndexLayout.buildDocs(spark, "mi_stale", docs(col("doc_id") < 400L),
      buckets = 4)
    try {
      def gauge() = MediaIndexLayout.stalenessMetrics(spark, dir, "mi_stale")
        .collect().head
      assert(gauge().getAs[Long]("coverage_ppm") == 800000L)
      import spark.implicits._
      MediaIndexLayout.purgeDocs(spark, "mi_stale", Seq(7L).toDF("doc_id"))
      val g = gauge()
      assert(g.getAs[Long]("n_tombstoned") == 1L)
      assert(g.getAs[Long]("n_docs_indexed") == 399L)
    } finally dropIndex("mi_stale")
  }

  test("purge hides an asset immediately; compact erases it") {
    dropIndex("mi_purge")
    val deltaPred = col("doc_id") % 5 === 3
    MediaIndexLayout.buildDocs(spark, "mi_purge", docs(!deltaPred), buckets = 4)
    try {
      val before = pairSet(MediaIndexLayout.dedupDelta(spark, "mi_purge",
        docs(deltaPred)))
      val victim = before.flatMap(p => Seq(p._2, p._3)).find(_ % 5 != 3).get
      import spark.implicits._
      MediaIndexLayout.purgeDocs(spark, "mi_purge", Seq(victim).toDF("doc_id"))
      val after = pairSet(MediaIndexLayout.dedupDelta(spark, "mi_purge",
        docs(deltaPred)))
      assert(after == before.filterNot(p => p._2 == victim || p._3 == victim))
      assert(after.size < before.size)
      MediaIndexLayout.compact(spark, "mi_purge", buckets = 4)
      assert(spark.table("mi_purge_tiles")
        .filter(col("doc_id") === victim).count() == 0)
      assert(!spark.catalog.tableExists("mi_purge_tombstones"))
      assert(pairSet(MediaIndexLayout.dedupDelta(spark, "mi_purge",
        docs(deltaPred))) == after)
    } finally dropIndex("mi_purge")
  }
}
