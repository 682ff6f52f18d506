package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.queries.DedupQueries

/** Incremental-dedup contract of the persisted MinHash band index:
  * checking a delta against the persisted corpus must return EXACTLY
  * the full-corpus `dedup_minhash_pairs` rows touching the delta
  * (check and build share the online query's shingle/sign/band/verify
  * code paths), deltas must be idempotent under retries and replays,
  * a later delta must see earlier deltas as corpus, and purge +
  * compact must follow the other layouts' tombstone lifecycle. */
class DedupIndexLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs(pred: org.apache.spark.sql.Column): DataFrame =
    graft.util.Tables.load(spark, dir, "documents")
      .filter(pred).select(col("doc_id"), col("text"))

  private def dropIndex(prefix: String): Unit =
    Seq("shingles", "bands", "ids", "tombstones").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  private def pairSet(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted

  test("dedupDelta equals the registered query and the full-corpus restriction") {
    dropIndex("dd_idx")
    val deltaPred = col("doc_id") % 5 === 3
    DedupIndexLayout.buildDocs(spark, "dd_idx", docs(!(col("doc_id") % 5 === 3)),
      buckets = 4)
    try {
      val served = DedupIndexLayout.dedupDelta(spark, "dd_idx",
        docs(deltaPred))
      val got = pairSet(served)
      assert(got.nonEmpty)
      // direction 1: the registered incremental query
      assert(got == pairSet(DedupQueries.deltaPairs(spark, dir)))
      // direction 2: the FULL-corpus pairs restricted to the delta
      val full = DedupQueries.minhashPairs(spark, dir)
        .filter(col("doc_a") % 5 === 3 || col("doc_b") % 5 === 3)
      assert(got == pairSet(full))

      // plan shape: the check reads the persisted index. The PRUNED
      // path (default at this delta size) reads the bands table inside
      // its materialized candidate stage and the pruned shingle slice
      // inside its (candidate-sized) checkpoint, so the returned plan
      // joins checkpointed RDDs — and scans NO corpus table and NO
      // documents file; the forced full-scan plan shows both bucketed
      // tables.
      val p = served.queryExecution.executedPlan.toString
      assert(p.contains("ExistingRDD"), p)
      assert(!p.contains("documents.parquet"), p)
      try {
        spark.conf.set("graft.ingest.pruneMaxDeltaDocs", "0")
        val pFull = DedupIndexLayout.dedupDelta(spark, "dd_idx",
          docs(deltaPred)).queryExecution.executedPlan.toString
        assert(pFull.contains("dd_idx_bands"), pFull)
        assert(pFull.contains("dd_idx_shingles"), pFull)
      } finally spark.conf.unset("graft.ingest.pruneMaxDeltaDocs")
    } finally dropIndex("dd_idx")
  }

  test("append is idempotent; a replayed delta re-checks identically") {
    dropIndex("dd_retry")
    val deltaPred = col("doc_id") % 5 === 3
    DedupIndexLayout.buildDocs(spark, "dd_retry", docs(!deltaPred), buckets = 4)
    try {
      val before = pairSet(DedupIndexLayout.dedupDelta(spark, "dd_retry",
        docs(deltaPred)))
      DedupIndexLayout.appendDeltaDocs(spark, "dd_retry", docs(deltaPred),
        buckets = 4)
      val nSh = spark.table("dd_retry_shingles").count()
      val nBd = spark.table("dd_retry_bands").count()
      // a blind retry files nothing
      DedupIndexLayout.appendDeltaDocs(spark, "dd_retry", docs(deltaPred),
        buckets = 4)
      assert(spark.table("dd_retry_shingles").count() == nSh)
      assert(spark.table("dd_retry_bands").count() == nBd)
      // a within-batch duplicate files once
      DedupIndexLayout.appendDeltaDocs(spark, "dd_retry",
        docs(col("doc_id") === 3L).unionAll(docs(col("doc_id") === 3L)),
        buckets = 4)
      assert(spark.table("dd_retry_shingles").count() == nSh)
      assert(spark.table("dd_retry_bands").count() == nBd)
      // the index now HOLDS the delta docs, yet a replayed check
      // returns the identical pair set (delta-id anti-join), not
      // doubled shingle counts or self-pairs
      val replay = pairSet(DedupIndexLayout.dedupDelta(spark, "dd_retry",
        docs(deltaPred)))
      assert(replay == before)
    } finally dropIndex("dd_retry")
  }

  test("a second delta sees the first as corpus") {
    dropIndex("dd_two")
    DedupIndexLayout.buildDocs(spark, "dd_two", docs(col("doc_id") < 300L),
      buckets = 4)
    try {
      DedupIndexLayout.appendDeltaDocs(spark, "dd_two",
        docs(col("doc_id") >= 300L && col("doc_id") < 400L), buckets = 4)
      val got = pairSet(DedupIndexLayout.dedupDelta(spark, "dd_two",
        docs(col("doc_id") >= 400L)))
      val full = DedupQueries.minhashPairs(spark, dir)
        .filter(col("doc_a") >= 400L || col("doc_b") >= 400L)
      assert(got.nonEmpty)
      assert(got == pairSet(full))
      // and the two appended tables equal a one-shot build over the
      // union corpus (per-doc rows are corpus-independent)
      dropIndex("dd_two_ref")
      DedupIndexLayout.buildDocs(spark, "dd_two_ref",
        docs(col("doc_id") < 400L), buckets = 4)
      try {
        assert(spark.table("dd_two_shingles").collect().toSet ==
          spark.table("dd_two_ref_shingles").collect().toSet)
        assert(spark.table("dd_two_bands").collect().toSet ==
          spark.table("dd_two_ref_bands").collect().toSet)
        assert(spark.table("dd_two_shingles").count() ==
          spark.table("dd_two_ref_shingles").count())
        assert(spark.table("dd_two_bands").count() ==
          spark.table("dd_two_ref_bands").count())
      } finally dropIndex("dd_two_ref")
    } finally dropIndex("dd_two")
  }

  test("staleness gauge tracks coverage, appends, and tombstone backlog") {
    dropIndex("dd_stale")
    DedupIndexLayout.buildDocs(spark, "dd_stale", docs(col("doc_id") < 400L),
      buckets = 4)
    try {
      def gauge() = DedupIndexLayout.stalenessMetrics(spark, dir, "dd_stale")
        .collect().head
      val g0 = gauge()
      assert(g0.getAs[Long]("n_docs_live") == 500L)
      assert(g0.getAs[Long]("n_docs_indexed") == 400L)
      assert(g0.getAs[Long]("coverage_ppm") == 800000L)
      assert(g0.getAs[Long]("n_tombstoned") == 0L)
      DedupIndexLayout.appendDeltaDocs(spark, "dd_stale",
        docs(col("doc_id") >= 400L), buckets = 4)
      assert(gauge().getAs[Long]("coverage_ppm") == 1000000L)
      import spark.implicits._
      DedupIndexLayout.purgeDocs(spark, "dd_stale", Seq(7L).toDF("doc_id"))
      val g2 = gauge()
      assert(g2.getAs[Long]("n_tombstoned") == 1L)
      assert(g2.getAs[Long]("n_docs_indexed") == 499L)
    } finally dropIndex("dd_stale")
  }

  test("purge hides a doc from checks immediately; compact erases it") {
    dropIndex("dd_purge")
    val deltaPred = col("doc_id") % 5 === 3
    DedupIndexLayout.buildDocs(spark, "dd_purge", docs(!deltaPred), buckets = 4)
    try {
      val before = pairSet(DedupIndexLayout.dedupDelta(spark, "dd_purge",
        docs(deltaPred)))
      // tombstone a corpus-side member of some verified pair
      val corpusVictim =
        before.flatMap(p => Seq(p._1, p._2)).find(_ % 5 != 3).get
      import spark.implicits._
      DedupIndexLayout.purgeDocs(spark, "dd_purge",
        Seq(corpusVictim).toDF("doc_id"))
      val after = pairSet(DedupIndexLayout.dedupDelta(spark, "dd_purge",
        docs(deltaPred)))
      assert(after == before.filterNot(p =>
        p._1 == corpusVictim || p._2 == corpusVictim))
      assert(after.size < before.size)
      // compact: rows physically gone, tombstones cleared, result same
      DedupIndexLayout.compact(spark, "dd_purge", buckets = 4)
      assert(spark.table("dd_purge_shingles")
        .filter(col("doc_id") === corpusVictim).count() == 0)
      assert(!spark.catalog.tableExists("dd_purge_tombstones"))
      assert(pairSet(DedupIndexLayout.dedupDelta(spark, "dd_purge",
        docs(deltaPred))) == after)
    } finally dropIndex("dd_purge")
  }
}
