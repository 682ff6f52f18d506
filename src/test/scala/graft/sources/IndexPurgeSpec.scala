package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Deletion lifecycle of the persisted indexes: purge -> serve
  * excludes the ids immediately; purge is idempotent; compaction
  * physically erases the rows, clears the tombstones, and leaves the
  * serve output unchanged; a purged id cannot be resurrected by a
  * delta until compaction has cleared its tombstone. */
class IndexPurgeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("text index: purge excludes docs, survives compaction, idempotent") {
    TextIndexLayout.build(spark, dir, "purge_txt", buckets = 4)
    try {
      val baseline = TextIndexLayout.query(spark, dir, "purge_txt").collect()
      // purge every doc the baseline returned for query 0 — the
      // strongest possible interference with that query's results
      val victims = baseline.filter(_.getAs[Long]("q_id") == 0L)
        .map(_.getAs[Long]("doc_id")).distinct.toSeq
      assert(victims.nonEmpty)
      TextIndexLayout.purgeDocs(spark, "purge_txt", victims.toDF("doc_id"))

      val served = TextIndexLayout.query(spark, dir, "purge_txt").collect()
      assert(!served.exists(r => victims.contains(r.getAs[Long]("doc_id"))))
      // scores of survivors are untouched (contrib rows are per-doc)
      // and the purge can only PROMOTE them — every baseline non-victim
      // row must still be served with the same score (new rows from
      // beyond the old top-k cutoff legitimately enter)
      val expected = baseline
        .filter(r => !victims.contains(r.getAs[Long]("doc_id")))
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("score_pico")))
      val got = served.map(r => (r.getAs[Long]("q_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_pico")))
      assert(expected.toSet.subsetOf(got.toSet))
      // re-purging the same ids changes nothing
      TextIndexLayout.purgeDocs(spark, "purge_txt", victims.toDF("doc_id"))
      assert(TextIndexLayout.query(spark, dir, "purge_txt").collect()
        .map(_.toString).toSeq == served.map(_.toString).toSeq)

      // compaction: rows physically gone, tombstones cleared, serve
      // byte-identical
      TextIndexLayout.compact(spark, "purge_txt", buckets = 4)
      assert(spark.table(s"${TextIndexLayout.livePrefix(spark, "purge_txt")}_postings")
        .filter(col("doc_id").isin(victims: _*)).count() == 0L)
      assert(!spark.catalog.tableExists("purge_txt_tombstones"))
      assert(TextIndexLayout.query(spark, dir, "purge_txt").collect()
        .map(_.toString).toSeq == served.map(_.toString).toSeq)
    } finally {
      dropPrefix("purge_txt")
    }
  }

  test("text index: a delta cannot resurrect a purged doc before compaction") {
    TextIndexLayout.build(spark, dir, "purge_res", buckets = 4,
      where = col("doc_id") =!= 100L)
    try {
      TextIndexLayout.appendDelta(spark, dir, "purge_res",
        col("doc_id") === 100L, buckets = 4)
      assert(spark.table(s"${TextIndexLayout.livePrefix(spark, "purge_res")}_postings")
        .filter(col("doc_id") === 100L).count() > 0L)
      TextIndexLayout.purgeDocs(spark, "purge_res", Seq(100L).toDF("doc_id"))
      // the tombstone out-filters the doc even though its delta rows
      // are still on disk, and a replayed delta files nothing new
      TextIndexLayout.appendDelta(spark, dir, "purge_res",
        col("doc_id") === 100L, buckets = 4)
      val served = TextIndexLayout.query(spark, dir, "purge_res").collect()
      assert(!served.exists(_.getAs[Long]("doc_id") == 100L))
      // after compaction the id is physically gone AND free to return
      TextIndexLayout.compact(spark, "purge_res", buckets = 4)
      TextIndexLayout.appendDelta(spark, dir, "purge_res",
        col("doc_id") === 100L, buckets = 4)
      // presence in postings is the resurrection contract (top-k
      // membership is score-dependent); the serve filter is gone too
      assert(spark.table(s"${TextIndexLayout.livePrefix(spark, "purge_res")}_postings")
        .filter(col("doc_id") === 100L).count() > 0L)
      assert(!spark.catalog.tableExists("purge_res_tombstones"))
    } finally {
      dropPrefix("purge_res")
    }
  }

  test("ann index: purge excludes vectors from candidates and survives compaction") {
    AnnIndexLayout.build(spark, dir, "purge_ann", buckets = 4)
    try {
      val baseline = AnnIndexLayout.query(spark, dir, "purge_ann").collect()
      val victims = baseline.take(5).map(_.getAs[Long]("n_id")).distinct.toSeq
      assert(victims.nonEmpty)
      AnnIndexLayout.purgeVectors(spark, "purge_ann", victims.toDF("n_id"))
      val served = AnnIndexLayout.query(spark, dir, "purge_ann").collect()
      assert(!served.exists(r => victims.contains(r.getAs[Long]("n_id"))))
      AnnIndexLayout.compact(spark, "purge_ann", buckets = 4)
      val phys = AnnIndexLayout.livePrefix(spark, "purge_ann")
      assert(spark.table(s"${phys}_cells")
        .filter(col("n_id").isin(victims: _*)).count() == 0L)
      assert(spark.table(s"${phys}_codes")
        .filter(col("n_id").isin(victims: _*)).count() == 0L)
      assert(!spark.catalog.tableExists("purge_ann_tombstones"))
      assert(AnnIndexLayout.query(spark, dir, "purge_ann").collect()
        .map(_.toString).toSeq == served.map(_.toString).toSeq)
    } finally dropPrefix("purge_ann")
  }

  test("dense sig index: purge excludes vectors and survives compaction") {
    HybridIndexLayout.buildDense(spark, dir, "purge_sig", buckets = 4)
    try {
      val qs = graft.util.Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id"), col("embedding"))
      val baseline = HybridIndexLayout.serveDense(spark, dir, "purge_sig",
        qs, excludeSelf = true).collect()
      val victims = baseline.take(5).map(_.getAs[Long]("n_id")).distinct.toSeq
      HybridIndexLayout.purgeDense(spark, "purge_sig", victims.toDF("vec_id"))
      val served = HybridIndexLayout.serveDense(spark, dir, "purge_sig",
        qs, excludeSelf = true).collect()
      assert(!served.exists(r => victims.contains(r.getAs[Long]("n_id"))))
      HybridIndexLayout.compactDense(spark, "purge_sig", buckets = 4)
      assert(spark.table(s"${HybridIndexLayout.livePrefixDense(spark, "purge_sig")}_sigs")
        .filter(col("vec_id").isin(victims: _*)).count() == 0L)
      assert(!spark.catalog.tableExists("purge_sig_tombstones"))
      assert(HybridIndexLayout.serveDense(spark, dir, "purge_sig",
        qs, excludeSelf = true).collect()
        .map(_.toString).toSeq == served.map(_.toString).toSeq)
    } finally {
      dropPrefix("purge_sig")
    }
  }

  test("hybrid serving: a purge lands through BOTH legs of the fusion") {
    TextIndexLayout.build(spark, dir, "purge_hyb_txt", buckets = 4)
    HybridIndexLayout.buildDense(spark, dir, "purge_hyb_ann", buckets = 4)
    try {
      val baseline = HybridIndexLayout.queryHybrid(spark, dir,
        "purge_hyb_txt", "purge_hyb_ann").collect()
      // victims: docs the fusion actually returns (strongest case)
      val victims = baseline.take(8).map(_.getAs[Long]("doc_id"))
        .distinct.toSeq
      assert(victims.nonEmpty)
      TextIndexLayout.purgeDocs(spark, "purge_hyb_txt",
        victims.toDF("doc_id"))
      HybridIndexLayout.purgeDense(spark, "purge_hyb_ann",
        victims.toDF("vec_id"))
      val served = HybridIndexLayout.queryHybrid(spark, dir,
        "purge_hyb_txt", "purge_hyb_ann").collect()
      assert(served.nonEmpty)
      assert(!served.exists(r => victims.contains(r.getAs[Long]("doc_id"))))
      // and the purge survives compaction of both legs
      TextIndexLayout.compact(spark, "purge_hyb_txt", buckets = 4)
      HybridIndexLayout.compactDense(spark, "purge_hyb_ann", buckets = 4)
      assert(HybridIndexLayout.queryHybrid(spark, dir,
        "purge_hyb_txt", "purge_hyb_ann").collect()
        .map(_.toString).toSeq == served.map(_.toString).toSeq)
    } finally {
      dropPrefix("purge_hyb_txt")
      dropPrefix("purge_hyb_ann")
    }
  }

  test("an unpurged index's serve plan carries no tombstone join") {
    TextIndexLayout.build(spark, dir, "purge_none", buckets = 4)
    try {
      val p = TextIndexLayout.query(spark, dir, "purge_none")
        .queryExecution.executedPlan.toString
      assert(!p.contains("tombstones"), p)
    } finally {
      dropPrefix("purge_none")
    }
  }
}
