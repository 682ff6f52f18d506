package graft.sources

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.queries.TextQueries

/** Build-once / query-many contract of the persisted BM25 index:
  * serving from the bucketed postings must return the EXACT
  * `txt_bm25_topk` rows (build and serve share the online query's
  * tokenize/encode/score code paths, so any drift is a real bug), the
  * serve plan must read the index instead of re-tokenizing the corpus,
  * and deltas must stay pinned to the BUILD-TIME vocabulary persisted
  * in `<prefix>_vocab` — no matter how the live documents table has
  * grown since. */
class TextIndexLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // generational layout: sweep the pointer view + every generation
  private def dropIndex(prefix: String): Unit = dropPrefix(prefix)

  private def physOf(prefix: String): String =
    TextIndexLayout.livePrefix(spark, prefix)

  test("serving from the persisted index equals the online bm25 query") {
    TextIndexLayout.build(spark, dir, "txt_idx_spec", buckets = 4)
    try {
      val online = TextQueries.bm25TopK(spark, dir).collect().toSeq
      val served = TextIndexLayout.query(spark, dir, "txt_idx_spec")
      assert(online.nonEmpty)
      assert(served.collect().toSeq == online)

      // the serve plan reads the bucketed postings...
      val p = served.queryExecution.executedPlan.toString
      assert(p.contains(s"${physOf("txt_idx_spec")}_postings"), p)
      // ...and tokenizes ONLY the query documents: exactly one scan of
      // the documents table (the online plan reads it for the corpus
      // grain as well), and none of the corpus-side index build stages
      // — no df/dl aggregation (the online plan's partial_sum over tf),
      // no posting cap re-evaluation (the md5-threshold constant).
      // AQE's toString appends an "== Initial Plan ==" twin; count
      // scans in the final section only.
      val pFinal = p.split("== Initial Plan ==").head
      assert("documents\\.parquet".r.findAllIn(pFinal).length == 1, pFinal)
      assert(!p.contains("1048576"), p)
      assert(!p.contains("partial_sum(tf"), p)
    } finally dropIndex("txt_idx_spec")
  }

  test("appendDelta encodes under the FROZEN build vocabulary") {
    // build sees only docs < 300; by delta time the corpus has "grown"
    // (the rest of the file) — and with it df/avgdl, so postings
    // re-derived from the live table would score on a different scale
    val predA = col("doc_id") < 300L
    TextIndexLayout.build(spark, dir, "txt_idx_delta", buckets = 4,
      where = predA)
    try {
      TextIndexLayout.appendDelta(spark, dir, "txt_idx_delta",
        col("doc_id") >= 300L, buckets = 4)

      // the persisted vocabulary is the BUILD-TIME one, not re-derived
      val docsA = TextQueries.bm25TermGrain(
        graft.util.Tables.load(spark, dir, "documents").filter(predA))
      val (vocabA, _) =
        TextQueries.bm25Vocab(docsA, TextQueries.bm25DocLens(docsA))
      val persisted = spark.table(s"${physOf("txt_idx_delta")}_vocab").collect().toSet
      assert(persisted == vocabA.collect().toSet)
      val fullGrain = TextQueries.bm25TermGrain(
        graft.util.Tables.load(spark, dir, "documents"))
      val (vocabFull, _) =
        TextQueries.bm25Vocab(fullGrain, TextQueries.bm25DocLens(fullGrain))
      assert(persisted != vocabFull.collect().toSet,
        "fixture too small to distinguish frozen from re-derived vocab")

      // postings == the whole corpus encoded under vocab(A), exactly
      // once per (term, doc) — delta encoding is per-document, so the
      // union must equal a one-shot encode under the frozen geometry
      val expected = TextQueries.bm25Postings(fullGrain,
        spark.table(s"${physOf("txt_idx_delta")}_vocab"),
        TextQueries.bm25DocLens(fullGrain)).collect().toSet
      val stored = spark.table(s"${physOf("txt_idx_delta")}_postings").collect().toSet
      assert(stored == expected)
      assert(spark.table(s"${physOf("txt_idx_delta")}_postings").count() == expected.size)
    } finally dropIndex("txt_idx_delta")
  }

  test("appendDelta is idempotent under retries") {
    val predA = col("doc_id") < 300L
    val predB = col("doc_id") >= 300L
    TextIndexLayout.build(spark, dir, "txt_idx_retry", buckets = 4,
      where = predA)
    try {
      TextIndexLayout.appendDelta(spark, dir, "txt_idx_retry", predB,
        buckets = 4)
      val afterFirst = spark.table(s"${physOf("txt_idx_retry")}_postings").count()
      // a blind re-run (same predicate, e.g. a retried job) appends
      // nothing: every delta doc is already filed
      TextIndexLayout.appendDelta(spark, dir, "txt_idx_retry", predB,
        buckets = 4)
      assert(spark.table(s"${physOf("txt_idx_retry")}_postings").count() == afterFirst)
      // and an overlapping wider predicate only files the truly new
      TextIndexLayout.appendDelta(spark, dir, "txt_idx_retry", lit(true),
        buckets = 4)
      assert(spark.table(s"${physOf("txt_idx_retry")}_postings").count() == afterFirst)
    } finally dropIndex("txt_idx_retry")
  }

  test("arbitrary serve answers ad-hoc queries from the index") {
    TextIndexLayout.build(spark, dir, "txt_idx_adhoc", buckets = 4)
    try {
      import spark.implicits._
      // an ad-hoc request whose id collides with a corpus doc is NOT
      // self-excluded (request ids live in their own space)
      val doc0text = graft.util.Tables.load(spark, dir, "documents")
        .filter(col("doc_id") === 0L).select(col("text"))
        .collect().head.getString(0)
      val served = TextIndexLayout.serve(spark, "txt_idx_adhoc",
        Seq((0L, doc0text)).toDF("q_id", "text")).collect()
      assert(served.nonEmpty)
      // querying with doc 0's own text must surface doc 0 among the
      // top hits, NOT self-excluded (request ids are their own space).
      // Not necessarily rank 1: BM25's length normalization can rank a
      // shorter doc carrying the same rare terms above the source doc.
      assert(served.take(3).exists(_.getAs[Long]("doc_id") == 0L),
        served.take(3).mkString(", "))
    } finally dropIndex("txt_idx_adhoc")
  }
}
