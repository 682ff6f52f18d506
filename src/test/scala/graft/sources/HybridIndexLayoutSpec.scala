package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.queries.{SimilarityQueries, TextQueries}

/** Build-once / query-many contract of the FUSED hybrid serving path:
  * RRF from the two persisted indexes must return the EXACT
  * `txt_hybrid_rrf` rows for corpus queries (every stage is the online
  * query's own code against equal-by-construction index rows), the
  * serve plan must read the indexes instead of rebuilding either leg,
  * and a request missing one modality (all-OOV text, null embedding)
  * must degrade to the surviving leg rather than vanish. */
class HybridIndexLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dropIndexes(textPrefix: String, densePrefix: String): Unit = {
    dropPrefix(textPrefix)
    dropPrefix(densePrefix)
  }

  test("dense serve from persisted signatures equals online multi-probe lsh") {
    HybridIndexLayout.buildDense(spark, dir, "hyb_dense_eq", buckets = 4)
    try {
      val online = SimilarityQueries.lshMultiProbe(spark, dir).collect().toSeq
      val served = HybridIndexLayout.serveDense(spark, dir, "hyb_dense_eq",
        graft.util.Tables.load(spark, dir, "embeddings")
          .filter(col("vec_id") % 50 === 0)
          .select(col("vec_id"), col("embedding")),
        excludeSelf = true)
      assert(online.nonEmpty)
      assert(served.collect().toSeq == online)
      // the serve plan reads the persisted signatures — none of the
      // corpus-side signature build (8 plane projections over every
      // embedding row) reruns: the embeddings table appears only for
      // the request rows and the exact-dot point lookups
      val p = served.queryExecution.executedPlan.toString
      assert(p.contains(
        s"${HybridIndexLayout.livePrefixDense(spark, "hyb_dense_eq")}_sigs"), p)
    } finally dropPrefix("hyb_dense_eq")
  }

  test("hybrid serve from the two persisted indexes equals txt_hybrid_rrf") {
    TextIndexLayout.build(spark, dir, "hyb_txt_eq", buckets = 4)
    HybridIndexLayout.buildDense(spark, dir, "hyb_ann_eq", buckets = 4)
    try {
      val online = TextQueries.hybridRrf(spark, dir).collect().toSeq
      val served = HybridIndexLayout.queryHybrid(spark, dir,
        "hyb_txt_eq", "hyb_ann_eq")
      assert(online.nonEmpty)
      assert(served.collect().toSeq == online)
      // build-once means SERVE pays neither leg build: no posting-cap
      // constant (sparse index build), no df/dl partial_sum
      val p = served.queryExecution.executedPlan.toString
      assert(p.contains(
        s"${TextIndexLayout.livePrefix(spark, "hyb_txt_eq")}_postings"), p)
      assert(p.contains(
        s"${HybridIndexLayout.livePrefixDense(spark, "hyb_ann_eq")}_sigs"), p)
      assert(!p.contains("1048576"), p)
      assert(!p.contains("partial_sum(tf"), p)
    } finally dropIndexes("hyb_txt_eq", "hyb_ann_eq")
  }

  test("a request missing one modality degrades to the surviving leg") {
    TextIndexLayout.build(spark, dir, "hyb_txt_oov", buckets = 4)
    HybridIndexLayout.buildDense(spark, dir, "hyb_ann_oov", buckets = 4)
    try {
      import spark.implicits._
      val emb0 = graft.util.Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .collect().head.getSeq[Float](0).toArray
      val text0 = graft.util.Tables.load(spark, dir, "documents")
        .filter(col("doc_id") === 0L).select(col("text"))
        .collect().head.getString(0)
      // q 1: all-OOV text + real embedding -> dense-only fusion
      // q 2: real text + null embedding    -> sparse-only fusion
      val requests = Seq(
        (1L, "zzqx9 qqzv7 vvxq1", Some(emb0)),
        (2L, text0, Option.empty[Array[Float]]))
        .toDF("q_id", "text", "embedding")
      val out = HybridIndexLayout.serveHybrid(spark, dir,
        "hyb_txt_oov", "hyb_ann_oov", requests).collect()
      val q1 = out.filter(_.getAs[Long]("q_id") == 1L)
      val q2 = out.filter(_.getAs[Long]("q_id") == 2L)
      assert(q1.nonEmpty && q1.forall(r => r.isNullAt(r.fieldIndex("r_sparse"))
        && !r.isNullAt(r.fieldIndex("r_dense"))), q1.mkString(", "))
      assert(q2.nonEmpty && q2.forall(r => r.isNullAt(r.fieldIndex("r_dense"))
        && !r.isNullAt(r.fieldIndex("r_sparse"))), q2.mkString(", "))
    } finally dropIndexes("hyb_txt_oov", "hyb_ann_oov")
  }

  test("dense delta append is idempotent and converges to the full build") {
    val predA = col("vec_id") < 300L
    HybridIndexLayout.buildDense(spark, dir, "hyb_dense_delta", buckets = 4,
      where = predA)
    try {
      HybridIndexLayout.appendDeltaDense(spark, dir, "hyb_dense_delta",
        col("vec_id") >= 300L, buckets = 4)
      val afterFirst = spark.table(s"${HybridIndexLayout.livePrefixDense(spark, "hyb_dense_delta")}_sigs").count()
      // replayed delta: nothing new to file
      HybridIndexLayout.appendDeltaDense(spark, dir, "hyb_dense_delta",
        col("vec_id") >= 300L, buckets = 4)
      assert(spark.table(s"${HybridIndexLayout.livePrefixDense(spark, "hyb_dense_delta")}_sigs").count() == afterFirst)
      // signatures are a pure per-vector function of the FIXED plane
      // geometry, so build(A) + delta(B) == one-shot build signatures
      val oneShot = SimilarityQueries.lshSignatures(spark, dir)
        .collect().toSet
      assert(spark.table(s"${HybridIndexLayout.livePrefixDense(spark, "hyb_dense_delta")}_sigs").collect().toSet == oneShot)
      // and serving equals the online query after the deltas
      val online = SimilarityQueries.lshMultiProbe(spark, dir).collect().toSeq
      val served = HybridIndexLayout.serveDense(spark, dir,
        "hyb_dense_delta",
        graft.util.Tables.load(spark, dir, "embeddings")
          .filter(col("vec_id") % 50 === 0)
          .select(col("vec_id"), col("embedding")),
        excludeSelf = true).collect().toSeq
      assert(served == online)
    } finally dropPrefix("hyb_dense_delta")
  }

  test("streamed hybrid serving answers micro-batches from the indexes") {
    TextIndexLayout.build(spark, dir, "hyb_txt_str", buckets = 4)
    HybridIndexLayout.buildDense(spark, dir, "hyb_ann_str", buckets = 4)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Array[Float])]
      val results = scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.Row]()
      val q = HybridIndexLayout.serveHybridStream(spark, dir,
        "hyb_txt_str", "hyb_ann_str",
        mem.toDF().toDF("q_id", "text", "embedding"),
        excludeSelf = true) { (batch, _) =>
        results ++= batch.collect()
      }
      try {
        val reqs = graft.util.Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("q_id"), col("text"))
          .join(graft.util.Tables.load(spark, dir, "embeddings")
            .select(col("vec_id").as("q_id"), col("embedding")), Seq("q_id"))
          .as[(Long, String, Array[Float])].collect().toSeq
        val (b1, b2) = reqs.splitAt(reqs.size / 2)
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      // two micro-batches together cover the registered set: equal to
      // the online query as a SET (batch boundaries reorder rows)
      val online = TextQueries.hybridRrf(spark, dir).collect().toSet
      assert(results.toSet == online)
    } finally dropIndexes("hyb_txt_str", "hyb_ann_str")
  }
}
