package graft.sources

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.queries.SimilarityQueries

/** Build-once / query-many contract of the persisted IVF-PQ index:
  * serving from the bucketed index tables must return the EXACT
  * `ann_ivfpq_topk` rows (build and serve share the online query's
  * encode/probe code paths, so any drift is a real bug), and the serve
  * plan must read the index instead of re-encoding the corpus. */
class AnnIndexLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("serving from the persisted index equals the online ivfpq query") {
    AnnIndexLayout.build(spark, dir, "ann_idx_spec", buckets = 4)
    try {
      val online = SimilarityQueries.ivfpqTopK(spark, dir).collect().toSeq
      val served = AnnIndexLayout.query(spark, dir, "ann_idx_spec")
      assert(online.nonEmpty)
      assert(served.collect().toSeq == online)

      // the serve plan scans the two index tables...
      val p = served.queryExecution.executedPlan.toString
      assert(p.contains("ann_idx_spec_cells"), p)
      assert(p.contains("ann_idx_spec_codes"), p)
      // ...and never re-runs the corpus encode: the PQ kernel must
      // survive only in the query-side LUT (queries x codebook), so
      // the corpus (n_id, s) code argmin — which prints as
      // "partial_min(struct(d2q" in the ONLINE plan (checked: present
      // there) — must be gone from the served plan
      assert("graft_pq_d2s".r.findAllIn(p).nonEmpty, p)
      assert(!p.contains("partial_min(struct(d2q"), p)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_idx_spec_cells")
      spark.sql("DROP TABLE IF EXISTS ann_idx_spec_codes")
    }
  }

  test("build + appendDelta equals a full build (incremental maintenance)") {
    import org.apache.spark.sql.functions.col
    // a realistic delta: everything at or past the ingest watermark —
    // a range predicate, so the delta encode prunes at the parquet scan
    AnnIndexLayout.build(spark, dir, "ann_idx_delta", buckets = 4,
      where = col("vec_id") < 300L)
    try {
      AnnIndexLayout.appendDelta(spark, dir, "ann_idx_delta",
        col("vec_id") >= 300L, buckets = 4)
      val online = SimilarityQueries.ivfpqTopK(spark, dir).collect().toSeq
      val served = AnnIndexLayout.query(spark, dir, "ann_idx_delta")
        .collect().toSeq
      assert(online.nonEmpty)
      assert(served == online)
      // the index really is the union, each vector exactly once
      val n = spark.table("ann_idx_delta_cells").count()
      assert(n == spark.read.parquet(s"$dir/embeddings.parquet").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_idx_delta_cells")
      spark.sql("DROP TABLE IF EXISTS ann_idx_delta_codes")
    }
  }

  test("a query stream served from the index reproduces the online rows") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    AnnIndexLayout.build(spark, dir, "ann_idx_stream", buckets = 4)
    try {
      // the registered query subset, split across two micro-batches
      val qs = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 50 === 0)
        .select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect().toSeq
      assert(qs.size >= 4)
      val (b1, b2) = qs.splitAt(qs.size / 2)

      val collected = scala.collection.mutable.ArrayBuffer.empty[Seq[Row]]
      val mem = MemoryStream[(Long, Array[Float])]
      val stream = mem.toDF().toDF("vec_id", "embedding")
      val q = AnnIndexLayout.serveStream(spark, dir, "ann_idx_stream",
        stream) { (res: DataFrame, _: Long) =>
        val rows = res.collect().toSeq
        collected.synchronized { collected += rows }
      }
      try {
        mem.addData(b1: _*)
        q.processAllAvailable()
        mem.addData(b2: _*)
        q.processAllAvailable()
      } finally q.stop()

      val online = SimilarityQueries.ivfpqTopK(spark, dir).collect().toSeq
      val served = collected.flatten
        .sortBy(r => (r.getLong(0), r.getLong(3)))
      assert(served.nonEmpty)
      assert(served == online.sortBy(r => (r.getLong(0), r.getLong(3))))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_idx_stream_cells")
      spark.sql("DROP TABLE IF EXISTS ann_idx_stream_codes")
    }
  }
}
