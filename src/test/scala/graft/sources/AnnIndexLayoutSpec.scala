package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.queries.SimilarityQueries

/** Build-once / query-many contract of the persisted IVF-PQ index:
  * serving from the bucketed index tables must return the EXACT
  * `ann_ivfpq_topk` rows (build and serve share the online query's
  * encode/probe code paths, so any drift is a real bug), the serve
  * plan must read the index instead of re-encoding the corpus, and
  * deltas must stay pinned to the BUILD-TIME geometry — persisted in
  * `<prefix>_coarse` / `<prefix>_pqcb` — no matter how the live
  * embeddings table has grown since. */
class AnnIndexLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dropIndex(prefix: String): Unit = dropPrefix(prefix)

  /** The live generation's physical table — the spec-side reach into
    * the backing tables the pointer view resolves. */
  private def physT(prefix: String, t: String) =
    spark.table(s"${AnnIndexLayout.livePrefix(spark, prefix)}_$t")

  test("serving from the persisted index equals the online ivfpq query") {
    AnnIndexLayout.build(spark, dir, "ann_idx_spec", buckets = 4)
    try {
      val online = SimilarityQueries.ivfpqTopK(spark, dir).collect().toSeq
      val served = AnnIndexLayout.query(spark, dir, "ann_idx_spec")
      assert(online.nonEmpty)
      assert(served.collect().toSeq == online)

      // the serve plan scans the two index tables...
      val p = served.queryExecution.executedPlan.toString
      val phys = AnnIndexLayout.livePrefix(spark, "ann_idx_spec")
      assert(p.contains(s"${phys}_cells"), p)
      assert(p.contains(s"${phys}_codes"), p)
      // ...and never re-runs the corpus encode: the PQ kernel must
      // survive only in the query-side LUT (queries x codebook), so
      // the corpus (n_id, s) code argmin — which prints as
      // "partial_min(struct(d2q" in the ONLINE plan (checked: present
      // there) — must be gone from the served plan
      assert("graft_pq_d2s".r.findAllIn(p).nonEmpty, p)
      assert(!p.contains("partial_min(struct(d2q"), p)
    } finally dropIndex("ann_idx_spec")
  }

  test("appendDelta encodes against the FROZEN build geometry") {
    // build sees only vectors < 300; by delta time the table has
    // "grown" (the rest of the file) — and with it the %40/%16 seed
    // pools, so a geometry re-derived from the live table would differ
    val predA = col("vec_id") < 300L
    AnnIndexLayout.build(spark, dir, "ann_idx_delta", buckets = 4,
      where = predA)
    try {
      AnnIndexLayout.appendDelta(spark, dir, "ann_idx_delta",
        col("vec_id") >= 300L, buckets = 4)

      // geometry tables hold the BUILD-TIME sets, not the grown ones
      val centsA = SimilarityQueries.coarseCentsOf(spark, dir, predA)
        .collect().toSet
      val centsFull = SimilarityQueries.coarseCentsOf(spark, dir, lit(true))
        .collect().toSet
      val persisted = physT("ann_idx_delta", "coarse").collect().toSet
      assert(persisted == centsA)
      assert(centsA != centsFull,
        "fixture too small to distinguish frozen from re-derived geometry")

      // cells == every corpus vector assigned under geometry(A),
      // each exactly once
      val expectedCells = SimilarityQueries
        .ivfAssignUsing(spark, dir, physT("ann_idx_delta", "coarse"),
          lit(true)).collect().toSet
      val cells = physT("ann_idx_delta", "cells").collect().toSet
      assert(cells == expectedCells)
      assert(physT("ann_idx_delta", "cells").count() ==
        spark.read.parquet(s"$dir/embeddings.parquet").count())

      // serving from the delta'd index == serving computed from
      // in-memory frames under the same frozen geometry
      val expected = SimilarityQueries.ivfpqServeQueriesWith(spark, dir,
        SimilarityQueries.registeredQueryFrame(spark, dir),
        physT("ann_idx_delta", "coarse"),
        physT("ann_idx_delta", "pqcb"),
        physT("ann_idx_delta", "cells"),
        physT("ann_idx_delta", "codes"),
        excludeSelf = true).collect().toSeq
      val served = AnnIndexLayout.query(spark, dir, "ann_idx_delta")
        .collect().toSeq
      assert(served.nonEmpty)
      assert(served == expected)
    } finally dropIndex("ann_idx_delta")
  }

  test("appendDelta is idempotent under retries, including partial failures") {
    val predA = col("vec_id") < 300L
    val predB = col("vec_id") >= 300L
    AnnIndexLayout.build(spark, dir, "ann_idx_retry", buckets = 4,
      where = predA)
    try {
      // simulate "cells append succeeded, codes append died" AS THE
      // PROTOCOL CAN ACTUALLY REACH IT: the IngestLedger intent record
      // lands before any data append, so the crash state is
      // intent + cells present, codes missing. (Data rows without an
      // intent record are unreachable through the layout API — that
      // ordering is the protocol's correctness invariant.)
      val retryPhys = AnnIndexLayout.livePrefix(spark, "ann_idx_retry")
      BucketedTables.appendBucketed(
        spark.read.parquet(s"$dir/embeddings.parquet").filter(predB)
          .select(col("vec_id").as("id")),
        s"${retryPhys}_ids", "id", 4)
      BucketedTables.appendBucketed(
        SimilarityQueries.ivfAssignUsing(spark, dir,
          spark.table(s"${retryPhys}_coarse"), predB),
        s"${retryPhys}_cells", "cell", 4)
      val cellsAfterPartial = spark.table(s"${retryPhys}_cells").count()

      // the retry must fill ONLY the missing codes
      AnnIndexLayout.appendDelta(spark, dir, "ann_idx_retry", predB,
        buckets = 4)
      val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
      assert(spark.table(s"${retryPhys}_cells").count() == cellsAfterPartial)
      assert(spark.table(s"${retryPhys}_cells").count() == nVecs)
      assert(spark.table(s"${retryPhys}_codes").count() == nVecs * 16)

      // and a full re-run appends nothing at all
      AnnIndexLayout.appendDelta(spark, dir, "ann_idx_retry", predB,
        buckets = 4)
      assert(spark.table(s"${retryPhys}_cells").count() == nVecs)
      assert(spark.table(s"${retryPhys}_codes").count() == nVecs * 16)
    } finally dropIndex("ann_idx_retry")
  }

  test("arbitrary-id serving keeps a corpus vector sharing the request id") {
    AnnIndexLayout.build(spark, dir, "ann_idx_serve", buckets = 4)
    try {
      // corpus vectors replayed as EXTERNAL requests (ids collide with
      // corpus ids by construction): with the default excludeSelf =
      // false each request's nearest neighbor is the coinciding corpus
      // vector itself at d2 = 0 — the row the old unconditional
      // self-exclusion silently dropped
      val requests = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(SimilarityQueries.isQuery)
        .select(col("vec_id"), col("embedding"))
      val top1 = AnnIndexLayout.serve(spark, dir, "ann_idx_serve", requests)
        .filter(col("rank") === 1L).collect()
      assert(top1.nonEmpty)
      assert(top1.forall(r => r.getAs[Long]("q_id") == r.getAs[Long]("n_id")),
        top1.take(5).mkString(","))

      // excludeSelf = true reproduces the online corpus-member result
      val online = SimilarityQueries.ivfpqTopK(spark, dir).collect().toSeq
      val withNrm = requests.selectExpr("vec_id", "embedding")
      val servedExcl = AnnIndexLayout.serve(spark, dir, "ann_idx_serve",
        withNrm, excludeSelf = true).collect().toSeq
      assert(servedExcl == online)
    } finally dropIndex("ann_idx_serve")
  }

  test("a query stream served from the index reproduces the online rows") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    AnnIndexLayout.build(spark, dir, "ann_idx_stream", buckets = 4)
    try {
      // the registered query subset, split across two micro-batches
      val qs = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(SimilarityQueries.isQuery)
        .select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect().toSeq
      assert(qs.size >= 4)
      val (b1, b2) = qs.splitAt(qs.size / 2)

      val collected = scala.collection.mutable.ArrayBuffer.empty[Seq[Row]]
      val mem = MemoryStream[(Long, Array[Float])]
      val stream = mem.toDF().toDF("vec_id", "embedding")
      val q = AnnIndexLayout.serveStream(spark, dir, "ann_idx_stream",
        stream, excludeSelf = true) { (res: DataFrame, _: Long) =>
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
    } finally dropIndex("ann_idx_stream")
  }
}
