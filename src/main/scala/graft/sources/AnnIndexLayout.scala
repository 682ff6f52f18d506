package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, sqrt}

import graft.queries.SimilarityQueries

/** Build-once / query-many persistence for the IVF-PQ ANN index — the
  * missing half of `ann_ivfpq_topk`'s "the layout a 100 TB deployment
  * persists" story.
  *
  * The online query (`ann_ivfpq_topk`) re-derives the coarse cell
  * assignment and the PQ codes from raw embeddings on every run; both
  * are pure functions of the corpus, and at scale they are the two
  * expensive linear scans. This layout writes them ONCE as bucketed
  * managed tables:
  *
  *  - `<prefix>_cells` (n_id, cell), bucketed + sorted by `cell` —
  *    the probe equi-join key, so "members of the probed cells" reads
  *    only the matching buckets with no shuffle of the index side;
  *  - `<prefix>_codes` (n_id, s, code), bucketed + sorted by `n_id` —
  *    the ADC join key, so the (small, query-driven) candidate list
  *    shuffles while the corpus-sized code table never does. At rest
  *    this is 16 subspace codes per vector — the 16-byte-per-vector
  *    PQ representation, vs 256 bytes of raw floats.
  *
  * Serving reuses the SAME query-side plan as `ann_ivfpq_topk`
  * ([[SimilarityQueries.ivfpqServeFrom]]): probe window over queries x
  * cells, cell-member ADC join against the persisted codes, exact
  * re-rank via point lookups into raw embeddings. Results are
  * byte-identical to the online query (AnnIndexLayoutSpec asserts it)
  * because build and serve share the exact encode/probe code paths.
  *
  * Reference point: the reference keeps its derived state hot the same
  * way — precomputed tables maintained ahead of queries
  * (consumer/consumer.py:240-293, database/schema.sql:30-59) — rather
  * than recomputing rollups per dashboard refresh.
  */
object AnnIndexLayout {

  /** Build the index: one corpus scan for the coarse assignment, one
    * for the PQ encode — each the partial-aggregable shape from the
    * online query — persisted as bucketed tables under `prefix`. */
  def build(spark: SparkSession, dir: String, prefix: String,
      buckets: Int = 8, where: Column = lit(true)): Unit = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    BucketedTables.writeBucketed(
      SimilarityQueries.ivfAssignOf(spark, dir, where), s"${prefix}_cells",
      "cell", buckets)
    BucketedTables.writeBucketed(
      SimilarityQueries.pqCorpusCodesOf(spark, dir, where), s"${prefix}_codes",
      "n_id", buckets)
  }

  /** Incremental maintenance — the operation a 100 TB deployment runs
    * DAILY while full rebuilds stay rare: encode ONLY the vectors
    * matching `where` (e.g. `vec_id >= ingestWatermark`, which prunes
    * at the parquet scan) against the index's FROZEN geometry — the
    * coarse centroids and PQ codebook of the original build — and
    * append them into the bucketed tables. Because per-vector
    * assignment and encoding are independent of every other vector,
    * build(A) + appendDelta(B) is bit-identical to build(A ∪ B)
    * (AnnIndexLayoutSpec asserts it against the online query).
    * Retraining the geometry is a rebuild, never an append. */
  def appendDelta(spark: SparkSession, dir: String, prefix: String,
      where: Column, buckets: Int = 8): Unit = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    BucketedTables.appendBucketed(
      SimilarityQueries.ivfAssignOf(spark, dir, where), s"${prefix}_cells",
      "cell", buckets)
    BucketedTables.appendBucketed(
      SimilarityQueries.pqCorpusCodesOf(spark, dir, where), s"${prefix}_codes",
      "n_id", buckets)
  }

  /** Serve the registered query set from the persisted index: must
    * equal `ann_ivfpq_topk` row-for-row without re-encoding the
    * corpus. */
  def query(spark: SparkSession, dir: String, prefix: String): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    SimilarityQueries.ivfpqServeFrom(spark, dir,
      BucketedTables.read(spark, s"${prefix}_cells"),
      BucketedTables.read(spark, s"${prefix}_codes"))
  }

  /** Serve an ARBITRARY query set — (vec_id BIGINT, embedding
    * ARRAY<FLOAT>) — from the persisted index: probe window over the
    * given queries, cell-member ADC join, exact re-rank. The request
    * side is request-sized end to end; the corpus appears only through
    * the two index tables and point lookups into raw embeddings. */
  def serve(spark: SparkSession, dir: String, prefix: String,
      queries: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val q = queries.select(col("vec_id"), col("embedding"),
      sqrt(expr("graft_norm2(embedding)")).as("nrm"))
    SimilarityQueries.ivfpqServeQueriesFrom(spark, dir, q,
      BucketedTables.read(spark, s"${prefix}_cells"),
      BucketedTables.read(spark, s"${prefix}_codes"))
  }

  /** ONLINE serving: a stream of query vectors answered from the
    * persisted index, micro-batch at a time. The ADC scan + re-rank
    * are batch plans (they need windows and multi-joins Structured
    * Streaming forbids on unbounded input), so each micro-batch runs
    * through [[serve]] inside `foreachBatch` — the standard
    * stream-to-batch bridge for serving — and the caller's `sink`
    * decides where results land. Exactly-once is the sink's usual
    * foreachBatch contract (idempotent write keyed on batchId). */
  def serveStream(spark: SparkSession, dir: String, prefix: String,
      queryStream: DataFrame)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(serve(spark, dir, prefix, batch), batchId)
      }
      .start()
}
