package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions.h60
import graft.queries.DedupQueries
import graft.util.Tables

/** Build-once persistence for the CURATED corpus — the artifact the
  * `pipeline_curate` composite exists to produce, paid for once
  * instead of per consumer (the measured 2.4×-of-suite build is the
  * most expensive query in the repo; a training run that re-curates
  * per epoch re-pays it every time).
  *
  * Tables under `prefix`:
  *  - `<prefix>_docs` (doc_id, source, h, n_tokens, text), bucketed +
  *    sorted by `doc_id` — the stage-7 survivors JOINED BACK to their
  *    text: the frame a tokenize/pack/training job actually reads.
  *    Written with the write-aside + checked-rename swap
  *    ([[BucketedTables.replaceBucketed]], the
  *    `EventsPipeline.compactHourlyMetrics` discipline), so a
  *    re-curation refresh is atomic to readers and crash-safe.
  *  - `<prefix>_manifest` — the attrition table (stage, n_in,
  *    n_dropped, n_out, tokens_out) of the SAME chain invocation that
  *    produced the docs, so the written corpus can never drift from
  *    the manifest describing it (CuratedCorpusSpec reconciles it
  *    against the live registered query).
  *  - `<prefix>_checksums` — the `util_table_checksums` handoff gate
  *    applied to the artifact: row count + order-free XOR h60 fold
  *    over the canonical (doc_id, h, source, n_tokens) string,
  *    published by the producer at build time; [[verifyHandoff]]
  *    re-derives it from the stored rows so a consumer proves the
  *    handoff lossless before training on it.
  *
  * Reference point: the reference publishes derived tables for
  * consumers to read (database/schema.sql:30-59) rather than having
  * each dashboard recompute the pipeline; this is that discipline
  * applied to the curation composite.
  */
object CuratedCorpusLayout {

  /** Canonical per-row checksum string — doc_id (the unique key, so
    * identical texts cannot XOR-cancel), content hash, and the two
    * contract columns a consumer depends on. */
  private def canon: org.apache.spark.sql.Column =
    concat_ws("|", col("doc_id"), col("h"), col("source"), col("n_tokens"))

  private def checksumOf(df: DataFrame): DataFrame =
    df.select(h60(canon).as("chk"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(chk)").cast(LongType).as("checksum"))
      .select(lit("curated_docs").as("tbl"), col("n_rows"), col("checksum"))

  /** Run the curation chain ONCE and persist survivors + manifest +
    * checksum. Idempotent: a re-build swaps fresh tables in atomically
    * (readers see the old artifact until the rename lands). */
  def build(spark: SparkSession, dir: String, prefix: String,
      buckets: Int = 8): Unit = {
    val (survivors, attrition) = DedupQueries.curateChain(spark, dir)
    val text = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val art = survivors
      .select(col("doc_id"), col("source"), col("h"), col("n_tokens"))
      .join(text, "doc_id")
    BucketedTables.replaceBucketed(spark, s"${prefix}_docs", "doc_id",
      buckets, art)
    // manifest + checksum derive from what was JUST written (not the
    // pre-swap plan): the gate fingerprints the artifact on disk
    attrition.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_manifest")
    checksumOf(spark.table(s"${prefix}_docs"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_checksums")
    Seq("docs", "manifest", "checksums")
      .foreach(t => spark.catalog.refreshTable(s"${prefix}_$t"))
  }

  /** The curated corpus, served from disk — NO re-curation: the plan
    * reads `<prefix>_docs` and nothing else (CuratedCorpusSpec pins
    * the absence of every chain stage). */
  def serve(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_docs")

  /** The attrition manifest of the build that produced [[serve]]'s
    * rows. */
  def manifest(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_manifest")

  /** Consumer-side handoff gate: re-derive the checksum from the
    * stored rows and compare to the producer's published one. Returns
    * (tbl, n_rows, checksum, n_rows_stored, checksum_stored, ok) —
    * one row; `ok = false` means the artifact was tampered with or
    * truncated after publication and must not be trained on. */
  def verifyHandoff(spark: SparkSession, prefix: String): DataFrame =
    checksumOf(serve(spark, prefix))
      .join(spark.table(s"${prefix}_checksums")
        .select(col("tbl"), col("n_rows").as("n_rows_stored"),
          col("checksum").as("checksum_stored")), "tbl")
      .withColumn("ok",
        col("n_rows") === col("n_rows_stored") &&
          col("checksum") === col("checksum_stored"))
}
