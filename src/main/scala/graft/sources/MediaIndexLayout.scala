package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.queries.MultimodalQueries
import graft.util.Tables

/** Build-once / check-many persistence for PERCEPTUAL media dedup —
  * [[DedupIndexLayout]]'s discipline applied to the multimodal tier:
  * instead of re-signing the whole asset store per snapshot
  * (`mm_near_dup_pairs` recomputes every tile signature per run), the
  * corpus's tile rows are persisted once and each delta of NEW media
  * is checked delta × (corpus ∪ delta) on the tile cell.
  *
  * One table under `prefix`: `<prefix>_tiles` (doc_id, media_format,
  * digest, psig, tile_id, tile), bucketed + sorted by `tile` — the
  * candidate equi-join key (tile ⊂ the (format, tile_id, tile) join
  * key set, so the bucketed distribution co-locates the join with no
  * corpus-side shuffle). The full signature and digest ride on every
  * row, so verification (Hamming + same-bytes flag) needs no second
  * corpus lookup — the 8-byte psig is the whole "vector".
  *
  * No geometry to freeze: tile count, window width/stride, and hash
  * constants are fixed code ([[MultimodalQueries]]), the structural
  * freeze again. Check/append share the online query's code paths, so
  * [[dedupDelta]] is byte-equal to `mm_near_dup_pairs` restricted to
  * pairs touching the delta (MediaIndexLayoutSpec, both directions).
  */
object MediaIndexLayout {

  def build(spark: SparkSession, dir: String, prefix: String,
      buckets: Int = 8, where: Column = lit(true)): Unit =
    buildDocs(spark, prefix,
      Tables.load(spark, dir, "documents").filter(where)
        .select(col("doc_id"), col("text")), buckets)

  /** [[build]] for an ARBITRARY (doc_id, text·payload) frame. */
  def buildDocs(spark: SparkSession, prefix: String, docs: DataFrame,
      buckets: Int = 8): Unit = {
    val d = docs.dropDuplicates("doc_id")
    BucketedTables.writeBucketed(
      MultimodalQueries.tileRowsOf(d),
      s"${prefix}_tiles", "tile", buckets)
    // the ingest ledger covers every INPUT doc (a tile-less asset is
    // fully filed by filing nothing), so re-sends skip it either way
    BucketedTables.writeBucketed(d.select(col("doc_id").as("id")),
      IngestLedger.table(prefix), "id", buckets)
  }

  /** Sign + tile ONLY the given media and append. Idempotent under
    * retries and replays via the [[IngestLedger]] intent-first
    * protocol: new docs append with no scan of the tile table; only a
    * replayed/retried (dirty) subset pays the exact per-table doc_id
    * anti-join. Within-batch duplicates collapse first. */
  def appendDeltaDocs(spark: SparkSession, prefix: String,
      docs: DataFrame, buckets: Int = 8): Unit = {
    val d = docs.dropDuplicates("doc_id")
    appendDeltaDocsFrom(spark, prefix, d.select(col("doc_id")),
      MultimodalQueries.tileRowsOf(d), buckets)
  }

  /** [[appendDeltaDocs]] with the delta's signature/tile pass
    * PRECOMPUTED — the composed snapshot path files the same
    * materialized tile rows the gate check consumed, so a snapshot
    * pays the `graft_psig` kernel exactly once. Same ledger discipline
    * as the public entry. */
  private[sources] def appendDeltaDocsFrom(spark: SparkSession,
      prefix: String, ids: DataFrame, tD: DataFrame, buckets: Int): Unit = {
    val split = IngestLedger.begin(spark, prefix, ids, buckets,
      BucketedTables.read(spark, s"${prefix}_tiles").select(col("doc_id")))
    BucketedTables.appendBucketed(
      IngestLedger.filed(tD, "doc_id", split,
        BucketedTables.read(spark, s"${prefix}_tiles")
          .select(col("doc_id")).distinct()),
      s"${prefix}_tiles", "tile", buckets)
    spark.catalog.refreshTable(s"${prefix}_tiles")
  }

  /** Check a delta of NEW media against corpus + delta: verified
    * (media_format, doc_a, doc_b, hamming, same_bytes) near-dup pairs
    * with ≥1 delta member. Does NOT append; safe to re-run after the
    * append (delta-id anti-join hides the filed copies). Tombstoned
    * docs stop matching immediately. */
  def dedupDelta(spark: SparkSession, prefix: String,
      newDocs: DataFrame): DataFrame = {
    val d = newDocs.dropDuplicates("doc_id").localCheckpoint(true)
    dedupDeltaFrom(spark, prefix,
      d.select(col("doc_id")).localCheckpoint(true),
      MultimodalQueries.tileRowsOf(d).localCheckpoint(true))
  }

  /** [[dedupDelta]] with the delta's signature/tile pass PRECOMPUTED
    * ([[MultimodalQueries.mediaDeltaPairsCoreFrom]]) — the composed
    * snapshot path's media leg.
    *
    * Bounded deltas (≤ [[ScanPrune.maxDeltaDocs]]) PRUNE the corpus
    * tile scan to the delta's own tile values before the candidate
    * join — exact by join algebra (the join requires tile equality,
    * so a corpus row with a non-delta tile cannot match), and
    * bucket-file + parquet-page prunable because `tile` is the
    * table's bucket/sort key ([[ScanPrune]]; PrunedVerifySpec pins
    * pruned == full). The tile join IS the verification here (the
    * full psig rides every row), so one pruned scan covers the whole
    * check. */
  private[sources] def dedupDeltaFrom(spark: SparkSession, prefix: String,
      ids: DataFrame, tD: DataFrame): DataFrame = {
    val tiles = Tombstones.filter(spark, prefix,
      BucketedTables.read(spark, s"${prefix}_tiles"), "doc_id")
    val maxDocs = ScanPrune.maxDeltaDocs(spark)
    val tilesIn =
      if (maxDocs > 0L && ids.count() <= maxDocs) {
        val tvals = tD.select(col("tile")).distinct()
          .collect().map(_.getLong(0)).toSeq
        ScanPrune.ensureInPushdown(spark, tvals.length)
        ScanPrune.inSet(tiles, "tile", tvals)
      } else tiles
    MultimodalQueries.mediaDeltaPairsCoreFrom(tilesIn, ids, tD)
  }

  /** CONTINUOUS media ingest: check-then-append per micro-batch —
    * at-least-once pair emission over an exactly-once index, the
    * [[DedupIndexLayout.ingestStream]] contract verbatim. */
  def ingestStream(spark: SparkSession, prefix: String,
      docStream: DataFrame, buckets: Int = 8,
      checkpoint: Option[String] = None)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docStream.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one materialized graft_psig signature/tile pass serves the
        // check AND the filing — previously each leg re-signed the batch
        val d = batch.dropDuplicates("doc_id").localCheckpoint(true)
        val ids = d.select(col("doc_id")).localCheckpoint(true)
        val tD = MultimodalQueries.tileRowsOf(d).localCheckpoint(true)
        sink(dedupDeltaFrom(spark, prefix, ids, tD), batchId)
        appendDeltaDocsFrom(spark, prefix, ids, tD, buckets)
      }
      .start()
  }

  /** Right-to-be-forgotten: tombstone the ids (immediate exclusion
    * from checks), physical erasure at the next [[compact]]. */
  def purgeDocs(spark: SparkSession, prefix: String,
      docIds: DataFrame): Unit =
    Tombstones.purge(spark, prefix, docIds)

  /** Coverage gauge — the [[DedupIndexLayout.stalenessMetrics]]
    * contract for the tile index: live assets vs perceptually-indexed
    * assets (tombstones excluded), coverage ppm, tombstone backlog. */
  def stalenessMetrics(spark: SparkSession, dir: String,
      prefix: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val live = Tables.load(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs_live"))
    val indexed = Tombstones.filter(spark, prefix,
        BucketedTables.read(spark, s"${prefix}_tiles")
          .select(col("doc_id")).distinct(), "doc_id")
      .agg(count(lit(1)).as("n_docs_indexed"))
    val tomb = Tombstones.ids(spark, prefix)
      .agg(count(lit(1)).as("n_tombstoned"))
    live.crossJoin(broadcast(indexed)).crossJoin(broadcast(tomb))
      .select(col("n_docs_live"), col("n_docs_indexed"),
        round(col("n_docs_indexed").cast("double") /
          col("n_docs_live").cast("double") * 1e6)
          .cast(LongType).as("coverage_ppm"),
        col("n_tombstoned"))
  }

  def compact(spark: SparkSession, prefix: String, buckets: Int = 8): Unit = {
    BucketedTables.compact(spark, s"${prefix}_tiles", "tile", buckets,
      df => Tombstones.filter(spark, prefix, df, "doc_id"))
    IngestLedger.compact(spark, prefix, buckets)
    Tombstones.clear(spark, prefix)
  }
}
