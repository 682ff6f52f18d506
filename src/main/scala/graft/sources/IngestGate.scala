package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The UNIFIED snapshot ingest gate — one micro-batch driven through
  * all three persisted duplicate checks, emitting ONE keep/drop row
  * per new asset:
  *  - text: banded MinHash over [[DedupIndexLayout]] (`<prefix>_dd`),
  *  - media: perceptual tiles over [[MediaIndexLayout]]
  *    (`<prefix>_mm`),
  *  - semantic: corpus-frozen IVF-PQ at the SemDeDup cosine floor over
  *    [[AnnIndexLayout]] (`<prefix>_ann`).
  * The text⊗media crossmodal verdict (`mm_crossmodal_pairs`' grammar:
  * both / text_only / media_only / none) rides each row next to the
  * semantic flag; `keep` means duplicate in NO modality.
  *
  * Oracle twin: `mm_ingest_accounting`
  * ([[graft.queries.MultimodalQueries.ingestAccounting]]) registers the
  * same three verdicts computed online, hash-checked against DuckDB;
  * IngestGateSpec pins this gate's per-source rollup equal to that
  * query row-for-row, so the deployment path and the oracle cannot
  * drift.
  *
  * Replay safety is inherited from the three layouts: every check
  * anti-joins the delta's own filed rows (or self-excludes, for the
  * vector tier), so re-running [[checkDelta]] after [[appendDelta]] —
  * a restarted micro-batch — returns the identical verdicts, and the
  * appends file nothing twice. At-least-once verdict emission over
  * exactly-once indexes, the [[DedupIndexLayout.ingestStream]]
  * contract for the whole snapshot at once.
  */
object IngestGate {

  /** Build all three persisted indexes under one prefix. `whereDocs`
    * picks the corpus documents (text + media share the doc grain);
    * `whereVecs` the corpus vectors (vec_id == doc_id by the snapshot
    * convention). */
  def build(spark: SparkSession, dir: String, prefix: String,
      buckets: Int = 8, whereDocs: Column = lit(true),
      whereVecs: Column = lit(true)): Unit = {
    // contamSidecar: the gate RUNS the decontamination verdict per
    // micro-batch, so its dd index carries the s-keyed inverted
    // sidecar — the structure that makes that verdict's corpus-side
    // passes scan-pruned and shuffle-free instead of a per-batch full
    // scan+shuffle of the doc_id-bucketed shingle table
    // ([[DedupQueries.contamDeltaFlagsCm]])
    DedupIndexLayout.build(spark, dir, s"${prefix}_dd", buckets, whereDocs,
      contamSidecar = true)
    MediaIndexLayout.build(spark, dir, s"${prefix}_mm", buckets, whereDocs)
    AnnIndexLayout.build(spark, dir, s"${prefix}_ann", buckets, whereVecs)
    // the content-hash train/eval split of the corpus — the eval side
    // of the decontamination verdict (narrow, doc_id-bucketed; text
    // never re-read at check time)
    BucketedTables.writeBucketed(
      graft.util.Tables.load(spark, dir, "documents").filter(whereDocs)
        .select(col("doc_id"),
          graft.queries.DedupQueries.isTrainOf.as("is_train")),
      s"${prefix}_split", "doc_id", buckets)
  }

  /** [[build]] + [[CuratedCorpusLayout.buildIncremental]] with ONE
    * shingle index between them: the curated layout borrows the gate's
    * `<gatePrefix>_dd` instead of building its own byte-identical copy
    * — at 100 TB that halves the composed deployment's dominant index
    * storage, removes one full corpus shingle pass from the build, and
    * (with [[ingestAndCurate]]) files each snapshot into the shared
    * index exactly ONCE. Both layouts keep their exact semantics: the
    * gate's dedup verdicts and the curated gate algebra each anti-join
    * the delta's own rows, so neither can observe who filed the index
    * (SharedDdSpec pins verdicts AND the served corpus byte-equal to
    * the two-copy deployment). The borrow is recorded in the curated
    * prefix's `_ddsrc` sidecar; the shared index's lifecycle (compact,
    * purge) belongs to the GATE. */
  def buildWithCurated(spark: SparkSession, dir: String, gatePrefix: String,
      curatedPrefix: String, buckets: Int = 8,
      whereDocs: Column = lit(true), whereVecs: Column = lit(true),
      cosNBands: Int = graft.queries.DedupQueries.CosineLshBands,
      cosPlanesPerBand: Int = CuratedCorpusLayout.AutoPlanes): Unit = {
    require(gatePrefix != curatedPrefix,
      s"gatePrefix and curatedPrefix must be distinct (both '$gatePrefix')")
    build(spark, dir, gatePrefix, buckets, whereDocs, whereVecs)
    CuratedCorpusLayout.buildIncremental(spark, dir, curatedPrefix, buckets,
      where = whereDocs, whereVec = whereVecs, cosNBands = cosNBands,
      cosPlanesPerBand = cosPlanesPerBand,
      ddPrefix = Some(s"${gatePrefix}_dd"))
  }

  /** ONE verdict row per new asset: (doc_id, source, text_dup,
    * media_dup, sem_dup, crossmodal, keep). Does NOT append — call
    * [[appendDelta]] after acting on the result ([[ingestStream]]
    * sequences the two per micro-batch). `newVecs` is the batch's
    * (vec_id, embedding) rows — assets without a vector simply get
    * sem_dup = 0, like docs without an embedding pass the curation
    * chain's semantic stage untouched. */
  def checkDelta(spark: SparkSession, dir: String, prefix: String,
      newDocs: DataFrame, newVecs: DataFrame,
      minCosine: Double = 0.4): DataFrame = {
    import graft.queries.DedupQueries
    val nd = newDocs.dropDuplicates("doc_id").localCheckpoint(true)
    val (ids, shD, bD, tD) = deltaFrames(nd)
    checkDeltaWith(spark, dir, prefix, nd, ids, shD, bD, tD, newVecs,
      minCosine)
  }

  /** Above this delta size the composed path's shared per-doc frames
    * (shingles, bands, tiles) stay LAZY instead of being cached: a
    * cached frame is computed once but every consumer re-reads its
    * serialized rows from the block manager, while a lazy frame is
    * recomputed per consumer FUSED into that consumer's whole-stage
    * codegen pipeline — and past bulk-backfill size the store+re-read
    * costs more than the recompute. Measured on the 50× salted
    * universe (ComposedIngestBench, STREAMBENCH.md round 15): cached
    * wins at a 10k-doc delta (0.86× vs sequential), INVERTS at 50k
    * (1.76×, reproduced twice); lazy composition is the sequential
    * path's plans by construction, so above the threshold composed ≈
    * sequential in cost while keeping the composition's structural
    * guarantees (one split definition, one verdict frame, one filing
    * discipline). Steady-state snapshot deltas sit far below this;
    * only bulk backfills cross it.
    *
    * This doc-count form survives as the EXPLICIT override
    * (`graft.compose.cacheMaxDocs` — also the specs' force-lazy
    * switch); the DEFAULT dial is [[ComposeCacheMaxBytes]], because
    * the crossover is a byte phenomenon, not a row-count one. */
  val ComposeCacheMaxDocs: Long = 16384L

  /** The cache-vs-lazy crossover in the dimension that actually
    * drives it: SERIALIZED FRAME BYTES per consumer. The measured
    * bracket (10k-doc win / 50k-doc loss) was taken on ~300-byte docs
    * — i.e. the win/loss boundary sits near 16 384 docs × ~300 B ≈
    * 5 MB of delta text, from which the per-doc frames (shingles,
    * bands, tiles) derive roughly linearly. A doc-count dial would
    * misclassify by the doc-length ratio in either direction: a
    * 16k-doc delta of 100 kB documents is ~300× the measured bracket
    * (must stay lazy), a million tweet-length docs is within it (may
    * cache). [[deltaFrames]] therefore compares the batch's own summed
    * text length — one cheap agg over the already-checkpointed `nd` —
    * against this bound; override via `graft.compose.cacheMaxBytes`,
    * or pin the legacy doc-count behavior with
    * `graft.compose.cacheMaxDocs` (which, when set, wins). */
  val ComposeCacheMaxBytes: Long = ComposeCacheMaxDocs * 300L

  /** The delta's per-doc frames — distinct ids, sized shingles,
    * MinHash band rows, perceptual tile rows — defined ONCE per
    * snapshot and threaded through every consumer (check, filing,
    * curated refresh). `nd` must already be doc_id-deduplicated and
    * materialized; every derivation below is pure (deterministic
    * hashing over `nd`'s checkpointed rows), so consumers see
    * identical frame CONTENT whether the frames are cached
    * (bounded deltas: pay each pass once) or lazy (bulk deltas: each
    * consumer recomputes, fused into its own codegen pipeline). The
    * cache decision is BYTES-driven by default
    * ([[ComposeCacheMaxBytes]]), with the doc-count conf as the
    * explicit override. */
  private def deltaFrames(nd: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import graft.queries.DedupQueries
    // ids always materialize: delta-sized, broadcast into every
    // consumer's anti-joins
    val ids = nd.select(col("doc_id")).localCheckpoint(true)
    val conf = nd.sparkSession.conf
    // the crossover is a serialized-BYTES phenomenon, so the default
    // dial is the batch's own summed text length — one cheap agg over
    // the checkpointed nd. An explicitly set doc-count conf wins (a
    // deployment that knows its regime, and the specs' force-lazy
    // switch).
    val cache = conf.getOption("graft.compose.cacheMaxDocs") match {
      case Some(maxDocs) => ids.count() <= maxDocs.toLong
      case None =>
        val maxBytes = conf.get("graft.compose.cacheMaxBytes",
          ComposeCacheMaxBytes.toString).toLong
        nd.agg(coalesce(sum(length(col("text"))), lit(0L)))
          .head().getLong(0) <= maxBytes
    }
    def mat(df: DataFrame): DataFrame =
      if (cache) df.localCheckpoint(true) else df
    val shD = mat(DedupQueries.withSizes(DedupQueries.shinglesOf(nd)))
    val bD = mat(DedupQueries.minhashBandsOf(
      DedupQueries.minhashSigFrom(shD.select(col("doc_id"), col("s")))))
    val tD = mat(graft.queries.MultimodalQueries.tileRowsOf(nd))
    (ids, shD, bD, tD)
  }

  /** [[checkDelta]] with the delta's shingle/band and signature/tile
    * passes PRECOMPUTED — the seam [[ingestAndCurate]] uses so one
    * snapshot defines each per-delta frame once across the gate check
    * AND the curated refresh. `nd` and `ids` are always materialized
    * (localCheckpoint); `shD`/`bD`/`tD` are either materialized
    * (deltas within [[ComposeCacheMaxBytes]]: each pass paid once) or
    * lazy-but-deterministic recomputations from the checkpointed `nd`
    * (bulk deltas: each consumer re-derives them fused into its own
    * codegen pipeline — same content either way, [[deltaFrames]]). */
  private[sources] def checkDeltaWith(spark: SparkSession, dir: String,
      prefix: String, nd: DataFrame, ids: DataFrame, shD: DataFrame,
      bD: DataFrame, tD: DataFrame, newVecs: DataFrame,
      minCosine: Double): DataFrame = {
    def hitsOf(pairs: DataFrame, flag: String): DataFrame =
      pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id")))
        .join(broadcast(ids), Seq("doc_id"), "left_semi").distinct()
        .withColumn(flag, lit(1L))
    val tHits = hitsOf(
      DedupIndexLayout.dedupDeltaFrom(spark, s"${prefix}_dd", ids, shD, bD),
      "text_dup")
    val mHits = hitsOf(
      MediaIndexLayout.dedupDeltaFrom(spark, s"${prefix}_mm", ids, tD),
      "media_dup")
    val sHits = AnnIndexLayout.semanticDedupDelta(spark, dir,
        s"${prefix}_ann", newVecs, minCosine)
      .select(col("vec_new").as("doc_id")).distinct()
      .withColumn("sem_dup", lit(1L))
    // eval-leak verdict: a new TRAIN-side doc CONTAINING a corpus eval
    // doc must be flagged before it trains — delta-driven,
    // union-capped (dedup_contam_delta's exact semantics, including
    // its t.is_train scope: an eval-side delta doc can never carry the
    // flag; IngestGateSpec reconciles). Served from the s-keyed
    // inverted sidecar when the gate build wrote one (the scan-pruned,
    // shuffle-free plan — ContamSidecarSpec pins it byte-equal to the
    // corpus-scan form below, which remains the pre-sidecar
    // deployments' path and the bench A/B leg
    // (`graft.contam.sidecar=false` / SPARK_GRAFT_CONTAM_SIDECAR)).
    val useCm =
      spark.conf.get("graft.contam.sidecar",
        sys.env.getOrElse("SPARK_GRAFT_CONTAM_SIDECAR", "true")).toBoolean &&
        spark.catalog.tableExists(DedupIndexLayout.cmTable(s"${prefix}_dd"))
    val trainIds =
      nd.filter(graft.queries.DedupQueries.isTrainOf).select(col("doc_id"))
    val cHits = (if (useCm)
      graft.queries.DedupQueries.contamDeltaFlagsCm(spark,
        BucketedTables.read(spark,
          DedupIndexLayout.cmTable(s"${prefix}_dd")),
        shD, ids, trainIds)
    else
      graft.queries.DedupQueries.contamDeltaFlags(
        BucketedTables.read(spark, s"${prefix}_dd_shingles")
          .join(broadcast(ids), Seq("doc_id"), "left_anti"),
        shD,
        BucketedTables.read(spark, s"${prefix}_split")
          .join(broadcast(ids), Seq("doc_id"), "left_anti"),
        trainIds))
      .withColumn("eval_contam", lit(1L))
    nd.select(col("doc_id"), col("source"),
        graft.queries.DedupQueries.isTrainOf.as("is_train"))
      .join(tHits, Seq("doc_id"), "left")
      .join(mHits, Seq("doc_id"), "left")
      .join(sHits, Seq("doc_id"), "left")
      .join(cHits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("text_dup", "media_dup", "sem_dup", "eval_contam"))
      .select(col("doc_id"), col("source"), col("is_train"),
        col("text_dup"), col("media_dup"), col("sem_dup"),
        col("eval_contam"),
        when(col("text_dup") === 1L && col("media_dup") === 1L, "both")
          .when(col("text_dup") === 1L, "text_only")
          .when(col("media_dup") === 1L, "media_only")
          .otherwise("none").as("crossmodal"),
        (col("text_dup") === 0L && col("media_dup") === 0L &&
          col("sem_dup") === 0L).as("keep"),
        // what a TRAINING run may actually consume: unique in every
        // modality, train-side, and not an eval leak
        (col("text_dup") === 0L && col("media_dup") === 0L &&
          col("sem_dup") === 0L && col("is_train") &&
          col("eval_contam") === 0L).as("train_ok"))
  }

  /** File the batch into all three indexes — each append idempotent
    * under retries via its layout's own anti-join discipline. */
  def appendDelta(spark: SparkSession, prefix: String, newDocs: DataFrame,
      newVecs: DataFrame, buckets: Int = 8): Unit = {
    DedupIndexLayout.appendDeltaDocs(spark, s"${prefix}_dd", newDocs, buckets)
    MediaIndexLayout.appendDeltaDocs(spark, s"${prefix}_mm", newDocs, buckets)
    appendDeltaRest(spark, prefix, newDocs, newVecs, buckets)
  }

  /** [[appendDelta]] with the text index's shingle/band passes and the
    * media index's signature/tile pass PRECOMPUTED — the
    * [[ingestAndCurate]] leg. */
  private def appendDeltaFrom(spark: SparkSession, prefix: String,
      newDocs: DataFrame, ids: DataFrame, shD: DataFrame, bD: DataFrame,
      tD: DataFrame, newVecs: DataFrame, buckets: Int): Unit = {
    DedupIndexLayout.appendDeltaDocsFrom(spark, s"${prefix}_dd", ids, shD,
      bD, buckets,
      Some(newDocs.dropDuplicates("doc_id").select(col("doc_id"),
        graft.queries.DedupQueries.isTrainOf.as("is_train"))))
    MediaIndexLayout.appendDeltaDocsFrom(spark, s"${prefix}_mm", ids, tD,
      buckets)
    appendDeltaRest(spark, prefix, newDocs, newVecs, buckets)
  }

  /** The vector/split legs of [[appendDelta]]. The ANN tier has no
    * shareable per-delta frame: the check consumes the delta as
    * QUERIES (probe-side centroid distances) while the append files
    * the delta's cell assignment + PQ codes — different computations,
    * both centroid-broadcast-bounded. */
  private def appendDeltaRest(spark: SparkSession, prefix: String,
      newDocs: DataFrame, newVecs: DataFrame, buckets: Int): Unit = {
    AnnIndexLayout.appendDeltaVectors(spark, s"${prefix}_ann", newVecs,
      buckets)
    val nd = newDocs.dropDuplicates("doc_id")
    BucketedTables.appendBucketed(
      nd.select(col("doc_id"),
          graft.queries.DedupQueries.isTrainOf.as("is_train"))
        .join(BucketedTables.read(spark, s"${prefix}_split")
            .select(col("doc_id"))
            .join(broadcast(nd.select(col("doc_id"))), Seq("doc_id"),
              "left_semi").distinct(),
          Seq("doc_id"), "left_anti"),
      s"${prefix}_split", "doc_id", buckets)
    spark.catalog.refreshTable(s"${prefix}_split")
  }

  /** The per-source rollup of [[checkDelta]]'s verdicts — the exact
    * column contract of the registered `mm_ingest_accounting` query
    * (IngestGateSpec asserts equality), so a gate deployment and the
    * oracle-checked accounting read the same numbers. */
  def accountingOf(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_new"),
        sum(col("text_dup")).as("n_text_dup"),
        sum(col("media_dup")).as("n_media_dup"),
        sum(col("sem_dup")).as("n_sem_dup"),
        sum(col("text_dup") * col("media_dup")).as("n_both_tm"),
        sum(col("text_dup") * (lit(1L) - col("media_dup")))
          .as("n_text_only"),
        sum((lit(1L) - col("text_dup")) * col("media_dup"))
          .as("n_media_only"),
        sum(col("keep").cast(LongType)).as("n_keep"))
      .orderBy(col("source"))

  /** The COMPOSED snapshot path: gate check + index filing + curated
    * refresh off ONE shared delta-frame definition. A deployment that
    * runs [[checkDelta]]/[[appendDelta]] and then
    * [[CuratedCorpusLayout.refresh]] per snapshot shingles and
    * MinHash-signs the delta twice (once in the gate, once in the
    * refresh); here the delta's doc-dedup, sized-shingle, band, and
    * perceptual signature/tile frames are defined once and threaded
    * through every consumer ([[checkDeltaWith]],
    * [[DedupIndexLayout.appendDeltaDocsFrom]],
    * [[MediaIndexLayout.appendDeltaDocsFrom]],
    * [[CuratedCorpusLayout.refreshWith]]). For deltas within
    * [[ComposeCacheMaxBytes]] the frames are CACHED, so the shingle
    * and `graft_psig` passes are paid once instead of per consumer —
    * two of the sequential path's three per-delta shingle/sign passes
    * removed: measured parity (1.01×) at a 1000-doc delta where the
    * fixed state-maintenance algebra dominates, 0.86× at a 10k-doc
    * delta against a 10× corpus (ComposedIngestBench, composed leg
    * timed first — conservative ordering; 0.92× before the media
    * kernel was shared). ABOVE the byte threshold the frames stay
    * lazy BY DESIGN and each consumer re-derives its own fused pass
    * (the measured 50k-doc inversion, STREAMBENCH round 15) — the
    * pay-once claim holds only under the threshold; the structural
    * guarantees (one split definition, one verdict frame, one filing
    * discipline) hold at every size.
    *
    * Semantics are EXACTLY check → append → refresh on the same delta
    * (IngestAndCurateSpec pins verdicts and curated state byte-equal
    * to the sequential calls, and that the composed plans re-derive
    * neither shingles nor perceptual signatures). `gatePrefix` holds
    * the three gate indexes + split
    * table ([[build]]); `curatedPrefix` the curated layout
    * ([[CuratedCorpusLayout.buildIncremental]]) — distinct prefixes,
    * enforced. A [[buildWithCurated]] deployment additionally SHARES
    * the `_dd` shingle index between them (one storage copy, one
    * filing per snapshot — the refresh's own filing is skipped since
    * the gate's append already landed it). Verdicts are materialized
    * BEFORE any filing (the check-before-append discipline), and every
    * leg inherits its layout's replay idempotence, so a crashed
    * composed run is repaired by re-running it. */
  def ingestAndCurate(spark: SparkSession, dir: String, gatePrefix: String,
      curatedPrefix: String, deltaDocs: DataFrame, deltaVecs0: DataFrame,
      buckets: Int = 8, minCosine: Double = 0.4): DataFrame = {
    // one prefix would alias the gate's `_dd`/`_split` tables onto the
    // curated layout's — the gate's filing would silently change the
    // refresh's dedup semantics instead of failing fast
    require(gatePrefix != curatedPrefix,
      s"gatePrefix and curatedPrefix must be distinct (both '$gatePrefix')")
    val nd = deltaDocs.dropDuplicates("doc_id").localCheckpoint(true)
    val (ids, shD, bD, tD) = deltaFrames(nd)
    // pinned: consumed by the gate check, the ANN filing, and the
    // curated cosine-state refresh
    val deltaVecs = deltaVecs0.localCheckpoint(true)
    val verdicts = checkDeltaWith(spark, dir, gatePrefix, nd, ids, shD, bD,
      tD, deltaVecs, minCosine).localCheckpoint(true)
    appendDeltaFrom(spark, gatePrefix, nd, ids, shD, bD, tD, deltaVecs,
      buckets)
    // a [[buildWithCurated]] deployment shares the gate's `_dd` index:
    // the append above already filed the delta there, so the refresh
    // skips its (idempotent, but ledger-fallback-priced) re-filing
    val sharedDd =
      CuratedCorpusLayout.ddPrefixOf(spark, curatedPrefix) ==
        s"${gatePrefix}_dd"
    CuratedCorpusLayout.refreshWith(spark, dir, curatedPrefix, nd, ids, shD,
      bD, deltaVecs, buckets, ddFiled = sharedDd)
    verdicts
  }

  /** CONTINUOUS composed ingest+curation: [[ingestAndCurate]] per
    * micro-batch — the nightly-crawl deployment shape with ONE delta
    * pass per snapshot: each batch is checked against all three gate
    * indexes, filed into them, and refreshed into the curated corpus,
    * all off the same materialized shingle/band frames; the verdicts
    * go to `sink`. Convergence and replay safety are inherited leg by
    * leg: every gate append and every curated state table ends
    * byte-equal to the one-shot path over the union of batches, and a
    * replayed batch re-emits identical verdicts while filing nothing
    * (IngestAndCurateStreamSpec pins the curated artifact equal to the
    * full rebuild over corpus ∪ all batches, through a replay). */
  def ingestAndCurateStream(spark: SparkSession, dir: String,
      gatePrefix: String, curatedPrefix: String, assetStream: DataFrame,
      buckets: Int = 8, checkpoint: Option[String] = None,
      minCosine: Double = 0.4)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(gatePrefix != curatedPrefix,
      s"gatePrefix and curatedPrefix must be distinct (both '$gatePrefix')")
    val w = assetStream.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        // verdicts are materialized BEFORE any filing inside
        // ingestAndCurate (the check-before-append discipline), so
        // handing them to the sink after the call loses nothing
        sink(ingestAndCurate(spark, dir, gatePrefix, curatedPrefix,
          batch.select(col("doc_id"), col("source"), col("text")),
          batch.filter(col("embedding").isNotNull)
            .select(col("doc_id").as("vec_id"), col("embedding")),
          buckets, minCosine), batchId)
      }
      .start()
  }

  /** CONTINUOUS composite ingest: a stream of assets — (doc_id,
    * source, text, embedding ARRAY<FLOAT> nullable) — is checked
    * against all three indexes and then filed into them, one
    * micro-batch at a time (check first, then append; the joins are
    * batch plans Structured Streaming forbids on unbounded input —
    * the usual stream-to-batch bridge). A replayed batch re-emits
    * IDENTICAL verdicts while the appends file nothing, so an
    * idempotent sink completes exactly-once end to end.
    *
    * `monitor` gives the composite path the same when-to-retrain
    * signal as [[AnnIndexLayout.maintainStream]]: after each filed
    * batch, the geometry staleness audit runs with that batch's
    * vectors as the freshness probe — the gate keeps FILING under the
    * frozen geometry either way (retraining is a rebuild decision,
    * never a stream's), and an audit failure is reported and
    * swallowed so monitoring can never take down the ingest it
    * observes. */
  def ingestStream(spark: SparkSession, dir: String, prefix: String,
      assetStream: DataFrame, buckets: Int = 8,
      checkpoint: Option[String] = None,
      monitor: Option[graft.streaming.AnnStalenessMonitor] = None,
      minCosine: Double = 0.4)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = assetStream.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        val docsB = batch.select(col("doc_id"), col("source"), col("text"))
        // materialized: consumed by the check, the ANN filing, and the
        // monitor tick (whose emptiness probe then reads checkpointed
        // partitions instead of re-running the batch filter)
        val vecsB = batch.filter(col("embedding").isNotNull)
          .select(col("doc_id").as("vec_id"), col("embedding"))
          .localCheckpoint(true)
        // one set of materialized delta frames serves the check AND
        // the filing — the per-batch shingle and graft_psig passes are
        // paid once, not per consumer (the ingestAndCurate discipline)
        val nd = docsB.dropDuplicates("doc_id").localCheckpoint(true)
        val (ids, shD, bD, tD) = deltaFrames(nd)
        sink(checkDeltaWith(spark, dir, prefix, nd, ids, shD, bD, tD,
          vecsB, minCosine), batchId)
        appendDeltaFrom(spark, prefix, nd, ids, shD, bD, tD, vecsB, buckets)
        monitor.foreach { m =>
          // a batch with NO embedded assets has nothing to probe
          // freshness with — ticking anyway would raise on the NULL
          // avg_qerr and (spuriously) log a failed audit every such
          // batch, skipping the occupancy-skew check too
          try if (!vecsB.isEmpty) m.check(spark, s"${prefix}_ann", vecsB,
            atMs = System.currentTimeMillis())
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(
                s"[ann-staleness] gate audit tick failed " +
                  s"(ingest unaffected): $e")
          }
        }
      }
      .start()
  }
}
