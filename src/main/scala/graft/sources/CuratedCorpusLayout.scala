package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    `EventsPipeline.compactHourlyMetrics` discipline), so the docs
  *    table ITSELF is atomic to readers and crash-safe.
  *  - `<prefix>_manifest` — the attrition table (stage, n_in,
  *    n_dropped, n_out, tokens_out) of the SAME chain invocation that
  *    produced the docs, so the written corpus can never drift from
  *    the manifest describing it (CuratedCorpusSpec reconciles it
  *    against the live registered query).
  *  - `<prefix>_checksums` — the `util_table_checksums` handoff gate
  *    applied to the artifact: row count + order-free XOR h60 fold
  *    over the canonical (doc_id, h, source, n_tokens) string (NULLs
  *    encoded as an explicit sentinel so a row cannot hash the same
  *    with a field nulled out), published by the producer at build
  *    time; [[verifyHandoff]] re-derives it from the stored rows so a
  *    consumer detects CORRUPTION OR TRUNCATION of the artifact after
  *    publication — an integrity check, not an authentication gate
  *    (the fold is not cryptographic; adversarial tampering is out of
  *    scope).
  *
  * Atomicity scope — the full REBUILD ordering argument (why this
  * layout does not need [[GenerationPointer]]'s generation machinery
  * despite spanning ~10 tables):
  *  1. Each table publishes through its own replaceBucketed swap, so
  *     no reader ever sees a torn TABLE.
  *  2. The READER-FACING surface is exactly [[serve]]/[[servePacked]]
  *     (`_docs` + tombstones), [[manifest]], and [[verifyHandoff]]
  *     (`_checksums`). Every other table (`_base`, `_mh_pairs`,
  *     `_cos_pairs`, `_ct_pairs`, `_cos_bands`, `_cos_geom`, `_ddsrc`,
  *     `_vecs`, `_texts`, the dd index) is INTERNAL state read only by
  *     build/refresh — and the layout's writer contract is single-
  *     writer, so no consumer can observe a mixed set of those.
  *  3. The reader-facing tables publish in a FIXED, load-bearing
  *     order: `_docs` swap → tombstone clear → `_manifest` swap →
  *     `_checksums` swap (LAST). A reader between any two of those
  *     sees new docs against a stale checksum — n_rows/fold mismatch —
  *     so [[verifyHandoff]] returns ok=false: fail-closed, never a
  *     silent mix. Conversely ok=true implies the checksum was derived
  *     from the docs now served, and since the checksum swap is last,
  *     the manifest swapped BEFORE it — ok=true therefore pins the
  *     whole (docs, tombstones, manifest, checksums) set to one build.
  *     (Caveat, accepted: two builds producing checksum-identical docs
  *     make the gate pass with either manifest — then the doc set is
  *     identical by construction and only intermediate attrition
  *     counters could differ.)
  *  4. A rebuild crashing BEFORE the `_docs` swap leaves the entire
  *     old reader surface — docs, tombstones, manifest, checksums —
  *     untouched and mutually consistent (ok=true, old artifact
  *     serving); the tombstone clear deliberately sits AFTER the swap
  *     so this holds (clearing first would resurrect refresh-evicted
  *     docs in [[serve]] during the crash window). Crashing anywhere
  *     after the swap leaves ok=false until the rebuild re-runs.
  *     Either way the repair is re-running the rebuild, and it must
  *     happen BEFORE the next [[refresh]] (the internal state tables
  *     already carry the new corpus; a refresh diffed against the old
  *     artifact would mix the two — the single-writer contract makes
  *     this an operator sequencing rule, not a race).
  *  CuratedPublishSpec kills a rebuild on both sides of the swap and
  *  pins all of the above.
  *
  * Reference point: the reference publishes derived tables for
  * consumers to read (database/schema.sql:30-59) rather than having
  * each dashboard recompute the pipeline; this is that discipline
  * applied to the curation composite.
  */
object CuratedCorpusLayout {

  /** Sentinel for [[buildIncremental]]'s `cosPlanesPerBand`: size the
    * sign-LSH band width W from the corpus itself (the default). The
    * scale story used to end with "turn W up at ~100× this SF" — a
    * scaladoc instruction an operator had to remember at exactly the
    * scale where forgetting it makes the cosine pass the build's
    * superlinear term. Auto makes the build turn its own dial:
    * [[autoPlanesPerBand]] picks the smallest W that bounds expected
    * per-bucket postings (corpus/2^W) to [[AutoTargetPostings]], never
    * below the recall-favoring audit default (W=6 — so every bounded-SF
    * build, spec, and oracle is byte-identical to the explicit-W=6
    * build), and the choice is frozen in the `_cos_geom` sidecar like
    * any explicit W: refreshes band deltas under the persisted
    * geometry, and re-sizing remains a rebuild. */
  val AutoPlanes: Int = 0

  /** Per-band bucket-load target for [[AutoPlanes]]: expected postings
    * per bucket stay ≤ this, so per-bucket candidate work (~p²/2) stays
    * bounded and the cosine pass scales with corpus × target instead of
    * corpus²/2^W at a frozen W. 1024 puts the thresholds exactly on
    * the measured guidance: ≤65k vectors keep the audit W=6, the 50×
    * decade (100k) gets W=7, the 100× decade (200k) gets the
    * documented W=8 (BENCH_SF1.md round 15 measures that turn). */
  val AutoTargetPostings: Long = 1024L

  /** The [[AutoPlanes]] resolution — pure so the threshold behavior is
    * unit-testable without 100k-row fixtures: smallest W with
    * nVecs/2^W ≤ [[AutoTargetPostings]], floored at the W=6 audit
    * default ([[DedupQueries.CosineLshBandPlanes]]), capped at 16
    * (beyond it the bucket domain outruns any plausible single-table
    * corpus; band count, not width, is the next knob). Recall moves
    * the documented way — each +1 of W trades S-curve recall for a
    * halved bucket load (CosineLshRecallSpec measures the curve;
    * `dedup_cosine_lsh_w8` keeps the wide end oracle-pinned). */
  def autoPlanesPerBand(nVecs: Long): Int = {
    val need = math.ceil(math.log(math.max(1L, nVecs).toDouble /
      AutoTargetPostings) / math.log(2.0)).toInt
    math.min(16, math.max(DedupQueries.CosineLshBandPlanes, need))
  }

  /** Canonical per-row checksum string — doc_id (the unique key, so
    * identical texts cannot XOR-cancel), content hash, and the two
    * contract columns a consumer depends on. Each column is coalesced
    * to an explicit NULL sentinel first: concat_ws silently SKIPS null
    * arguments, so without it a row with (h=NULL, source="x") and one
    * with (h="x", source=NULL) would hash identically and a nulled-out
    * field could slip past the gate. */
  private def canon: org.apache.spark.sql.Column =
    concat_ws("|",
      Seq("doc_id", "h", "source", "n_tokens")
        .map(c => coalesce(col(c).cast("string"), lit("\u0000null"))): _*)

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
    publishSidecars(spark, prefix, attrition)
  }

  /** Publish manifest + checksums, each through its own atomic
    * replace-swap (a plain mode-overwrite drops the old table before
    * the new one is complete — a reader in that window would see a
    * missing/torn sidecar instead of the documented fail-closed
    * mismatch). The checksum derives from what was JUST swapped into
    * `_docs` (not a pre-swap plan): the gate fingerprints the artifact
    * on disk. ORDER IS LOAD-BEARING (header point 3): the checksum
    * swap comes LAST, so a [[verifyHandoff]] ok=true entails the
    * manifest already belongs to the same build — swapping the
    * manifest after the checksums would reopen the new-docs/old-
    * manifest window the fail-closed argument closes. */
  private[sources] def publishSidecars(spark: SparkSession, prefix: String,
      attrition: DataFrame): Unit = {
    BucketedTables.replaceBucketed(spark, s"${prefix}_manifest", "stage", 1,
      attrition)
    BucketedTables.replaceBucketed(spark, s"${prefix}_checksums", "tbl", 1,
      checksumOf(serve(spark, prefix)))
    Seq("docs", "manifest", "checksums")
      .foreach(t => spark.catalog.refreshTable(s"${prefix}_$t"))
  }

  /** The curated corpus, served from disk — NO re-curation: the plan
    * reads `<prefix>_docs` and nothing else (CuratedCorpusSpec pins
    * the absence of every chain stage). For an INCREMENTAL prefix the
    * read is tombstone-filtered (refresh evictions take effect
    * immediately, physical erasure at [[compactDocs]]); a plain-build
    * prefix has no tombstone table and keeps the identity plan. */
  def serve(spark: SparkSession, prefix: String): DataFrame =
    Tombstones.filter(spark, prefix, spark.table(s"${prefix}_docs"), "doc_id")

  /** The attrition manifest of the build that produced [[serve]]'s
    * rows. */
  def manifest(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_manifest")

  /** The curated corpus as a PACKING PLAN — per (source, seq_id)
    * 512-token context window: docs in it, token fill, doc-id range —
    * the last step between the artifact and training shards
    * (`txt_pack_sequences`' plan over the SERVED survivors instead of
    * the raw corpus, reading the persisted n_tokens so no text is
    * tokenized). The window count reconciles EXACTLY with the
    * manifest's stage-8 pack row — same bin, same per-source doc_id
    * prefix rule (CuratedCorpusSpec pins it), so a training run can
    * verify it packed what the manifest promised. */
  def servePacked(spark: SparkSession, prefix: String,
      bin: Long = 512L): DataFrame =
    graft.queries.TextQueries.packPlanOf(spark,
      serve(spark, prefix)
        .select(col("source"), col("doc_id"), col("n_tokens")), bin)

  // =====================================================================
  // INCREMENTAL curation — refresh the artifact from a snapshot delta
  // instead of re-running the 8-stage chain over the whole corpus
  // =====================================================================

  /** [[build]] plus the PERSISTED STATE an incremental [[refresh]]
    * maintains — the composition the round-for-round rebuild was the
    * last holdout for: the dedup/media/ANN indexes already ingest
    * deltas continuously; this makes the curated corpus itself do so.
    *
    * State tables under `prefix` (next to the artifact trio):
    *  - `<prefix>_base` (bucketed doc_id): [[DedupQueries.curateBaseOf]]
    *    per-doc values — content hash, 80/20 split, mix hash, token
    *    count, quality verdict. Pure per-doc, append-only.
    *  - `<prefix>_dd_shingles` / `<prefix>_dd_bands`: a full
    *    [[DedupIndexLayout]] over the corpus (the MinHash ingest index,
    *    reused verbatim — candidate generation AND the contamination
    *    posting grain read from it). With `ddPrefix` the layout
    *    BORROWS an existing index (an ingest gate's) instead of
    *    building its own — one shingle index per composed deployment,
    *    one filing per snapshot, recorded in the `<prefix>_ddsrc`
    *    sidecar (SharedDdSpec pins the borrow byte-equal to owning).
    *  - `<prefix>_mh_pairs` (doc_a, doc_b, jaccard): the FULL verified
    *    MinHash pair set. Append-only: a delta adds exactly the pairs
    *    touching it ([[DedupIndexLayout.dedupDelta]]'s proven-byte-equal
    *    core).
    *  - `<prefix>_cos_bands` / `<prefix>_cos_pairs`: the sign-LSH band
    *    index and FULL verified cosine pair set
    *    ([[DedupQueries.cosPairsState]] maintains the pairs exactly —
    *    including pool-cap evictions in buckets the delta grows).
    *  - `<prefix>_cos_geom` (n_bands, planes_per_band): the sign-LSH
    *    geometry the cosine state was built under — refresh always
    *    bands deltas under THIS, never the code default.
    *  - `<prefix>_ct_pairs` (eval_doc, doc_id, n_eval, common): the
    *    contamination pairs at the 0.5 floor
    *    ([[DedupQueries.contamPairsState]] maintains them exactly —
    *    including posting-cap crossings, where common only decreases).
    *
    * The stage GATING is pure doc_id-grain algebra over these frames
    * ([[DedupQueries.curateGate]], shared with `pipeline_curate`
    * itself), so refresh-then-gate is byte-equal to a full rebuild
    * over corpus ∪ delta by construction once the pair states are —
    * which is exactly what CuratedDeltaSpec pins, both ways, plus
    * replay idempotence. Global couplings the gate re-derives per
    * refresh (why stages canNOT be append-only): exact keep-min per
    * hash can EVICT a kept doc when a smaller-id twin arrives;
    * temperature-mix rates move with every source's token total and
    * can flip ANY survivor's mix verdict; a delta EVAL doc can
    * contaminate a long-kept train doc. The artifact applies the new
    * survivor set as evict (tombstone) / revive / append — never a
    * corpus rewrite.
    *
    * `where` picks the corpus documents; `whereVec` the corpus
    * vectors (the chain reads ALL vectors of the table, so the split
    * must be given for both grains).
    *
    * `cosNBands`/`cosPlanesPerBand` set the sign-LSH geometry of the
    * persisted cosine state — the capacity dial a 100× corpus turns
    * (band width W re-bounds per-bucket postings ~corpus/2^W; the
    * salted-universe measurement put the W=6 default at 3.01× @10×
    * vs W=8 at 1.79×, [[DedupQueries.cosineLshConfig]]). The default
    * is [[AutoPlanes]]: the build sizes W from the corpus itself
    * ([[autoPlanesPerBand]] — W=6 at every bounded SF, W=8 at the
    * 100× decade), so the dial turns without an operator remembering
    * the scaladoc. Auto or explicit, the geometry is PERSISTED in a
    * `<prefix>_cos_geom` sidecar at build time and every [[refresh]]
    * reads it from there — the [[AnnIndexLayout]] frozen-geometry
    * discipline: a delta banded under a different geometry than the
    * stored `_cos_bands` index would generate candidates in
    * incomparable buckets (silent recall loss), so the dial exists
    * ONLY at build; changing it is a rebuild. */
  def buildIncremental(spark: SparkSession, dir: String, prefix: String,
      buckets: Int = 8, where: Column = lit(true),
      whereVec: Column = lit(true),
      cosNBands: Int = DedupQueries.CosineLshBands,
      cosPlanesPerBand: Int = AutoPlanes,
      ddPrefix: Option[String] = None): Unit =
    buildIncrementalImpl(spark, dir, prefix, buckets, where, whereVec,
      cosNBands, cosPlanesPerBand, ddPrefix, _ => ())

  /** [[buildIncremental]] with the publish-crash fault hook
    * (CuratedPublishSpec — the AnnPublishSpec/TextPublishSpec
    * discipline for this layout's ordered-swap publication). */
  private[sources] def buildIncrementalImpl(spark: SparkSession,
      dir: String, prefix: String, buckets: Int, where: Column,
      whereVec: Column, cosNBands: Int, cosPlanesPerBand: Int,
      ddPrefix: Option[String], faultHook: String => Unit): Unit = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    // resolve AUTO before anything persists: one narrow vec_id count
    // against the corpus split — build-rare, and the sidecar must name
    // the RESOLVED geometry (a sidecar saying "auto" would leave every
    // refresh re-deriving it against a grown corpus, exactly the
    // mixed-geometry drift the freeze exists to prevent)
    // distinct vec_id: the docs state the AUTO input as "the corpus
    // vector count", so a raw feed carrying duplicate vec_id rows must
    // not inflate the resolved W past what the banded set warrants
    // (the residual zero-norm overcount is ≤ the duplicates one and
    // only ever errs toward a wider, safer W)
    val cosPlanes =
      if (cosPlanesPerBand == AutoPlanes)
        autoPlanesPerBand(Tables.load(spark, dir, "embeddings")
          .filter(whereVec).select(col("vec_id")).distinct().count())
      else cosPlanesPerBand
    // the geometry sidecar goes FIRST: every later state table derives
    // from it, and a crash mid-build then leaves a prefix whose partial
    // state at least names the geometry it was being built under
    BucketedTables.replaceBucketed(spark, s"${prefix}_cos_geom", "n_bands", 1,
      spark.range(1).select(lit(cosNBands).as("n_bands"),
        lit(cosPlanes).as("planes_per_band")))
    val docsW = Tables.load(spark, dir, "documents").filter(where)
      .select(col("doc_id"), col("source"), col("text"))
    BucketedTables.writeBucketed(DedupQueries.curateBaseOf(docsW),
      s"${prefix}_base", "doc_id", buckets)
    // the MinHash index: OWNED by default, or BORROWED from an ingest
    // gate ([[IngestGate.buildWithCurated]]) — at 100 TB the shingle
    // index is the layout's dominant storage and per-snapshot filing
    // cost, and a composed gate+curation deployment would otherwise
    // keep two byte-identical copies and file every delta twice. The
    // choice is PERSISTED in the `_ddsrc` sidecar so every later
    // refresh resolves the same index this build read.
    val dd = ddPrefix.getOrElse(s"${prefix}_dd")
    BucketedTables.replaceBucketed(spark, s"${prefix}_ddsrc", "dd_prefix", 1,
      spark.range(1).select(lit(dd).as("dd_prefix")))
    ddPrefix match {
      case None =>
        DedupIndexLayout.buildDocs(spark, dd,
          docsW.select(col("doc_id"), col("text")), buckets)
      case Some(ext) =>
        // the borrowed index must cover EXACTLY this build's corpus —
        // a missing doc silently under-generates candidates, an extra
        // one injects foreign pairs into the gate algebra. Its ledger
        // records every filed doc_id (narrow), so set equality is two
        // id-column scans, paid once at build.
        require(spark.catalog.tableExists(s"${ext}_shingles"),
          s"$prefix: shared dd index '$ext' does not exist — build the " +
            "gate first (IngestGate.buildWithCurated orders this)")
        val extIds = spark.table(IngestLedger.table(ext))
        val corpusIds = docsW.select(col("doc_id"))
        val missing = corpusIds
          .join(extIds.select(col("id").as("doc_id")), Seq("doc_id"),
            "left_anti").count()
        val extra = extIds.count() - (corpusIds.count() - missing)
        require(missing == 0L && extra == 0L,
          s"$prefix: shared dd index '$ext' covers a different corpus " +
            s"($missing docs missing, $extra extra) — gate and curated " +
            "builds must use the same document predicate")
    }
    val sized = BucketedTables.read(spark, s"${dd}_shingles")
    val ddBands = BucketedTables.read(spark, s"${dd}_bands")
    BucketedTables.writeBucketed(
      DedupQueries.minhashPairsFromIndex(sized, ddBands),
      s"${prefix}_mh_pairs", "doc_a", buckets)
    val e = DedupQueries.normedDirVecs(
      Tables.load(spark, dir, "embeddings").filter(whereVec)
        .select(col("vec_id"), col("embedding")))
    val cosBands = DedupQueries.cosineBandsOf(e, cosNBands, cosPlanes)
      .persist()
    cosBands.count()
    BucketedTables.writeBucketed(cosBands,
      s"${prefix}_cos_bands", "code", buckets)
    BucketedTables.writeBucketed(
      DedupQueries.cosineLshFromBands(e, cosBands),
      s"${prefix}_cos_pairs", "vec_a", buckets)
    cosBands.unpersist(false)
    val (ctPairs, post) = DedupQueries.contamPairsFrom(
      BucketedTables.read(spark, s"${prefix}_base"),
      sized.select(col("doc_id"), col("s")))
    BucketedTables.writeBucketed(ctPairs,
      s"${prefix}_ct_pairs", "doc_id", buckets)
    post.unpersist(false)
    // system-of-record state for assets that arrive ONLY through
    // [[refresh]] and are not materialized in `dir` (a streamed
    // crawl): their raw vectors (cosine verification point lookups)
    // and texts (artifact append / re-keep) — empty at build, appended
    // per refresh. Without these, a later batch's near-dup pair
    // against an earlier streamed asset would silently drop at the
    // verify join.
    BucketedTables.writeBucketed(
      Tables.load(spark, dir, "embeddings").filter(lit(false))
        .select(col("vec_id"), col("embedding")),
      s"${prefix}_vecs", "vec_id", buckets)
    BucketedTables.writeBucketed(
      Tables.load(spark, dir, "documents").filter(lit(false))
        .select(col("doc_id"), col("text")),
      s"${prefix}_texts", "doc_id", buckets)
    val (s7, attrition) = gateFromState(spark, prefix)
    val text = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    faultHook("before-docs-swap")
    BucketedTables.replaceBucketed(spark, s"${prefix}_docs", "doc_id",
      buckets,
      s7.select(col("doc_id"), col("source"), col("h"), col("n_tokens"))
        .join(text, "doc_id"))
    // the tombstone clear belongs to the NEW artifact's publication
    // (the rebuilt docs bake every refresh eviction in), so it sits
    // AFTER the swap: a rebuild crashing before the swap leaves the
    // old surface — docs AND tombstones — exactly as served (header
    // point 4); clearing first would resurrect evicted docs in the
    // crash window
    Tombstones.clear(spark, prefix)
    faultHook("after-docs-swap")
    publishSidecars(spark, prefix, attrition)
  }

  /** The sign-LSH geometry the prefix's cosine state was built under,
    * read from the `_cos_geom` sidecar. Loud by design: a prefix
    * without the sidecar (built before the dial existed, or a partial
    * build that died before writing it) must NOT be refreshed under a
    * guessed geometry — delta bands in a different (band, code) space
    * than the stored index silently stop matching, which is recall
    * loss with no error anywhere. */
  private def cosGeometry(spark: SparkSession, prefix: String): (Int, Int) = {
    require(spark.catalog.tableExists(s"${prefix}_cos_geom"),
      s"$prefix: no _cos_geom sidecar — the prefix predates the cosine " +
        "geometry dial (or its build died before the sidecar write); " +
        "rebuild with buildIncremental before refreshing")
    val row = spark.table(s"${prefix}_cos_geom").head()
    (row.getAs[Int]("n_bands"), row.getAs[Int]("planes_per_band"))
  }

  /** The MinHash index this prefix reads/files — its own `<prefix>_dd`
    * or a gate's borrowed one, as the `_ddsrc` sidecar recorded at
    * build time (absent sidecar = a legacy prefix, which always owned
    * its index). */
  private[sources] def ddPrefixOf(spark: SparkSession,
      prefix: String): String =
    if (!spark.catalog.tableExists(s"${prefix}_ddsrc")) s"${prefix}_dd"
    else spark.table(s"${prefix}_ddsrc").head().getAs[String]("dd_prefix")

  /** The curation gate over the PERSISTED state — the same algebra
    * `pipeline_curate` runs, fed table reads instead of fresh passes. */
  private def gateFromState(spark: SparkSession,
      prefix: String): (DataFrame, DataFrame) =
    DedupQueries.curateGate(
      BucketedTables.read(spark, s"${prefix}_base"),
      () => spark.table(s"${prefix}_mh_pairs"),
      () => spark.table(s"${prefix}_cos_pairs"),
      () => spark.table(s"${prefix}_ct_pairs")
        .select(col("doc_id")).distinct())

  /** REFRESH the curated corpus with a snapshot delta: run the delta's
    * own per-doc passes, update every pair state exactly, re-gate, and
    * apply the survivor diff to the artifact — the post-refresh
    * [[serve]] is byte-equal to a full [[build]] over corpus ∪ delta
    * (CuratedDeltaSpec), at delta-plus-algebra cost instead of the
    * full chain (CuratedDeltaBench measures the gap).
    *
    * GEOMETRY SCOPE of that equality: a refresh runs under the FROZEN
    * `_cos_geom` geometry, so "equals a full rebuild" means a rebuild
    * AT THE SAME RESOLVED W. Under the [[AutoPlanes]] default that is
    * exact until corpus ∪ delta crosses an auto threshold
    * ([[autoPlanesPerBand]] — 2^W × [[AutoTargetPostings]] vectors);
    * past it a DEFAULT rebuild would resolve a wider W than the
    * frozen one and its pair state differs exactly as the W dial
    * differs (the S-curve recall trade, CosineLshRecallSpec). The
    * refresh stays internally exact either way — crossing the
    * threshold is the signal to schedule the rebuild that re-freezes
    * the wider geometry (the `dedup_cosine_pool_audit` telltale).
    *
    * Idempotent end to end: every state append anti-joins what is
    * already filed, the two replace-maintained pair states reconverge
    * on replay (their delta-member rows are rebuilt from scratch each
    * run), and the artifact diff is computed against the live table —
    * a crash anywhere is repaired by re-running the same refresh.
    *
    * `deltaDocs` is (doc_id, source, text); `deltaVecs` the delta's
    * (vec_id, embedding) rows (empty frame if the snapshot has no
    * vectors). */
  def refresh(spark: SparkSession, dir: String, prefix: String,
      deltaDocs0: DataFrame, deltaVecs: DataFrame,
      buckets: Int = 8): Unit = {
    val deltaDocs = deltaDocs0.dropDuplicates("doc_id").localCheckpoint(true)
    val ids = deltaDocs.select(col("doc_id")).localCheckpoint(true)
    val shD = DedupQueries.withSizes(DedupQueries.shinglesOf(deltaDocs))
      .localCheckpoint(true)
    val bD = DedupQueries.minhashBandsOf(
        DedupQueries.minhashSigFrom(shD.select(col("doc_id"), col("s"))))
      .localCheckpoint(true)
    refreshWith(spark, dir, prefix, deltaDocs, ids, shD, bD, deltaVecs,
      buckets)
  }

  /** [[refresh]] with the delta's shingle/band passes PRECOMPUTED —
    * the seam [[IngestGate.ingestAndCurate]] uses so one snapshot
    * defines each per-delta frame once across the gate check AND the
    * curated refresh. `deltaDocs` and `ids` are already
    * doc_id-deduplicated and materialized (localCheckpoint);
    * `shD`/`bD` are either materialized (deltas within
    * [[IngestGate.ComposeCacheMaxBytes]] — each pass paid once) or
    * lazy-but-deterministic recomputations from the checkpointed
    * `deltaDocs` (bulk deltas re-derive per consumer by design —
    * [[IngestGate.deltaFrames]]); identical frame content either
    * way. */
  private[sources] def refreshWith(spark: SparkSession, dir: String,
      prefix: String, deltaDocs: DataFrame, ids: DataFrame, shD: DataFrame,
      bD: DataFrame, deltaVecs: DataFrame, buckets: Int,
      ddFiled: Boolean = false): Unit = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    // the `_ddsrc` sidecar names the MinHash index this prefix reads —
    // its own, or the gate's shared one. Every step below is correct
    // under BOTH values and regardless of whether the delta is already
    // filed there: the candidate core and the contamination state
    // anti-join the delta's own ids out of the index (the replay
    // discipline), and the filing append is idempotent.
    val dd = ddPrefixOf(spark, prefix)
    val deltaBase = DedupQueries.curateBaseOf(deltaDocs).localCheckpoint(true)
    // 1. MinHash pairs touching the delta, through the persisted index
    //    (replay-safe: the core anti-joins the delta's own filed rows),
    //    fed the precomputed delta passes — no re-shingle here
    val mhNew = DedupIndexLayout.dedupDeltaFrom(spark, dd,
      ids, shD, bD)
    // replay idempotence: every mhNew pair touches the delta, so the
    // anti-join only needs the delta-touching SUBSET of stored pairs
    // (two broadcast semi scans, never a shuffle of the pair table)
    val mhStored = spark.table(s"${prefix}_mh_pairs")
      .select(col("doc_a"), col("doc_b"))
    val mhTouching = mhStored
      .join(broadcast(ids.toDF("doc_a")), Seq("doc_a"), "left_semi")
      .unionByName(mhStored
        .join(broadcast(ids.toDF("doc_b")), Seq("doc_b"), "left_semi"))
      .distinct()
    BucketedTables.appendBucketed(
      mhNew.join(mhTouching, Seq("doc_a", "doc_b"), "left_anti"),
      s"${prefix}_mh_pairs", "doc_a", buckets)
    spark.catalog.refreshTable(s"${prefix}_mh_pairs")
    // 2. contamination pair state (reads the dd index EXCLUDING the
    //    delta's ids, so it must run before — or is immune to — the
    //    index append below); `shD` is the same materialized shingle
    //    pass step 1 banded from
    val corpusSized = BucketedTables.read(spark, s"${dd}_shingles")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    val allBase = BucketedTables.read(spark, s"${prefix}_base")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("is_train"))
      .unionByName(deltaBase.select(col("doc_id"), col("is_train")))
    BucketedTables.replaceBucketed(spark, s"${prefix}_ct_pairs", "doc_id",
      buckets,
      DedupQueries.contamPairsState(corpusSized, shD, allBase, ids,
        spark.table(s"${prefix}_ct_pairs")))
    // 3. file the delta into the dedup index (the same materialized
    //    shingle/band frames — no re-shingle on the append either).
    //    The composed path ([[IngestGate.ingestAndCurate]] on a shared
    //    dd) has ALREADY filed it through the gate and says so — the
    //    idempotent append would file nothing, but its ledger fallback
    //    would pay the per-table anti-join scans to find that out.
    if (!ddFiled)
      // deltaBase's is_train IS [[DedupQueries.isTrainOf]] over the
      // same text, so a borrowed sidecar-equipped gate dd (the
      // sequential buildWithCurated deployment) files its sidecar from
      // the already-computed split
      DedupIndexLayout.appendDeltaDocsFrom(spark, dd, ids, shD, bD, buckets,
        Some(deltaBase.select(col("doc_id"), col("is_train"))))
    // 4. cosine pair state + band index — the delta is banded under
    //    the PERSISTED build geometry (never the code default), so the
    //    candidate join and the stored `_cos_bands` index always agree
    //    on the (band, code) space
    val (cosNBands, cosPlanes) = cosGeometry(spark, prefix)
    val dv = DedupQueries.normedDirVecs(
      deltaVecs.dropDuplicates("vec_id")).localCheckpoint(true)
    val dIds = dv.select(col("vec_id")).localCheckpoint(true)
    val dBands = DedupQueries.cosineBandsOf(dv, cosNBands, cosPlanes)
      .localCheckpoint(true)
    val storedBands = BucketedTables.read(spark, s"${prefix}_cos_bands")
      .join(broadcast(dIds), Seq("vec_id"), "left_anti")
    // verification lookups must reach EVERY indexed vector: the dir's
    // corpus, earlier STREAMED deltas (held in `_vecs` — they may
    // exist nowhere else), and the current batch; each leg excludes
    // the next legs' ids so an id present in several sources (a spec
    // replay) contributes exactly one row
    val stateVecs = BucketedTables.read(spark, s"${prefix}_vecs")
      .join(broadcast(dIds), Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    val lookupE = DedupQueries.normedDirVecs(
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .join(broadcast(dIds), Seq("vec_id"), "left_anti")
        .join(stateVecs.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .unionByName(stateVecs)
        .unionByName(deltaVecs.dropDuplicates("vec_id")
          .select(col("vec_id"), col("embedding"))))
    BucketedTables.replaceBucketed(spark, s"${prefix}_cos_pairs", "vec_a",
      buckets,
      DedupQueries.cosPairsState(lookupE, storedBands, dBands,
        spark.table(s"${prefix}_cos_pairs"), dIds))
    BucketedTables.appendBucketed(
      deltaVecs.dropDuplicates("vec_id")
        .join(BucketedTables.read(spark, s"${prefix}_vecs")
            .select(col("vec_id"))
            .join(broadcast(dIds), Seq("vec_id"), "left_semi").distinct(),
          Seq("vec_id"), "left_anti"),
      s"${prefix}_vecs", "vec_id", buckets)
    spark.catalog.refreshTable(s"${prefix}_vecs")
    // (idempotence anti-joins below restrict the stored side to the
    // delta's own ids first — a broadcast semi scan instead of a
    // corpus-wide distinct shuffle)
    BucketedTables.appendBucketed(
      dBands.join(BucketedTables.read(spark, s"${prefix}_cos_bands")
          .select(col("vec_id"))
          .join(broadcast(dIds), Seq("vec_id"), "left_semi").distinct(),
        Seq("vec_id"), "left_anti"),
      s"${prefix}_cos_bands", "code", buckets)
    spark.catalog.refreshTable(s"${prefix}_cos_bands")
    // 5. base rows + the streamed texts system-of-record
    BucketedTables.appendBucketed(
      deltaBase.join(BucketedTables.read(spark, s"${prefix}_base")
          .select(col("doc_id"))
          .join(broadcast(ids), Seq("doc_id"), "left_semi").distinct(),
        Seq("doc_id"), "left_anti"),
      s"${prefix}_base", "doc_id", buckets)
    spark.catalog.refreshTable(s"${prefix}_base")
    BucketedTables.appendBucketed(
      deltaDocs.select(col("doc_id"), col("text"))
        .join(BucketedTables.read(spark, s"${prefix}_texts")
            .select(col("doc_id"))
            .join(broadcast(ids), Seq("doc_id"), "left_semi").distinct(),
          Seq("doc_id"), "left_anti"),
      s"${prefix}_texts", "doc_id", buckets)
    spark.catalog.refreshTable(s"${prefix}_texts")
    // 6. re-gate from the updated state; 7. apply the survivor diff
    val (s7, attrition) = gateFromState(spark, prefix)
    applyArtifactDelta(spark, dir, prefix, buckets,
      s7.localCheckpoint(true), deltaDocs)
    publishSidecars(spark, prefix, attrition)
  }

  /** CONTINUOUS curation: a stream of assets — (doc_id, source, text,
    * embedding ARRAY<FLOAT> nullable) — refreshes the curated corpus
    * one snapshot micro-batch at a time (the nightly-crawl cadence as
    * a stream; the state maintenance + gate are batch plans, so this
    * is the usual stream-to-batch bridge). Because each [[refresh]]
    * leaves every state table equal to a full rebuild over
    * corpus ∪ (all batches so far), the STREAMED corpus converges to
    * the one-shot refresh over the union — and a replayed micro-batch
    * is absorbed by the refresh's own idempotence, so no sink-side
    * state is needed (CuratedStreamSpec pins both). */
  def refreshStream(spark: SparkSession, dir: String, prefix: String,
      assetStream: DataFrame, buckets: Int = 8,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = assetStream.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        refresh(spark, dir, prefix,
          batch.select(col("doc_id"), col("source"), col("text")),
          batch.filter(col("embedding").isNotNull)
            .select(col("doc_id").as("vec_id"), col("embedding")),
          buckets)
      }
      .start()
  }

  /** Apply a new survivor set to the served artifact as a DIFF —
    * evict (tombstone, immediate via [[serve]]'s filter), revive
    * (un-tombstone a physically present doc re-entering via a
    * mix-rate flip), append (new survivors, text resolved from the
    * current delta first, then the streamed-texts record — an EARLIER
    * batch's doc flipping to survivor may exist nowhere else — then
    * the corpus table). Never a corpus rewrite; [[compactDocs]]
    * reclaims tombstoned bytes. */
  private def applyArtifactDelta(spark: SparkSession, dir: String,
      prefix: String, buckets: Int, survivors: DataFrame,
      deltaDocs: DataFrame): Unit = {
    val s7ids = survivors.select(col("doc_id"))
    // pin the pre-append snapshot: `adds` below anti-joins against the
    // SAME `_docs` table its appendBucketed writes to. Parquet snapshots
    // the file listing at planning, so the self-read-append happens to
    // work — but that is an implicit protocol on a table with no commit
    // log; materializing phys makes the read-before-write explicit and
    // survives a future re-listing (AQE retry, adaptive scan) unchanged
    // (the Tombstones.remove precaution).
    val phys = spark.table(s"${prefix}_docs").select(col("doc_id"))
      .localCheckpoint(true)
    val tomb = Tombstones.ids(spark, prefix)
      .select(col("id").as("doc_id")).localCheckpoint(true)
    val evict = phys.join(tomb, Seq("doc_id"), "left_anti")
      .join(s7ids, Seq("doc_id"), "left_anti")
    Tombstones.purge(spark, prefix, evict)
    val revive = tomb.join(phys, Seq("doc_id"), "left_semi")
      .join(s7ids, Seq("doc_id"), "left_semi")
    Tombstones.remove(spark, prefix, revive)
    val dText = deltaDocs.select(col("doc_id"), col("text").as("d_text"))
    val sText = BucketedTables.read(spark, s"${prefix}_texts")
      .select(col("doc_id"), col("text").as("s_text"))
    val cText = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").as("c_text"))
    val adds = survivors.join(phys, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("h"), col("n_tokens"))
      .join(dText, Seq("doc_id"), "left")
      .join(sText, Seq("doc_id"), "left")
      .join(cText, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("h"), col("n_tokens"),
        coalesce(col("d_text"), col("s_text"), col("c_text")).as("text"))
    BucketedTables.appendBucketed(adds, s"${prefix}_docs", "doc_id", buckets)
    spark.catalog.refreshTable(s"${prefix}_docs")
  }

  /** Maintenance: rewrite the docs table to one file per bucket,
    * erasing tombstoned (evicted) rows physically, and clear the
    * tombstone list — [[serve]] results identical before and after.
    * Same-JVM refreshes are quiesced per table by the
    * [[BucketedTables]] lock. */
  def compactDocs(spark: SparkSession, prefix: String,
      buckets: Int = 8): Unit = {
    BucketedTables.compact(spark, s"${prefix}_docs", "doc_id", buckets,
      df => Tombstones.filter(spark, prefix, df, "doc_id"))
    Tombstones.clear(spark, prefix)
  }

  /** SATURATION audit of the LIVE frozen cosine geometry — the
    * `dedup_cosine_pool_audit` rollup fed from the persisted
    * `_cos_bands` state (corpus + every refreshed delta) instead of a
    * fresh banding of `dir`: one row per band with the
    * saturated-bucket count, saturated member mass, and evicted share
    * in ppm UNDER THE FROZEN W. [[autoPlanesPerBand]] sizes W once at
    * build; a corpus that then GROWS past 2^W × pool capacity starts
    * silently truncating candidate generation between rebuilds (the
    * BENCH_SF1 round-15 recall inversion) — this is the periodic
    * re-check that makes that visible on the live state, and
    * [[graft.streaming.GeometrySaturationMonitor]] turns it into the
    * breach-sustain-clear alert the rebuild schedule watches. Narrow
    * state only (band/code/vec_id — no vectors, no text), so it runs
    * per maintenance tick. */
  def geometryAudit(spark: SparkSession, prefix: String): DataFrame =
    DedupQueries.cosinePoolAuditFromBands(
      BucketedTables.read(spark, s"${prefix}_cos_bands"))

  /** Consumer-side handoff gate: re-derive the checksum from the
    * stored rows and compare to the producer's published one. Returns
    * (tbl, n_rows, checksum, n_rows_stored, checksum_stored, ok) —
    * one row; `ok = false` means the artifact was corrupted or
    * truncated after publication (or a rebuild is mid-publish — the
    * documented fail-closed window) and must not be trained on. An
    * integrity check only: the order-free XOR of a truncated md5 is
    * not cryptographic, so deliberate tampering is out of scope. */
  def verifyHandoff(spark: SparkSession, prefix: String): DataFrame =
    checksumOf(serve(spark, prefix))
      .join(spark.table(s"${prefix}_checksums")
        .select(col("tbl"), col("n_rows").as("n_rows_stored"),
          col("checksum").as("checksum_stored")), "tbl")
      .withColumn("ok",
        col("n_rows") === col("n_rows_stored") &&
          col("checksum") === col("checksum_stored"))
}
