package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._
import graft.util.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, deterministic stand-in "decode" /
  * feature-extract / frame-sample stages (no codec libraries in this
  * environment — see [[graft.operators.MediaPipeline]] for the typed
  * mapPartitions form where a real decoder plugs in).
  *
  * The binary payload here is the utf-8 encoding of `documents.text`
  * (all-ASCII in the testdata), which lets the DuckDB oracle compute
  * byte-level equivalents with string functions while the Spark side
  * genuinely runs on a BinaryType column (cast, length, md5, substr all
  * operate on the bytes).
  *
  * Scale: one scan, zero shuffles before the final sort; all expression
  * work codegen'd per row. At 100 TB the binary column stays unread
  * unless referenced (parquet column pruning).
  */
object MultimodalQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast(BinaryType)
    val h = h60(col("text"))
    val nBytes = length(blob).cast(LongType)
    // deterministic fake "decoded" dimensions from the content hash —
    // placeholder for a real image/audio probe
    val width = (lit(16L) * (lit(1L) + h % 64)).as("width")
    val height = (lit(16L) * (lit(1L) + shiftright(h % 4096, 6))).as("height")
    // stable 16-byte windows at fixed offsets, hashed from the raw bytes
    val frames = (0 until 4).map(i => h60(substring(blob, i * 16 + 1, 16)))
    docs(spark, dir)
      .select(
        col("doc_id"),
        graft.operators.MediaPipeline.mediaFormat(col("doc_id"))
          .as("media_format"),
        nBytes.as("n_bytes"),
        md5(blob).as("content_md5"),
        width, height,
        (nBytes.cast(DoubleType) * 8.0 / 1000.0).as("kbits"),
        // joined string, not ArrayType: the driver's pandas compare
        // cannot sort/hash ndarray cells
        concat_ws(",", frames.map(_.cast(StringType)): _*).as("frame_sigs"))
      .orderBy(col("doc_id"))
  }

  // DuckDB's blob surface in v1.0 has no length/substr/md5 overloads, so
  // the oracle computes the same values on the ASCII string (bytes ==
  // chars for this corpus).
  val mediaFeaturesSql: String = {
    val frames = (0 until 4).map { i =>
      s"CAST(${h60Sql(s"substr(text, ${i * 16 + 1}, 16)")} AS VARCHAR)"
    }.mkString(" || ',' || ")
    s"""SELECT doc_id,
       |       CASE WHEN doc_id % 3 = 0 THEN 'image'
       |            WHEN doc_id % 3 = 1 THEN 'audio'
       |            ELSE 'video' END AS media_format,
       |       CAST(length(text) AS BIGINT) AS n_bytes,
       |       md5(text) AS content_md5,
       |       16 * (1 + ${h60Sql("text")} % 64) AS width,
       |       16 * (1 + ((${h60Sql("text")} % 4096) >> 6)) AS height,
       |       CAST(length(text) AS DOUBLE) * 8.0 / 1000.0 AS kbits,
       |       ($frames) AS frame_sigs
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // mm_frame_sample: strided frame sampling -> one row per kept frame
  // ---------------------------------------------------------------------

  /** Video-style frame sampling: every other 16-byte window of the
    * payload (stride 32) becomes a sampled "frame" row with its offset
    * and content hash — the explode shape a video training pipeline
    * uses to turn N assets into N*k frame records. Per-row generate +
    * project, zero shuffles before the sort; at scale the explode
    * multiplies rows AFTER the scan prunes to (doc_id, payload), and
    * downstream stages shuffle only the fixed-width frame rows, never
    * the payload. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast(BinaryType)
    val nBytes = length(blob).cast(LongType)
    docs(spark, dir)
      .select(col("doc_id"), blob.as("payload"), nBytes.as("n_bytes"),
        (floor((nBytes - 16L) / 32L).cast(LongType) + 1L).as("n_frames"))
      .filter(col("n_bytes") >= 16L)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(1L))).as("frame_no"))
      .select(
        col("doc_id"), col("n_frames"), col("frame_no"),
        (col("frame_no") * 32L).as("offset_bytes"),
        h60(col("payload").substr((col("frame_no") * 32L + 1L).cast(IntegerType), lit(16)))
          .as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  val frameSampleSql: String =
    s"""SELECT doc_id,
       |       (length(text) - 16) // 32 + 1 AS n_frames,
       |       CAST(i AS BIGINT) AS frame_no,
       |       CAST(i * 32 AS BIGINT) AS offset_bytes,
       |       ${h60Sql("substr(text, CAST(i * 32 + 1 AS INTEGER), 16)")} AS frame_hash
       |FROM (
       |  SELECT doc_id, text,
       |         unnest(generate_series(0, (length(text) - 16) // 32)) AS i
       |  FROM documents WHERE length(text) >= 16)
       |ORDER BY doc_id, frame_no""".stripMargin
  // ^ the scalar generate_series + unnest form makes the frame count
  //   document-derived on the oracle side too (the table-function form
  //   can't take lateral column args in DuckDB 1.0) — both engines are
  //   unbounded, so no corpus shape can silently truncate the compare.

  // ---------------------------------------------------------------------
  // mm_media_dedup: content-addressed media dedup accounting
  // ---------------------------------------------------------------------

  /** Content-addressed (CAS) dedup accounting per media format: every
    * blob hashes to its md5 digest, identical payloads within a
    * modality collapse to one stored object, and the rollup reports
    * how many copies and bytes the store saves — the asset-level
    * dedup every multimodal training pipeline runs before feature
    * extraction (decode once per unique blob, not per reference).
    *
    * Dedup is scoped per (format, digest): modality stores are
    * physically separate, so identical bytes declared as image vs
    * video are distinct stored objects (documented choice).
    *
    * Scale shape: the shuffle key is the 16-byte digest — the payload
    * itself never shuffles (hashed at the scan, dropped before the
    * exchange); two cascaded aggregations (per-digest, then
    * per-format) are both map-side combinable. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast(BinaryType)
    docs(spark, dir)
      .select(
        graft.operators.MediaPipeline.mediaFormat(col("doc_id"))
          .as("media_format"),
        md5(blob).as("digest"),
        length(blob).cast(LongType).as("n_bytes"))
      .groupBy(col("media_format"), col("digest"))
      .agg(count(lit(1)).as("n_copies"),
        // identical bytes => identical length; min is exact
        min(col("n_bytes")).as("blob_bytes"))
      .groupBy(col("media_format"))
      .agg(
        sum(col("n_copies")).as("n_blobs"),
        count(lit(1)).as("n_unique"),
        (sum(col("n_copies")) - count(lit(1))).as("n_dupe_copies"),
        sum(col("n_copies") * col("blob_bytes")).as("bytes_total"),
        sum((col("n_copies") - 1L) * col("blob_bytes")).as("bytes_saved"))
      .orderBy(col("media_format"))
  }

  val mediaDedupSql: String =
    """WITH per_digest AS (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS media_format,
      |         md5(text) AS digest,
      |         CAST(count(*) AS BIGINT) AS n_copies,
      |         CAST(min(length(text)) AS BIGINT) AS blob_bytes
      |  FROM documents GROUP BY 1, 2)
      |SELECT media_format,
      |       CAST(sum(n_copies) AS BIGINT) AS n_blobs,
      |       CAST(count(*) AS BIGINT) AS n_unique,
      |       CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dupe_copies,
      |       CAST(sum(n_copies * blob_bytes) AS BIGINT) AS bytes_total,
      |       CAST(sum((n_copies - 1) * blob_bytes) AS BIGINT) AS bytes_saved
      |FROM per_digest GROUP BY media_format
      |ORDER BY media_format""".stripMargin

  // ---------------------------------------------------------------------
  // mm_perceptual_sig: tile-banded perceptual signature
  // ---------------------------------------------------------------------

  /** Perceptual-signature geometry: [[PTiles]] length-relative content
    * tiles, a [[PTileBits]]-bit SimHash per tile over width-[[PWin]]
    * stride-1 byte windows, concatenated into one 60-bit signature.
    * Interpolated into BOTH engines.
    *
    * Why tiles (the pHash block idea), not one flat SimHash: a flat
    * vote's Hamming distance is proportional to the FRACTION of
    * content changed, so no fixed banding radius survives a realistic
    * re-encode (measured: a 2-byte edit on a 400-byte payload lands
    * at Hamming 4-12 of 60 — past any pigeonhole-banded radius). A
    * locally-confined edit instead leaves every untouched tile's
    * 15-bit signature BIT-IDENTICAL, so candidacy via exact
    * tile-signature equality is guaranteed by construction for any
    * edit confined to ≤ [[PTiles]]-1 tiles — recall comes from the
    * geometry, not from a probabilistic S-curve. */
  private val PTiles = 4
  private val PTileBits = 15
  private val PWin = 8

  /** Window stride: the md5 window hashing is the signature's
    * dominant cost (~L hashes per asset at stride 1), and stride is
    * the dial — halving window count costs vote margin (√2 on the
    * majority margins) but leaves the TILE-IDENTITY guarantee
    * untouched: windows are position-based, so an untouched tile's
    * window set is bit-identical at any stride. Measured at stride 2:
    * planted twin ≤6 bits, unrelated ≥23 — same separation, half the
    * hashing. */
  private val PStride = 2

  /** Verify bound: keep candidate pairs whose full signatures differ
    * in at most one tile's worth of bits — "same asset up to a
    * region-confined re-encode". Measured separation on the corpus:
    * exact copies 0, near-dup twins ≤12, unrelated assets ~22-30. */
  private val PRadius = 15

  /** Window hashes of tile q: window starts i ∈ [⌊qL/4⌋,
    * min(⌊(q+1)L/4⌋-1, L-8)], full-width windows only; empty array
    * for tiles of too-short payloads (signature contribution 0). */
  private def tileWins(text: Column, q: Int): Column = {
    val L = length(text)
    val lo = floor(L.cast(LongType) * q / lit(PTiles.toDouble)).cast(LongType)
    val hi = least(
      floor(L.cast(LongType) * (q + 1) / lit(PTiles.toDouble)).cast(LongType) - 1L,
      (L - PWin).cast(LongType))
    when(L >= PWin && hi >= lo,
      transform(sequence(lo, hi, lit(PStride.toLong)),
        i => h60(text.substr((i + 1L).cast(IntegerType), lit(PWin)))))
      .otherwise(array().cast(ArrayType(LongType)))
  }

  private def tileWinsSql(t: String, q: Int): String = {
    val lo = s"(length($t)*$q)//$PTiles"
    val hi = s"least((length($t)*${q + 1})//$PTiles - 1, length($t)-$PWin)"
    s"""CASE WHEN length($t) >= $PWin AND $hi >= $lo THEN
       | list_transform(generate_series($lo, $hi, $PStride),
       |   i -> ${h60Sql(s"substr($t, CAST(i+1 AS INTEGER), $PWin)")})
       | ELSE CAST([] AS BIGINT[]) END""".stripMargin.replaceAll("\n\\s*", " ")
  }

  /** 15-bit majority-vote SimHash of an (already-projected) window
    * array column — per-row HOFs, zero shuffles. PERF: pass an array
    * ATTRIBUTE, never the tileWins expression inline (Catalyst
    * substitutes the argument into all 30 bit references — the
    * shingleHashesOfToks lesson). */
  private def tileSim(wins: Column): Column =
    (0 until PTileBits).map { b =>
      when(size(filter(wins, w => shiftright(w, b) % 2 === 1)) * 2
        > size(wins), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def tileSimSql(winsExpr: String): String =
    s"""list_sum(list_transform(generate_series(0, ${PTileBits - 1}),
       |  b -> CASE WHEN 2 * len(list_filter($winsExpr, s -> (s >> b) & 1 = 1)) > len($winsExpr)
       |            THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))"""
      .stripMargin.replaceAll("\n\\s*", " ")

  private def psigSql(t: String): String =
    (0 until PTiles)
      .map(q => s"(${tileSimSql(tileWinsSql(t, q))} << ${PTileBits * q})")
      .mkString("(", " + ", ")")

  /** (doc_id, media_format, digest, psig) for an arbitrary (doc_id,
    * text) frame — one scan, per-row expression work only; the
    * signature grain every perceptual query (and the planted spec)
    * shares. The signature runs through the NATIVE codegen'd kernel
    * ([[graft.functions.PerceptualExpressions]] — the HOF form below
    * is interpreted per window per bit and was the dominant cost of
    * every perceptual query); MediaNearDupSpec proves the two
    * bit-identical row-for-row, and the oracle SQL mirrors the HOF
    * form. */
  private[graft] def perceptualSigOf(d: DataFrame): DataFrame = {
    graft.functions.PerceptualExpressions.ensureRegistered(d.sparkSession)
    d.select(col("doc_id"),
      graft.operators.MediaPipeline.mediaFormat(col("doc_id"))
        .as("media_format"),
      md5(col("text").cast(BinaryType)).as("digest"),
      call_function("graft_psig", col("text")).as("psig"))
  }

  /** The built-in-HOF twin of [[perceptualSigOf]] — the definition the
    * DuckDB oracle mirrors term-for-term; kept as the cross-impl
    * reference the spec checks the native kernel against. */
  private[graft] def perceptualSigHofOf(d: DataFrame): DataFrame =
    d.select(Seq(col("doc_id"),
        graft.operators.MediaPipeline.mediaFormat(col("doc_id"))
          .as("media_format"),
        md5(col("text").cast(BinaryType)).as("digest")) ++
        (0 until PTiles).map(q => tileWins(col("text"), q).as(s"w$q")): _*)
      .select(col("doc_id"), col("media_format"), col("digest"),
        (0 until PTiles)
          .map(q => (tileSim(col(s"w$q")) * lit(1L << (PTileBits * q))))
          .reduce(_ + _).as("psig"))

  def perceptualSig(spark: SparkSession, dir: String): DataFrame =
    perceptualSigOf(docs(spark, dir))
      .select(col("doc_id"), col("media_format"), col("psig"))
      .orderBy(col("doc_id"))

  val perceptualSigSql: String =
    s"""SELECT doc_id,
       |       CASE WHEN doc_id % 3 = 0 THEN 'image'
       |            WHEN doc_id % 3 = 1 THEN 'audio'
       |            ELSE 'video' END AS media_format,
       |       CAST(${psigSql("text")} AS BIGINT) AS psig
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // mm_near_dup_pairs: perceptual near-dup pairs (tile-banded)
  // ---------------------------------------------------------------------

  /** The signature frame exploded to (…, tile_id, tile) rows — the
    * banding grain; all input columns pass through. Modality-scoped
    * like the CAS table: tiles only ever join within a format. */
  private def tileRows(sig: DataFrame): DataFrame =
    sig.select(sig.columns.map(col) :+
        explode(array((0 until PTiles).map { q =>
          struct(lit(q).as("tile_id"),
            (shiftright(col("psig"), PTileBits * q) % (1L << PTileBits))
              .as("tile"))
        }: _*)).as("c"): _*)
      .select(sig.columns.map(col) ++
        Seq(col("c.tile_id"), col("c.tile")): _*)

  /** Perceptual near-dup pairs: candidates share a (format, tile_id,
    * tile) cell — an equi-join on the tile key, never an asset pair
    * loop — verified by full-signature Hamming ≤ [[PRadius]].
    * `same_bytes` marks the pairs the exact CAS table
    * ([[mediaDedup]]) already collapses; false rows are the
    * perceptual tier's value-add (re-encoded copies with different
    * bytes). Unsorted core shared with the decontamination query. */
  private def nearDupPairsBody(spark: SparkSession, dir: String): DataFrame = {
    val sig = perceptualSigOf(docs(spark, dir)).persist()
    sig.count()
    val t = tileRows(sig)
    Tables.released(
      t.as("a").join(t.as("b"),
          col("a.media_format") === col("b.media_format") &&
            col("a.tile_id") === col("b.tile_id") &&
            col("a.tile") === col("b.tile") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.media_format").as("media_format"),
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.psig").bitwiseXOR(col("b.psig")))
            .cast(LongType).as("hamming"),
          (col("a.digest") === col("b.digest")).as("same_bytes"))
        .distinct()
        .filter(col("hamming") <= PRadius)
        .orderBy(col("media_format"), col("doc_a"), col("doc_b")),
      sig)
  }

  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    nearDupPairsBody(spark, dir)

  /** CTE chain ending in `pairs` — shared by the pairs and accounting
    * oracles. */
  private val nearDupCtes: String = {
    val tileRowsSql = (0 until PTiles)
      .map(q => s"SELECT doc_id, media_format, digest, psig, $q AS tile_id, " +
        s"(psig >> ${PTileBits * q}) % ${1L << PTileBits} AS tile FROM sig")
      .mkString("\n  UNION ALL\n  ")
    s"""sig AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_format,
       |         md5(text) AS digest,
       |         CAST(${psigSql("text")} AS BIGINT) AS psig
       |  FROM documents),
       |tiles AS (
       |  $tileRowsSql),
       |pairs AS (
       |  SELECT DISTINCT a.media_format AS media_format,
       |         a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         CAST(bit_count(xor(a.psig, b.psig)) AS BIGINT) AS hamming,
       |         a.digest = b.digest AS same_bytes
       |  FROM tiles a JOIN tiles b
       |    ON a.media_format = b.media_format AND a.tile_id = b.tile_id
       |   AND a.tile = b.tile AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.psig, b.psig)) <= $PRadius)""".stripMargin
  }

  val nearDupPairsSql: String =
    s"""WITH $nearDupCtes
       |SELECT media_format, doc_a, doc_b, hamming, same_bytes FROM pairs
       |ORDER BY media_format, doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // mm_near_dedup: perceptual-vs-CAS dedup accounting
  // ---------------------------------------------------------------------

  /** What the perceptual tier adds over exact CAS, per modality:
    * n_pairs_beyond_cas counts verified near-dup pairs whose payload
    * bytes DIFFER (re-encoded copies — invisible to
    * [[mediaDedup]]'s digest collapse), n_docs_hit the distinct
    * assets in any near-dup relation, share_bp that as a share of the
    * modality. Rollup on the bounded pair grain. */
  def nearDedup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairsBody(spark, dir)
    val fmtSizes = docs(spark, dir)
      .select(graft.operators.MediaPipeline.mediaFormat(col("doc_id"))
        .as("media_format"))
      .groupBy(col("media_format")).agg(count(lit(1)).as("n_assets"))
    val perFmt = pairs.groupBy(col("media_format"))
      .agg(count(lit(1)).as("n_pairs"),
        Tables.countIf(!col("same_bytes")).as("n_pairs_beyond_cas"))
    val docsHit = pairs
      .select(col("media_format"), col("doc_a").as("d"))
      .unionByName(pairs.select(col("media_format"), col("doc_b").as("d")))
      .groupBy(col("media_format"))
      .agg(count_distinct(col("d")).as("n_docs_hit"))
    fmtSizes
      .join(perFmt, Seq("media_format"), "left")
      .join(docsHit, Seq("media_format"), "left")
      .select(col("media_format"), col("n_assets"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_pairs_beyond_cas"), lit(0L)).as("n_pairs_beyond_cas"),
        coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
        floor(coalesce(col("n_docs_hit"), lit(0L)) * lit(10000L) /
          col("n_assets")).cast(LongType).as("share_bp"))
      .orderBy(col("media_format"))
  }

  val nearDedupSql: String =
    s"""WITH $nearDupCtes,
       |fmt AS (
       |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_format,
       |         CAST(count(*) AS BIGINT) AS n_assets
       |  FROM documents GROUP BY 1),
       |per_fmt AS (
       |  SELECT media_format, CAST(count(*) AS BIGINT) AS n_pairs,
       |         CAST(COALESCE(count(CASE WHEN NOT same_bytes THEN 1 END), 0)
       |           AS BIGINT) AS n_pairs_beyond_cas
       |  FROM pairs GROUP BY 1),
       |docs_hit AS (
       |  SELECT media_format, CAST(count(DISTINCT d) AS BIGINT) AS n_docs_hit
       |  FROM (
       |    SELECT media_format, doc_a AS d FROM pairs
       |    UNION ALL
       |    SELECT media_format, doc_b AS d FROM pairs)
       |  GROUP BY 1)
       |SELECT fmt.media_format, n_assets,
       |       COALESCE(n_pairs, 0) AS n_pairs,
       |       COALESCE(n_pairs_beyond_cas, 0) AS n_pairs_beyond_cas,
       |       COALESCE(n_docs_hit, 0) AS n_docs_hit,
       |       CAST(floor(COALESCE(n_docs_hit, 0) * 10000 / n_assets)
       |         AS BIGINT) AS share_bp
       |FROM fmt
       |LEFT JOIN per_fmt USING (media_format)
       |LEFT JOIN docs_hit USING (media_format)
       |ORDER BY media_format""".stripMargin

  // ---------------------------------------------------------------------
  // mm_delta_accounting: media ingest accounting
  // ---------------------------------------------------------------------

  /** The media twin of `dedup_delta_accounting`: per modality of the
    * NEW assets, how much of today's snapshot is already in the store
    * perceptually (n_dup_vs_corpus), self-duplicated within the
    * snapshot (n_dup_in_delta), and genuinely new — the keep/drop
    * table for the media append. Rollup over the delta-pair grain. */
  def deltaAccounting(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val pairs = mediaDeltaPairsCore(
      tileRows(perceptualSigOf(d.filter(!(col("doc_id") % 5 === 3)))),
      d.filter(col("doc_id") % 5 === 3))
    val hits = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("other"))
      .unionByName(
        pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("other")))
      .filter(col("doc_id") % 5 === 3)
      .groupBy(col("doc_id"))
      .agg(
        max((col("other") % 5 =!= 3).cast(LongType)).as("hit_corpus"),
        max((col("other") % 5 === 3).cast(LongType)).as("hit_delta"))
    Tables.released(
      d.filter(col("doc_id") % 5 === 3)
        .select(col("doc_id"),
          graft.operators.MediaPipeline.mediaFormat(col("doc_id"))
            .as("media_format"))
        .join(hits, Seq("doc_id"), "left")
        .groupBy(col("media_format"))
        .agg(
          count(lit(1)).as("n_new_assets"),
          coalesce(sum(col("hit_corpus")), lit(0L)).as("n_dup_vs_corpus"),
          coalesce(sum(col("hit_delta")), lit(0L)).as("n_dup_in_delta"),
          coalesce(sum(greatest(col("hit_corpus"), col("hit_delta"))), lit(0L))
            .as("n_dup_any"))
        .select(col("media_format"), col("n_new_assets"),
          col("n_dup_vs_corpus"), col("n_dup_in_delta"), col("n_dup_any"),
          (col("n_new_assets") - col("n_dup_any")).as("n_unique_new"),
          floor(col("n_dup_any") * lit(10000L) / col("n_new_assets"))
            .cast(LongType).as("dup_share_bp"))
        .orderBy(col("media_format")))
  }

  val deltaAccountingSql: String =
    s"""WITH $nearDupCtes,
       |dpairs AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  WHERE doc_a % 5 = 3 OR doc_b % 5 = 3),
       |hits0 AS (
       |  SELECT doc_a AS doc_id, doc_b AS other FROM dpairs
       |  UNION ALL
       |  SELECT doc_b AS doc_id, doc_a AS other FROM dpairs),
       |hits AS (
       |  SELECT doc_id,
       |         max(CASE WHEN other % 5 != 3 THEN 1 ELSE 0 END) AS hit_corpus,
       |         max(CASE WHEN other % 5 = 3 THEN 1 ELSE 0 END) AS hit_delta
       |  FROM hits0 WHERE doc_id % 5 = 3 GROUP BY 1),
       |new_assets AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN 'image'
       |              WHEN doc_id % 3 = 1 THEN 'audio'
       |              ELSE 'video' END AS media_format
       |  FROM documents WHERE doc_id % 5 = 3)
       |SELECT media_format,
       |       CAST(count(*) AS BIGINT) AS n_new_assets,
       |       CAST(COALESCE(sum(hit_corpus), 0) AS BIGINT) AS n_dup_vs_corpus,
       |       CAST(COALESCE(sum(hit_delta), 0) AS BIGINT) AS n_dup_in_delta,
       |       CAST(COALESCE(sum(greatest(hit_corpus, hit_delta)), 0) AS BIGINT)
       |         AS n_dup_any,
       |       CAST(count(*) - COALESCE(sum(greatest(hit_corpus, hit_delta)), 0)
       |         AS BIGINT) AS n_unique_new,
       |       CAST(floor(COALESCE(sum(greatest(hit_corpus, hit_delta)), 0)
       |         * 10000 / count(*)) AS BIGINT) AS dup_share_bp
       |FROM new_assets LEFT JOIN hits USING (doc_id)
       |GROUP BY media_format
       |ORDER BY media_format""".stripMargin

  // ---------------------------------------------------------------------
  // mm_crossmodal_pairs: caption-vs-media near-dup agreement
  // ---------------------------------------------------------------------

  /** WHICH modality duplicates: for same-modality asset pairs, the
    * text near-dup verdict (banded MinHash, `dedup_minhash_pairs`)
    * full-outer-joined with the perceptual media verdict
    * ([[nearDupPairs]]) on the pair key —
    *  - `both`: true duplicate (caption AND bytes near-identical);
    *  - `text_only`: caption reuse over different media (stolen alt
    *    text, templated captions) — dropping the media as "dup" here
    *    would be wrong;
    *  - `media_only`: re-captioned copies of the same asset — the
    *    pair text dedup provably cannot see.
    * The table a multimodal curation run reads before deciding which
    * dedup verdict wins per pair. Text pairs are restricted to
    * same-format (doc_id % 3) pairs so both verdicts rate the SAME
    * population.
    *
    * Scale shape: both inputs are the already-banded pair queries
    * (never all-pairs); the fusion is a full-outer equi-join on the
    * bounded pair grain. */
  def crossmodalPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = DedupQueries.minhashPairs(spark, dir)
      .filter(col("doc_a") % 3 === col("doc_b") % 3)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val m = nearDupPairsBody(spark, dir)
      .select(col("media_format"), col("doc_a"), col("doc_b"),
        col("hamming"), col("same_bytes"))
    t.join(m, Seq("doc_a", "doc_b"), "full_outer")
      .select(
        coalesce(col("media_format"),
          graft.operators.MediaPipeline.mediaFormat(col("doc_a")))
          .as("media_format"),
        col("doc_a"), col("doc_b"),
        when(col("jaccard").isNotNull && col("hamming").isNotNull, "both")
          .when(col("jaccard").isNotNull, "text_only")
          .otherwise("media_only").as("kind"),
        col("jaccard"), col("hamming"), col("same_bytes"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val crossmodalPairsSql: String =
    s"""WITH tpairs AS (${DedupQueries.minhashPairsSql}),
       |mpairs AS ($nearDupPairsSql),
       |t AS (
       |  SELECT doc_a, doc_b, jaccard FROM tpairs
       |  WHERE doc_a % 3 = doc_b % 3),
       |m AS (
       |  SELECT media_format, doc_a, doc_b, hamming, same_bytes
       |  FROM mpairs),
       |j AS (
       |  SELECT doc_a, doc_b, t.jaccard, m.media_format, m.hamming,
       |         m.same_bytes
       |  FROM t FULL JOIN m USING (doc_a, doc_b))
       |SELECT COALESCE(media_format,
       |         CASE WHEN doc_a % 3 = 0 THEN 'image'
       |              WHEN doc_a % 3 = 1 THEN 'audio'
       |              ELSE 'video' END) AS media_format,
       |       doc_a, doc_b,
       |       CASE WHEN jaccard IS NOT NULL AND hamming IS NOT NULL THEN 'both'
       |            WHEN jaccard IS NOT NULL THEN 'text_only'
       |            ELSE 'media_only' END AS kind,
       |       jaccard, hamming, same_bytes
       |FROM j
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // mm_delta_pairs: incremental perceptual dedup at ingest
  // ---------------------------------------------------------------------

  /** Perceptual near-dup pairs TOUCHING a delta of new media — the
    * media twin of [[DedupQueries.deltaPairsCore]]: candidates come
    * from the DELTA's tile rows only (delta × (corpus ∪ delta)
    * equi-join on the tile cell — never corpus × corpus), verified at
    * the same Hamming bound. A doc's tile signature depends on
    * nothing but its own bytes and tile-cell candidacy is symmetric
    * per pair, so the result equals [[nearDupPairs]] restricted to
    * pairs with ≥1 delta member (MediaIndexLayoutSpec, both
    * directions). `corpusTiles` is tile-exploded signature rows —
    * computed on the fly here, read from the persisted bucketed table
    * by [[graft.sources.MediaIndexLayout.dedupDelta]]; anti-joined
    * against the delta's ids first so a REPLAYED delta dedups
    * identically. */
  /** Tile-exploded signature rows of an arbitrary (doc_id, text)
    * frame — the persisted grain of
    * [[graft.sources.MediaIndexLayout]]. */
  private[graft] def tileRowsOf(d: DataFrame): DataFrame =
    tileRows(perceptualSigOf(d))

  private[graft] def mediaDeltaPairsCore(corpusTiles: DataFrame,
      deltaDocs: DataFrame): DataFrame = {
    val ids = deltaDocs.select(col("doc_id")).distinct()
    val tD = tileRows(
      perceptualSigOf(deltaDocs.dropDuplicates("doc_id"))
        .localCheckpoint(true))
    mediaDeltaPairsCoreFrom(corpusTiles, ids, tD)
  }

  /** [[mediaDeltaPairsCore]] with the delta's signature/tile pass
    * PRECOMPUTED — the composed snapshot seam
    * ([[graft.sources.IngestGate.ingestAndCurate]]): the `graft_psig`
    * kernel is the media family's dominant per-doc cost, so a bounded
    * snapshot pays it once across the gate check AND the tile-index
    * filing. `ids` is the delta's distinct doc_ids (materialized);
    * `tD` its tile rows — materialized for deltas within
    * [[graft.sources.IngestGate.ComposeCacheMaxBytes]], else a
    * lazy-but-deterministic recomputation from the checkpointed doc
    * frame (same rows either way). */
  private[graft] def mediaDeltaPairsCoreFrom(corpusTiles: DataFrame,
      ids: DataFrame, tD: DataFrame): DataFrame = {
    val tAll = corpusTiles.join(broadcast(ids), Seq("doc_id"), "left_anti")
      .unionByName(tD)
    tD.as("a").join(tAll.as("b"),
        col("a.media_format") === col("b.media_format") &&
          col("a.tile_id") === col("b.tile_id") &&
          col("a.tile") === col("b.tile") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.media_format").as("media_format"),
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        bit_count(col("a.psig").bitwiseXOR(col("b.psig")))
          .cast(LongType).as("hamming"),
        (col("a.digest") === col("b.digest")).as("same_bytes"))
      .distinct()
      .filter(col("hamming") <= PRadius)
  }

  /** Registered incremental query: the dedup family's snapshot split
    * (doc_id % 5 == 3, shared with `dedup_delta_pairs` so the two
    * ingest operators describe the SAME snapshot) run through
    * [[mediaDeltaPairsCore]]. Oracle: the full-corpus pairs CTE
    * restricted to delta members. */
  def deltaPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val corpusTiles = tileRows(
      perceptualSigOf(d.filter(!(col("doc_id") % 5 === 3))))
    Tables.released(
      mediaDeltaPairsCore(corpusTiles, d.filter(col("doc_id") % 5 === 3))
        .orderBy(col("media_format"), col("doc_a"), col("doc_b")))
  }

  val deltaPairsSql: String =
    s"""WITH $nearDupCtes
       |SELECT media_format, doc_a, doc_b, hamming, same_bytes FROM pairs
       |WHERE doc_a % 5 = 3 OR doc_b % 5 = 3
       |ORDER BY media_format, doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // mm_decontaminate: cross-modal eval decontamination (perceptual)
  // ---------------------------------------------------------------------

  /** The held-out eval asset set: every 10th asset by id — eval media
    * sets are curated ID LISTS, not content-hash splits (unlike
    * `dedup_contamination`'s text split), and an id predicate keeps
    * the registered query deterministic in both engines. */
  private val isEvalAsset: Column = col("doc_id") % 10 === 0
  private val isEvalAssetSql: String = "doc_id % 10 = 0"

  /** Train assets that are perceptual near-dups of a HELD-OUT eval
    * asset — the media twin of `dedup_contamination`: an eval image
    * that leaked into training as a re-encoded copy (different bytes,
    * so digest matching misses it) is exactly what this catches. Per
    * contaminated train asset, the closest eval match (min Hamming,
    * tie on eval id). Candidates ride the same (format, tile_id,
    * tile) equi-join as [[nearDupPairs]] — eval tiles × train tiles,
    * never an asset pair loop; at 100 TB the eval side is the tiny
    * one, so the join broadcasts it. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    mediaContamImpl(spark, dir, bloomPrune = false)

  /** [[decontaminate]] with a Bloom runtime filter under the TRAIN
    * side: the corpus-sized train tile rows are pre-filtered map-side
    * against a Bloom sketch of the (format, tile_id, tile) keys the
    * eval set actually holds — only might-match rows ride the join,
    * the `dedup_contamination_bloom` discipline applied to media.
    * False positives are harmless (the equi-join is exact), false
    * negatives impossible — bit-identical output, same oracle. */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame =
    mediaContamImpl(spark, dir, bloomPrune = true)

  /** One int64 key per tile row for the Bloom probe: format and
    * tile_id in the high bits, the 15-bit tile signature low. */
  private def tileKey: Column =
    ((col("doc_id") % 3) * PTiles + col("tile_id")) * (1L << PTileBits) +
      col("tile")

  private def mediaContamImpl(spark: SparkSession, dir: String,
      bloomPrune: Boolean): DataFrame = {
    val sig = perceptualSigOf(docs(spark, dir)).persist()
    sig.count()
    val t = tileRows(sig)
    val eval = t.filter(isEvalAsset)
    val trainSide = {
      val base = t.filter(!isEvalAsset)
      if (!bloomPrune) base
      else {
        import graft.functions.SketchExpressions
        SketchExpressions.ensureRegistered(spark)
        val evalKeys = eval.select(tileKey.as("k"))
        val n = math.max(evalKeys
          .agg(approx_count_distinct(col("k")).as("nd"))
          .head().getLong(0), 1024L)
        val bloomBytes = SketchExpressions.buildLongBloom(
          evalKeys, "k", n, 0.03)
        base.filter(call_function("graft_bloom_mc",
          lit(bloomBytes), tileKey))
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("train_doc"))
      .orderBy(col("hamming"), col("eval_doc"))
    Tables.released(
      eval.as("e").join(trainSide.as("t"),
          col("e.media_format") === col("t.media_format") &&
            col("e.tile_id") === col("t.tile_id") &&
            col("e.tile") === col("t.tile"))
        .select(col("t.media_format").as("media_format"),
          col("t.doc_id").as("train_doc"), col("e.doc_id").as("eval_doc"),
          bit_count(col("t.psig").bitwiseXOR(col("e.psig")))
            .cast(LongType).as("hamming"))
        .distinct()
        .filter(col("hamming") <= PRadius)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("media_format"), col("train_doc"), col("eval_doc"),
          col("hamming"))
        .orderBy(col("train_doc")),
      sig)
  }

  val decontaminateSql: String =
    s"""WITH $nearDupCtes,
       |cand AS (
       |  SELECT DISTINCT t.media_format AS media_format,
       |         t.doc_id AS train_doc, e.doc_id AS eval_doc,
       |         CAST(bit_count(xor(t.psig, e.psig)) AS BIGINT) AS hamming
       |  FROM tiles e JOIN tiles t
       |    ON e.media_format = t.media_format AND e.tile_id = t.tile_id
       |   AND e.tile = t.tile
       |  WHERE e.$isEvalAssetSql AND NOT t.$isEvalAssetSql
       |    AND bit_count(xor(t.psig, e.psig)) <= $PRadius),
       |ranked AS (
       |  SELECT media_format, train_doc, eval_doc, hamming,
       |         row_number() OVER (PARTITION BY train_doc
       |                            ORDER BY hamming, eval_doc) AS rn
       |  FROM cand)
       |SELECT media_format, train_doc, eval_doc, hamming
       |FROM ranked WHERE rn = 1
       |ORDER BY train_doc""".stripMargin

  // ---------------------------------------------------------------------
  // mm_ingest_accounting: ONE keep/drop table for the whole snapshot —
  // text ⊗ perceptual ⊗ semantic verdicts per new asset
  // ---------------------------------------------------------------------

  /** The UNIFIED snapshot ingest accounting: text (banded MinHash),
    * media (perceptual tiles), and semantic (corpus-frozen IVF-PQ at
    * the SemDeDup cosine floor) delta checks share one snapshot split
    * (doc_id % 5 == 3, vec_id == doc_id for the vector tier), and this
    * operator folds all three into one per-source keep/drop rollup —
    * the table an ingest run reads INSTEAD of reconciling
    * `dedup_delta_accounting`, `mm_delta_accounting`, and
    * `sem_delta_accounting` by hand. The text⊗media crossmodal verdict
    * (`mm_crossmodal_pairs`' both / text_only / media_only) lands as
    * counts; keep = duplicate in NO modality.
    *
    * The deployment path is [[graft.sources.IngestGate]] — one
    * micro-batch through all three PERSISTED indexes, spec-pinned to
    * this query's verdicts; this registered form recomputes the three
    * checks online so the DuckDB oracle can hash-check the whole
    * composite. Scale shape: the three delta generators unchanged
    * (each banded/probed, never all-pairs) + doc_id-grain flag joins. */
  def ingestAccounting(spark: SparkSession, dir: String): DataFrame = {
    val deltaP = col("doc_id") % 5 === 3
    def hitsOf(pairs: DataFrame, flag: String): DataFrame =
      pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id")))
        .filter(col("doc_id") % 5 === 3).distinct()
        .withColumn(flag, lit(1L))
    val tHits = hitsOf(DedupQueries.deltaPairs(spark, dir), "text_dup")
    val mHits = hitsOf(deltaPairs(spark, dir), "media_dup")
    val sHits = SimilarityQueries.semDeltaPairs(spark, dir)
      .filter(col("cosine") >= SimilarityQueries.SemMinCosFloor)
      .select(col("q_id").as("doc_id")).distinct()
      .withColumn("sem_dup", lit(1L))
    docs(spark, dir).filter(deltaP)
      .select(col("doc_id"), col("source"))
      .join(tHits, Seq("doc_id"), "left")
      .join(mHits, Seq("doc_id"), "left")
      .join(sHits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("text_dup", "media_dup", "sem_dup"))
      .groupBy(col("source"))
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
        sum(when(col("text_dup") === 0L && col("media_dup") === 0L &&
          col("sem_dup") === 0L, 1L).otherwise(0L)).as("n_keep"))
      .orderBy(col("source"))
  }

  val ingestAccountingSql: String =
    s"""WITH tpairs AS (
       |  SELECT doc_a, doc_b FROM (${DedupQueries.deltaPairsSql})),
       |mpairs AS (
       |  SELECT doc_a, doc_b FROM ($deltaPairsSql)),
       |spairs AS (
       |  SELECT q_id, cosine FROM (${SimilarityQueries.semPairsSql})),
       |t_hits AS (
       |  SELECT DISTINCT doc_id, 1 AS text_dup FROM (
       |    SELECT doc_a AS doc_id FROM tpairs
       |    UNION ALL SELECT doc_b AS doc_id FROM tpairs)
       |  WHERE doc_id % 5 = 3),
       |m_hits AS (
       |  SELECT DISTINCT doc_id, 1 AS media_dup FROM (
       |    SELECT doc_a AS doc_id FROM mpairs
       |    UNION ALL SELECT doc_b AS doc_id FROM mpairs)
       |  WHERE doc_id % 5 = 3),
       |s_hits AS (
       |  SELECT DISTINCT q_id AS doc_id, 1 AS sem_dup FROM spairs
       |  WHERE cosine >= 0.4),
       |flags AS (
       |  SELECT n.doc_id, n.source,
       |         COALESCE(text_dup, 0) AS t, COALESCE(media_dup, 0) AS m,
       |         COALESCE(sem_dup, 0) AS s
       |  FROM (SELECT doc_id, source FROM documents WHERE doc_id % 5 = 3) n
       |  LEFT JOIN t_hits USING (doc_id)
       |  LEFT JOIN m_hits USING (doc_id)
       |  LEFT JOIN s_hits USING (doc_id))
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_new,
       |       CAST(sum(t) AS BIGINT) AS n_text_dup,
       |       CAST(sum(m) AS BIGINT) AS n_media_dup,
       |       CAST(sum(s) AS BIGINT) AS n_sem_dup,
       |       CAST(sum(t * m) AS BIGINT) AS n_both_tm,
       |       CAST(sum(t * (1 - m)) AS BIGINT) AS n_text_only,
       |       CAST(sum((1 - t) * m) AS BIGINT) AS n_media_only,
       |       CAST(sum(CASE WHEN t = 0 AND m = 0 AND s = 0
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
       |FROM flags
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame), String)] = Seq(
    ("mm_media_features", mediaFeatures _, mediaFeaturesSql),
    ("mm_frame_sample", frameSample _, frameSampleSql),
    ("mm_media_dedup", mediaDedup _, mediaDedupSql),
    ("mm_perceptual_sig", perceptualSig _, perceptualSigSql),
    ("mm_near_dup_pairs", nearDupPairs _, nearDupPairsSql),
    ("mm_delta_pairs", deltaPairs _, deltaPairsSql),
    ("mm_delta_accounting", deltaAccounting _, deltaAccountingSql),
    ("mm_ingest_accounting", ingestAccounting _, ingestAccountingSql),
    ("mm_crossmodal_pairs", crossmodalPairs _, crossmodalPairsSql),
    ("mm_near_dedup", nearDedup _, nearDedupSql),
    ("mm_decontaminate", decontaminate _, decontaminateSql),
    // bloom prune is performance-transparent: same exact oracle
    ("mm_decontaminate_bloom", decontaminateBloom _, decontaminateSql))
}
