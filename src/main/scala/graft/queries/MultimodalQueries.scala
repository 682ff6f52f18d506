package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Seq[(String, ((SparkSession, String) => DataFrame), String)] = Seq(
    ("mm_media_features", mediaFeatures _, mediaFeaturesSql),
    ("mm_frame_sample", frameSample _, frameSampleSql),
    ("mm_media_dedup", mediaDedup _, mediaDedupSql))
}
