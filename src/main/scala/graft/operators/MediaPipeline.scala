package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed multimodal-asset pipeline: media as opaque bytes + metadata,
  * processed in partition-sized batches.
  *
  * This is the Scala analog of a `mapInPandas` decode stage: the
  * engine-side contract (schema, partitioning, batch iteration) is
  * real; only [[MediaPipeline.decodeBatch]]'s codec internals are a
  * deterministic stand-in, because no image/audio libraries exist in
  * this environment. A real deployment swaps `fakeProbe` for e.g. a
  * JNI or javax.imageio probe without touching the pipeline shape.
  *
  * Scale notes: decode is the expensive stage, so it runs
  * `mapPartitions` (one codec context per partition, batched I/O, no
  * per-row setup) after an explicit `repartition(n)` chosen so one
  * partition's assets fit executor memory. The binary column is never
  * shuffled post-decode — only extracted features flow onward.
  */
object MediaPipeline {

  /** An undecoded asset: opaque payload + source metadata. */
  final case class MediaAsset(
      assetId: Long,
      mediaFormat: String, // "image" | "audio" | "video"
      payload: Array[Byte])

  /** Decoded, feature-extracted view (payload dropped). */
  final case class MediaFeatures(
      assetId: Long,
      mediaFormat: String,
      nBytes: Long,
      width: Int,
      height: Int,
      nFrames: Int,
      meanByte: Double,
      frameSamples: Seq[Long])

  /** Deterministic stand-in for a codec probe: "dimensions" from the
    * payload head, "frames" as fixed-stride 16-byte window hashes.
    * Replace with a real decoder in production. */
  private def fakeProbe(a: MediaAsset): MediaFeatures = {
    val n = a.payload.length
    val head = if (n > 0) (a.payload(0) & 0xff) else 0
    val frames = (0 until 4).map { i =>
      val from = math.min(i * 16, n)
      val until = math.min(from + 16, n)
      java.util.Arrays.hashCode(
        java.util.Arrays.copyOfRange(a.payload, from, until)).toLong
    }
    val mean =
      if (n == 0) 0.0
      else a.payload.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / n
    MediaFeatures(
      assetId = a.assetId,
      mediaFormat = a.mediaFormat,
      nBytes = n.toLong,
      width = 16 * (1 + head % 16),
      height = 16 * (1 + (head / 16) % 16),
      nFrames = frames.length,
      meanByte = mean,
      frameSamples = frames)
  }

  /** Batched decode: one pass per partition, codec context amortized
    * across the partition's assets. */
  def decodeBatch(assets: Dataset[MediaAsset], partitions: Int): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(partitions, col("assetId"))
      .mapPartitions { it =>
        // per-partition codec setup would go here (amortized)
        it.map(fakeProbe)
      }
  }

  /** Resize parameters computed per asset (aspect-preserving fit into
    * a target box). */
  final case class ResizedMedia(
      assetId: Long,
      mediaFormat: String,
      width: Int,
      height: Int,
      outWidth: Int,
      outHeight: Int,
      scale: Double)

  /** Resize stage: aspect-preserving fit of each decoded asset into
    * `targetW` x `targetH`. The pixel resample itself is the codec
    * stand-in (no image libs here) — what is real is the pipeline
    * contract: runs AFTER decode on the fixed-width features (the
    * payload no longer flows), pure narrow map, no shuffle. */
  def resize(features: Dataset[MediaFeatures],
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val s = math.min(targetW.toDouble / f.width, targetH.toDouble / f.height)
      ResizedMedia(
        assetId = f.assetId,
        mediaFormat = f.mediaFormat,
        width = f.width,
        height = f.height,
        outWidth = math.max(1, math.round(f.width * s).toInt),
        outHeight = math.max(1, math.round(f.height * s).toInt),
        scale = s)
    }
  }

  /** doc_id -> media format assignment, shared with
    * [[graft.queries.MultimodalQueries]] (oracle SQL mirrors it). */
  def mediaFormat(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(docId % 3 === 0, "image")
      .when(docId % 3 === 1, "audio")
      .otherwise("video")

  /** Build assets from the documents table (utf-8 payloads) — the
    * ingest shape a binary-file source (`spark.read.format
    * ("binaryFile")`) would produce. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.util.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("assetId"),
        mediaFormat(col("doc_id")).as("mediaFormat"),
        col("text").cast("binary").as("payload"))
      .as[MediaAsset]
  }
}
