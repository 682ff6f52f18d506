package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the ingest-time twin of the batch dedup
  * family (graft.queries.DedupQueries) for continuously-arriving
  * training data.
  *
  * Built on `dropDuplicatesWithinWatermark`: state holds one entry per
  * key seen within the watermark horizon, and the watermark bounds the
  * state store exactly like the reference's 24 h in-memory pruning
  * (consumer/consumer.py:376-381) bounds its aggregate dict. Duplicate
  * keys arriving within the horizon are dropped regardless of their
  * event-time skew (the "same doc re-crawled minutes later" case);
  * duplicates farther apart than the horizon pass through —
  * at 100 TB/day the horizon IS the dedup contract, since unbounded
  * exact state cannot fit anywhere.
  *
  * Scale: state is hash-partitioned by key across executors (one
  * shuffle); RocksDB-backed stores handle horizons of hours at
  * full ingest rate.
  */
object StreamDedup {

  /** Keep the first row per `keyCols` within the watermark horizon. */
  def byKey(stream: DataFrame, tsCol: String, horizon: String,
            keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Content-hash dedup for document streams: identical `textCol`
    * bytes collapse to the first arrival. Hashing before the shuffle
    * keeps state entries fixed-width (16-byte md5, not the text).
    *
    * Null-text rows bypass the dedup entirely: md5(null) is null and
    * dropDuplicates treats null keys as equal, so routing them through
    * the stateful path would silently collapse every null-text
    * document after the first into "duplicates" — data loss on schema
    * drift. They pass through unchanged instead (dedup of absent
    * content is not meaningful). */
  def byContent(stream: DataFrame, tsCol: String, horizon: String,
                textCol: String): DataFrame = {
    val hashed = stream.withColumn("__content_hash", md5(col(textCol)))
    val deduped = byKey(hashed.filter(col("__content_hash").isNotNull),
        tsCol, horizon, Seq("__content_hash"))
      .drop("__content_hash")
    deduped.unionByName(stream.filter(col(textCol).isNull))
  }
}
