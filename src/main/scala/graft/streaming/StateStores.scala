package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the streaming pipelines.
  *
  * The default `HDFSBackedStateStoreProvider` keeps every stateful
  * operator's working state in an on-heap map per store partition
  * (snapshot + delta files on the checkpoint FS). That matches the
  * reference's own design — its consumer holds the whole hourly
  * aggregate in a Python dict (consumer/consumer.py:81-98) — and is
  * fine at reference scale. At the 100 TB target the combined state
  * of the hourly aggregate, `dropDuplicatesWithinWatermark` dedup and
  * stream-stream interval joins can exceed executor heap: RocksDB
  * keeps working state off-heap/on-disk behind a bounded block cache,
  * and changelog checkpointing commits each micro-batch as an append
  * of only that batch's changes instead of a full snapshot upload —
  * the two dials that make state size independent of heap size.
  *
  * The provider class is a per-query SQL conf captured when a
  * streaming query STARTS, so one session can run different queries
  * under different providers. The on-disk state format is
  * provider-specific: a query must keep the provider it was started
  * with for the lifetime of its checkpoint (Spark validates this from
  * the checkpoint metadata and fails fast on a mismatch).
  *
  * `RocksDbStateSpec` proves the swap is semantics-free: the hourly
  * aggregate and watermark dedup produce byte-identical results under
  * both providers, and the progress events show RocksDB actually
  * engaged (rocksdb* custom metrics present).
  */
object StateStores {

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Recommended RocksDB configuration for large-state streams.
    *
    * @param maxMemoryMB per-executor cap shared by all RocksDB
    *        instances (block cache + memtables); state beyond it
    *        lives on local disk, not heap.
    */
  def rocksDbConf(maxMemoryMB: Long = 512): Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
    // commit = changelog append; full snapshots only at maintenance
    // intervals, off the commit path
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    // one bounded memory budget per executor instead of unbounded
    // per-store caches
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> maxMemoryMB.toString)

  /** Apply the RocksDB provider to a session's runtime conf — affects
    * queries started afterwards on that session only. */
  def useRocksDb(spark: SparkSession, maxMemoryMB: Long = 512): Unit =
    rocksDbConf(maxMemoryMB).foreach { case (k, v) => spark.conf.set(k, v) }
}
