package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Deletion lifecycle for the persisted index layouts — the missing
  * half of `util_gdpr_purge`'s accounting: the purge that reaches the
  * SERVING indexes, not just the fact tables.
  *
  * Plain-parquet bucketed tables cannot delete in place, so deletes
  * are TOMBSTONES: `<prefix>_tombstones` (id) is a small managed
  * table; every serve path anti-joins it out (the id list is
  * regulator-bounded — the gdprPurge broadcast argument — so the
  * filter is a broadcast hash anti-join under the probe, never an
  * index-side shuffle), and the next compaction pass rewrites the
  * index without the tombstoned rows and clears the list — at which
  * point the data is physically gone and the id may legitimately
  * re-enter via a future delta.
  *
  * Contracts:
  *  - purge is IDEMPOTENT at rest: re-purging an already-tombstoned
  *    (or never-indexed) id changes nothing;
  *  - serve excludes a purged id from results AND from candidate
  *    generation the moment the purge commits — no compaction needed
  *    for correctness, only for space reclamation;
  *  - a delta append CANNOT resurrect a tombstoned id: the tombstone
  *    out-filters it at serve time until compaction clears both the
  *    rows and the tombstone (IndexPurgeSpec pins all three).
  *
  * When no tombstone table exists the filter is the IDENTITY — a
  * never-purged index keeps its exact original serve plan (the
  * byte-equality specs of all three layouts run unchanged). */
object Tombstones {

  private def table(prefix: String): String = s"${prefix}_tombstones"

  private def exists(spark: SparkSession, prefix: String): Boolean =
    spark.catalog.tableExists(table(prefix))

  /** Tombstone every id in `ids` (a 1-column frame, any column name).
    * Appends only the ids not already tombstoned — idempotent under
    * retries and under overlapping request batches. */
  def purge(spark: SparkSession, prefix: String, ids: DataFrame): Unit = {
    val incoming = ids.toDF("id").distinct()
    val fresh =
      if (!exists(spark, prefix)) incoming
      else incoming.join(spark.table(table(prefix)), Seq("id"), "left_anti")
    // first purge of a prefix creates the table — clear a stranded
    // directory a previous session's catalog left behind first
    BucketedTables.clearOrphanDir(spark, table(prefix))
    fresh.write.mode("append").format("parquet").saveAsTable(table(prefix))
    spark.catalog.refreshTable(table(prefix))
  }

  /** The current tombstone set (empty frame if never purged). */
  def ids(spark: SparkSession, prefix: String): DataFrame =
    if (exists(spark, prefix)) spark.table(table(prefix))
    else spark.emptyDataFrame.selectExpr("CAST(NULL AS BIGINT) AS id")
      .limit(0)

  /** Filter `idCol` of `df` against the tombstones — identity when the
    * index has never seen a purge, broadcast anti-join otherwise.
    * The tombstone side is aliased so a caller frame that itself
    * carries an `id` column can never make the join key ambiguous. */
  def filter(spark: SparkSession, prefix: String, df: DataFrame,
      idCol: String): DataFrame =
    if (!exists(spark, prefix)) df
    else df.join(
      broadcast(spark.table(table(prefix)).select(col("id").as("__tomb_id"))),
      df(idCol) === col("__tomb_id"), "left_anti")

  /** Remove ids from the tombstone list — a row LEGITIMATELY
    * re-entering the served set while its bytes still sit in the
    * table (a curated-corpus refresh re-keeping a doc an earlier
    * refresh evicted; distinct from a delta re-APPEND, which stays
    * blocked until compaction). Rewrites the small list without those
    * ids; no-op when no tombstone table exists. Idempotent. */
  def remove(spark: SparkSession, prefix: String, ids: DataFrame): Unit =
    if (exists(spark, prefix)) {
      val keep = spark.table(table(prefix))
        .join(broadcast(ids.toDF("id").distinct()), Seq("id"), "left_anti")
        // materialize BEFORE overwriting the table the plan reads
        .localCheckpoint(true)
      keep.write.mode("overwrite").format("parquet").saveAsTable(table(prefix))
      spark.catalog.refreshTable(table(prefix))
    }

  /** Drop the tombstone list — called by the layouts' compaction after
    * the rows are physically gone. */
  def clear(spark: SparkSession, prefix: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${table(prefix)}")
}
