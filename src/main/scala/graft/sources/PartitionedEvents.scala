package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned event-log layout (SURVEY §2.1 S9).
  *
  * The reference's B-tree index on `events(event_time)`
  * (database/schema.sql:25) becomes physical layout: partition the
  * parquet log by event date so time-range predicates prune whole
  * directories (`PartitionFilters` at the scan), and sort within
  * partitions by event_time so min/max row-group stats prune pages.
  * At 100 TB this is the difference between scanning a day and
  * scanning the lake.
  */
object PartitionedEvents {

  /** Write an events relation (with a `ts` timestamp column)
    * date-partitioned, producing up to `filesPerDay` files per date
    * (shuffle on (event_date, bucket) so each date's rows land in that
    * many tasks — the small-files / task-parallelism dial). */
  def write(events: DataFrame, path: String,
      filesPerDay: Int = 4): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("bucket", pmod(hash(col("ts")), lit(filesPerDay)))
      .repartition(col("event_date"), col("bucket"))
      .drop("bucket")
      .sortWithinPartitions(col("event_date"), col("ts"))
      .write
      .mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Read back; time filters on `event_date` prune partitions. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
