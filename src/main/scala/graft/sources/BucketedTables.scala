package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout — the co-located-join path for keys that are
  * joined or aggregated repeatedly.
  *
  * The reference's Postgres B-tree indexes (database/schema.sql:25-27)
  * accelerate point/range lookups; at Spark scale the analogous
  * *layout* decision for join keys is bucketing: both sides
  * pre-hash-partitioned into the same number of buckets on the join
  * key at WRITE time, so every subsequent equi-join or aggregation on
  * that key runs with NO exchange — the shuffle is paid once, at
  * ingest, instead of per query. At 100 TB this converts the nightly
  * "events join users" from a 2-sided shuffle into a zip of
  * co-located buckets.
  *
  * `sortBy` within buckets additionally lets sort-merge join skip its
  * per-task sort when one file per bucket is read.
  */
object BucketedTables {

  /** One write task per bucket: `repartition(n, key)` and the bucket
    * spec hash the same way (Murmur3 pmod n), so task i holds exactly
    * bucket i's rows and each bucket lands as ONE file. Without it
    * every upstream task emits its own file per bucket —
    * tasks x buckets small files, and Spark only trusts a bucket's
    * sortBy order (letting sort-merge join skip its per-task sort)
    * when it reads a single file per bucket. */
  private def oneFilePerBucket(df: DataFrame, key: String,
      buckets: Int): DataFrame =
    df.repartition(buckets, col(key))

  /** Write `df` as a bucketed, bucket-sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    oneFilePerBucket(df, key, buckets)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Append to an existing bucketed table with the SAME bucket spec —
    * Spark validates the (buckets, key) pair against the catalog, so a
    * drifted spec fails loudly instead of silently mixing layouts.
    * New files land in their hash bucket; readers keep the
    * shuffle-free bucketed join. (Each append adds one file per
    * bucket, so a bucket holds one file PER APPEND — the read-side
    * sort-skip degrades gracefully as deltas accumulate until a
    * rebuild compacts them.) */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int): Unit =
    oneFilePerBucket(df, key, buckets)
      .write.mode("append").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
