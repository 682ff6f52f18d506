package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Write `df` as a bucketed, bucket-sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Append to an existing bucketed table with the SAME bucket spec —
    * Spark validates the (buckets, key) pair against the catalog, so a
    * drifted spec fails loudly instead of silently mixing layouts.
    * New files land in their hash bucket; readers keep the
    * shuffle-free bucketed join. */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int): Unit =
    df.write.mode("append").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
