package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered parquet layout: interleave the bits of
  * two dimension columns and range-partition + sort the data by the
  * interleaved key before writing.
  *
  * Why: a layout sorted on ONE column gives parquet row-group min/max
  * stats that prune scans filtered on that column only — a filter on
  * the second column still reads everything. Bit interleaving makes
  * file/row-group extents narrow in BOTH dimensions (each file covers
  * a square-ish tile of the key space), so predicates on either
  * column skip most of the data. This is the standard multi-dim
  * clustering technique of lakehouse table formats, expressed with
  * plain Spark: an expression for the key, `repartitionByRange` for
  * the tiling, `sortWithinPartitions` for row-group locality.
  *
  * At 100 TB: the z-expression is per-row map work (codegen'd bit
  * ops), the range partitioner samples the key like any global sort,
  * and file count is chosen by the writer — no driver-side data
  * movement anywhere.
  *
  * Reference analog: the B-tree indexes on (timestamp) and
  * (customer_id, timestamp) — reference database/schema.sql — whose
  * read patterns a columnar layout serves with clustering instead of
  * index structures (see also [[PartitionedEvents]] for the
  * time-partition analog and [[BucketedTables]] for the join analog).
  */
object ZOrderLayout {

  /** Morton key interleaving the low `bits` bits of two non-negative
    * integer columns: bit b of x lands at position 2b, bit b of y at
    * 2b+1. Pure long arithmetic — codegen-friendly, no UDF. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(xs, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(ys, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-clustered on (xCol, yCol) into `nFiles` range tiles.
    * The z key is dropped from the stored schema — it is a layout
    * artifact, reconstructible from the columns. */
  def write(df: DataFrame, xCol: String, yCol: String, out: String,
      nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(out)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
