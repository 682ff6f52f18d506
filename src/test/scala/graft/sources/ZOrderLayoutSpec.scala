package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The z-order layout must cluster BOTH dimensions: every output file
  * should cover a narrow extent of each column, so min/max stats prune
  * scans filtered on either one. A single-column sort gives narrow
  * extents on that column and full-range extents on the other — the
  * failure mode this layout exists to fix. */
class ZOrderLayoutSpec extends SparkSpec {

  test("z-ordered files are narrow in both dimensions; single sort is not") {
    val dir = "/root/testdata/sf0.001"
    // (user_id, day) — the reference's two indexed read dimensions
    val ev = graft.util.Tables.load(spark, dir, "events")
      .select(col("user_id"),
        datediff(col("ts"), lit("2024-01-01").cast("timestamp"))
          .cast("long").as("day"))
      .filter(col("user_id").isNotNull && col("day") >= 0L)

    def extents(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(
          (max("user_id") - min("user_id")).cast("double").as("ur"),
          (max("day") - min("day")).cast("double").as("dr"))
        .agg(avg("ur"), avg("dr")).collect().head
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val Array(uSpan, dSpan) = ev
      .agg((max("user_id") - min("user_id")).cast("double"),
        (max("day") - min("day")).cast("double"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray

    val zOut = tmpDir("graft-z").resolve("z").toString
    ZOrderLayout.write(ev, "user_id", "day", zOut, nFiles = 16, bits = 10)
    val (zu, zd) = extents(zOut)

    val sOut = tmpDir("graft-z").resolve("s").toString
    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sOut)
    val (su, sd) = extents(sOut)

    // 16 z-tiles ~ 4x4 grid: each file spans a fraction of each
    // dimension. Bounds are loose (0.75) because the sf0.001 user span
    // is only ~14 values and range-sampler tile edges are ragged at
    // that granularity; the comparative asserts below are the teeth.
    assert(zu <= 0.75 * uSpan, s"z user extent $zu vs span $uSpan")
    assert(zd <= 0.75 * dSpan, s"z day extent $zd vs span $dSpan")
    // the single-column sort clusters user_id tightly...
    assert(su <= 0.25 * uSpan, s"sorted user extent $su vs span $uSpan")
    // ...but leaves day effectively unclustered — worse than z-order
    assert(sd > zd, s"single-sort day extent $sd should exceed z-order $zd")
    assert(sd >= 0.9 * dSpan, s"sorted day extent $sd vs span $dSpan")

    // layout preserves content
    assert(spark.read.parquet(zOut).count() == ev.count())
  }
}
