package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Streamed windowed quantiles must carry the GK rank guarantee
  * against the EXACT per-(hour, type) distribution: at accuracy 10⁴
  * and these group sizes the allowed rank error is ≤1, so every
  * streamed p50/p95 must be an element within ±2 ranks of the exact
  * target — verified for every output group over the real events
  * table replayed as two micro-batches. */
class StreamQuantilesSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val dir = "/root/testdata/sf0.001"

  test("every streamed quantile is within the exact GK rank bound") {
    val rows = graft.util.Tables.load(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect()
    assert(rows.nonEmpty)
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = StreamQuantiles.hourly(
        mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sq_out").start()
    try {
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(b2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sq_out").collect()
    assert(got.length > 1)

    // exact groups, driver-side
    val hourMs = 3600L * 1000L
    val groups = rows.groupBy { case (ts, tp, _) =>
      (new Timestamp(ts.getTime / hourMs * hourMs), tp)
    }.map { case (k, vs) => k -> vs.map(_._3).sorted }

    var checked = 0
    for (r <- got) {
      val key = (r.getAs[Timestamp]("hour"), r.getAs[String]("event_type"))
      val sorted = groups(key)
      val n = sorted.length
      assert(r.getAs[Long]("n_events") == n.toLong, key.toString)
      for ((p, v) <- Seq((0.5, r.getAs[Double]("p50")),
          (0.95, r.getAs[Double]("p95")))) {
        val target = p * (n - 1)
        val lo = math.max(0, math.floor(target).toInt - 2)
        val hi = math.min(n - 1, math.ceil(target).toInt + 2)
        assert(v >= sorted(lo) && v <= sorted(hi),
          s"$key p=$p v=$v outside ranks [$lo,$hi] of n=$n")
        checked += 1
      }
    }
    assert(checked >= 2 * got.length)
    // and the output covers every (hour, type) the input held
    assert(got.length == groups.size)
  }
}
