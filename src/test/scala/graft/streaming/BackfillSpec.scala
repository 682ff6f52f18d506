package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The sink-repair path: events that arrived after the stream's 24 h
  * watermark closed their hour are recomputed in batch and appended
  * with a superseding epoch — readers see the repaired hours through
  * the same latest-epoch-wins view, untouched hours keep their
  * stream-written rows. */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  private def event(tpe: String, time: String, cust: String, session: Int,
      extra: String = ""): String =
    s"""{"event_type": "$tpe", "event_time": "$time", "payload": {"customer_id": "$cust", "session_id": $session, "channel": "web_portal"$extra}}"""

  // hours 12 and 13 get LATE events (part2); hour 14 is complete in
  // the stream run
  private val onTime = Seq(
    event("user_login", "2025-06-04T12:01:00Z", "CUST01", 1),
    event("energy_consumed", "2025-06-04T12:45:00Z", "CUST02", 2,
      """, "energy_consumed": 41.787"""),
    event("bill_payment", "2025-06-04T13:58:33Z", "CUST03", 3,
      """, "payment_amount": 100.3"""),
    event("user_login", "2025-06-04T14:05:00Z", "CUST04", 4))
  private val late = Seq(
    event("energy_consumed", "2025-06-04T12:50:00Z", "CUST05", 5,
      """, "energy_consumed": 10.0"""),
    event("tariff_switch", "2025-06-04T13:30:00Z", "CUST01", 1,
      """, "tariff_type": "green", "payment_amount": 20.5"""))

  test("backfill repairs the late hours; untouched hours keep stream rows") {
    val in = tmpDir("graft-bf-in")
    val ckpt = tmpDir("graft-bf-ckpt")
    val out = tmpDir("graft-bf-out")

    Files.write(in.resolve("part1.jsonl"),
      onTime.mkString("\n").getBytes("UTF-8"))
    val q = EventsPipeline.start(spark, in.toString, ckpt.toString,
      out.toString, Trigger.AvailableNow())
    q.awaitTermination()

    // the late events land on disk AFTER the stream closed those hours
    // (simulated by simply not running the stream again)
    Files.write(in.resolve("part2-late.jsonl"),
      late.mkString("\n").getBytes("UTF-8"))
    val epoch = EventsPipeline.backfillHourlyMetrics(spark, in.toString,
      out.toString, "2025-06-04 12:00:00", "2025-06-04 14:00:00")

    def key(r: org.apache.spark.sql.Row): String =
      r.getAs[java.sql.Timestamp]("hour").toString
    val read = EventsPipeline.readHourlyMetrics(spark, out.toString)
      .collect().map(r => key(r) -> r).toMap
    val truth = EventsPipeline.batchHourlyMetrics(spark, in.toString)
      .collect().map(r => key(r) -> r).toMap

    // repaired + untouched hours all equal the batch ground truth
    assert(read.keySet == truth.keySet && read.keySet.size == 3)
    for ((k, t) <- truth; f <- t.schema.fieldNames)
      assert(read(k).getAs[Any](f) == t.getAs[Any](f), s"field $f @ $k")

    // provenance: hours 12/13 were superseded by the backfill epoch,
    // hour 14 still carries its original stream-written epoch
    val latestEpochs = spark.read
      .parquet(s"$out/hourly_business_metrics")
      .groupBy(col("hour")).agg(max(col("batch_epoch")).as("e"))
      .collect().map(r => key(r) -> r.getAs[Long]("e")).toMap
    assert(latestEpochs("2025-06-04 12:00:00.0") == epoch)
    assert(latestEpochs("2025-06-04 13:00:00.0") == epoch)
    assert(latestEpochs("2025-06-04 14:00:00.0") < epoch)
  }
}
