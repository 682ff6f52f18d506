package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Stream-batch equivalence (SURVEY.md §5.4): the streaming hourly
  * aggregate over shuffled, out-of-order input must equal the batch
  * aggregate over the same lines — the property the reference's
  * upsert-merge design implies (and its shuffle producer flag tests,
  * producer/producer.py:45-46). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def event(tpe: String, time: String, cust: String, session: Int,
      extra: String = ""): String =
    s"""{"event_type": "$tpe", "event_time": "$time", "payload": {"customer_id": "$cust", "session_id": $session, "channel": "web_portal"$extra}}"""

  /** 3 hours of mixed events, deliberately out of event-time order,
    * plus invalid rows that must not affect the aggregate. */
  private val lines: Seq[String] = new scala.util.Random(42).shuffle(Seq(
    event("user_login", "2025-06-04T14:05:00Z", "CUST01", 1),
    event("tariff_switch", "2025-06-04T12:30:00Z", "CUST01", 1,
      """, "tariff_type": "green", "payment_amount": 20.5"""),
    event("energy_consumed", "2025-06-04T12:45:00Z", "CUST02", 2,
      """, "energy_consumed": 41.787"""),
    event("bill_payment", "2025-06-04T13:58:33Z", "CUST03", 3,
      """, "payment_amount": 100.3"""),
    event("user_login", "2025-06-04T12:01:00Z", "CUST02", 2),
    event("user_login", "2025-06-04T12:59:59Z", "CUST02", 4),
    event("energy_consumed", "2025-06-04T13:10:00Z", "CUST02", 2,
      """, "energy_consumed": 10.0"""),
    event("incentive_claim", "2025-06-04T14:20:00Z", "CUST04", 5,
      """, "tariff_type": "basic", "payment_amount": 7.25"""),
    "not json at all",
    """{"event_type": "tariff_switch", "event_time": "2025-06-04T12:00:00Z", "payload": {"customer_id": "x"}}"""))

  private def key(r: org.apache.spark.sql.Row): String =
    r.getAs[java.sql.Timestamp]("hour").toString

  test("MemoryStream aggregate equals batch aggregate on shuffled input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val streamDf = EventsPipeline.hourlyMetrics(
      EventsPipeline.rawEvents(
        EventsPipeline.parseAndValidate(mem.toDF()))
        .withWatermark("event_time", "24 hours"))

    val q = streamDf.writeStream
      .format("memory").queryName("agg_mem")
      .outputMode("complete")
      .start()
    try {
      // two micro-batches to exercise state merge across triggers
      mem.addData(lines.take(4): _*)
      q.processAllAvailable()
      mem.addData(lines.drop(4): _*)
      q.processAllAvailable()

      val streamed = spark.table("agg_mem").collect().map(r => key(r) -> r).toMap
      val batch = EventsPipeline.hourlyMetrics(EventsPipeline.rawEvents(
        EventsPipeline.parseAndValidate(lines.toDF("value")))).collect()
        .map(r => key(r) -> r).toMap

      assert(streamed.keySet == batch.keySet)
      for ((k, b) <- batch) {
        val s = streamed(k)
        for (f <- b.schema.fieldNames)
          assert(s.getAs[Any](f) == b.getAs[Any](f), s"field $f @ $k")
      }
      assert(batch.size == 3)
    } finally q.stop()
  }

  test("file pipeline end-to-end: upsert sink is idempotent across restarts") {
    val in = tmpDir("graft-in")
    val ckpt = tmpDir("graft-ckpt")
    val out = tmpDir("graft-out")

    Files.write(in.resolve("part1.jsonl"),
      lines.take(5).mkString("\n").getBytes("UTF-8"))
    val q1 = EventsPipeline.start(spark, in.toString, ckpt.toString,
      out.toString, Trigger.AvailableNow())
    q1.awaitTermination()

    // second wave: same hours get updated -> new epoch must win
    Files.write(in.resolve("part2.jsonl"),
      lines.drop(5).mkString("\n").getBytes("UTF-8"))
    val q2 = EventsPipeline.start(spark, in.toString, ckpt.toString,
      out.toString, Trigger.AvailableNow())
    q2.awaitTermination()

    val dlq = EventsPipeline.startDeadLetter(spark, in.toString,
      ckpt.toString, out.toString, Trigger.AvailableNow())
    dlq.awaitTermination()

    val streamed = EventsPipeline.readHourlyMetrics(spark, out.toString)
      .collect().map(r => key(r) -> r).toMap
    val batch = EventsPipeline.hourlyMetrics(EventsPipeline.rawEvents(
      EventsPipeline.parseAndValidate(lines.toDF("value")))).collect()
      .map(r => key(r) -> r).toMap

    assert(streamed.keySet == batch.keySet)
    for ((k, b) <- batch; f <- b.schema.fieldNames)
      assert(streamed(k).getAs[Any](f) == b.getAs[Any](f), s"field $f @ $k")

    val dead = spark.read.json(s"$out/dead_letter").collect()
    assert(dead.length == 2)
    assert(dead.map(_.getAs[String]("reason")).sorted.toSeq ==
      Seq("malformed_json", "missing_payload_fields"))

    // observe() counters (A10): the second run ingested lines 5..9
    // (4 valid + 1 invalid or similar split depending on the shuffle)
    val observed = q2.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("graft_ingest")))
    assert(observed.nonEmpty, "no observed metrics emitted")
    val totalSeen = observed.map(r =>
      r.getAs[Long]("valid_events") + r.getAs[Long]("invalid_events")).sum
    assert(totalSeen == lines.drop(5).length, observed.mkString(","))
  }
}
