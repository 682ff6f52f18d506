package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Attribution.{AttribEvent, Credit}

class AttributionOperatorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: String): Timestamp = Timestamp.valueOf(m)

  private val fixture = Seq(
    // user 1: view then purchase -> 'view'; later purchase after a
    // click -> 'click' (latest touch wins)
    AttribEvent(1L, 10L, ts("2024-01-01 10:00:00"), "view", 0.0),
    AttribEvent(1L, 11L, ts("2024-01-01 11:00:00"), "purchase", 50.0),
    AttribEvent(1L, 12L, ts("2024-01-01 12:00:00"), "click", 0.0),
    AttribEvent(1L, 13L, ts("2024-01-01 13:00:00"), "purchase", 25.0),
    // user 2: touch far outside the 72h lookback -> 'none'
    AttribEvent(2L, 20L, ts("2024-01-01 00:00:00"), "click", 0.0),
    AttribEvent(2L, 21L, ts("2024-01-05 00:00:01"), "purchase", 70.0),
    // user 3: no touch at all -> 'none'
    AttribEvent(3L, 30L, ts("2024-01-01 12:00:00"), "purchase", 30.0))

  test("batch fold credits latest in-window touch per user") {
    val got = Attribution.batchCredits(fixture.toDS()).collect()
      .map(c => c.purchaseId -> c.channel).toMap
    assert(got == Map(11L -> "view", 13L -> "click",
      21L -> "none", 30L -> "none"))
  }

  test("operator agrees with the relational ev_attribution rollup") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.util.Tables.load(spark, dir, "events")
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        col("ts").as("eventTime"), col("event_type").as("eventType"),
        col("value"))
      .as[AttribEvent]
    val typed = Attribution.batchCredits(events).collect()
      .groupBy(_.channel).view.mapValues(_.length.toLong).toMap
    val relational = graft.queries.EventsQueries.attribution(spark, dir)
      .select("channel", "n_purchases").as[(String, Long)]
      .collect().toMap
    assert(typed == relational)
    assert(typed.values.sum > 0L)
  }

  test("stale stored touch far below the watermark does not kill the query") {
    // other keys advance the watermark while a key idles; when that
    // key speaks again its natural re-arm (touch + lookback) can sit
    // BELOW the watermark, where an unclamped setTimeoutTimestamp
    // throws. (Under processAllAvailable the pending timeout usually
    // fires in a follow-up batch first, so this asserts the behavior
    // — stale touch credits 'none', stream stays alive — for
    // whichever interleaving the scheduler picks.)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttribEvent]
    val credits = Attribution.streamingCredits(
      mem.toDS().withWatermark("eventTime", "1 hour"))
    val q = credits.writeStream.format("memory")
      .queryName("attrib_stale").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 7 stores a touch on Jan 1
      mem.addData(AttribEvent(7L, 70L, ts("2024-01-01 10:00:00"), "view", 0.0))
      q.processAllAvailable()
      // batch 2: user 8 alone pushes the watermark 9 days past the
      // touch's 72h expiry
      mem.addData(AttribEvent(8L, 80L, ts("2024-01-10 10:00:00"), "view", 0.0))
      q.processAllAvailable()
      // batch 3: user 7 returns with data (data path wins over the
      // pending timeout), fold sees the stale touch, and the re-arm
      // must clamp to watermark+1 instead of throwing
      mem.addData(AttribEvent(7L, 71L, ts("2024-01-10 12:00:00"), "purchase", 5.0))
      q.processAllAvailable()
      val got = spark.table("attrib_stale").as[Credit].collect()
        .filter(_.purchaseId == 71L)
      assert(got.length == 1)
      assert(got.head.channel == "none") // touch long outside lookback
    } finally q.stop()
  }

  test("streaming credits across micro-batches equal the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttribEvent]
    val credits = Attribution.streamingCredits(
      mem.toDS().withWatermark("eventTime", "1 hour"))
    val q = credits.writeStream.format("memory")
      .queryName("attrib_stream").outputMode(OutputMode.Append()).start()
    try {
      // split so user 1's second purchase arrives a batch after its
      // click: the stored touch must carry across batches
      val (b1, b2) = fixture.sortBy(e => (e.eventTime.getTime, e.eventId))
        .partition(_.eventTime.before(ts("2024-01-01 12:30:00")))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("attrib_stream").as[Credit].collect().toSet
      val expected = Attribution.batchCredits(fixture.toDS()).collect().toSet
      assert(got == expected)
    } finally q.stop()
  }
}
