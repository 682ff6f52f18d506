package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Sessionize.{Session, SessionEvent}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: String): Timestamp = Timestamp.valueOf(m)

  private val events = Seq(
    // CUST1: two sessions separated by a 40-min gap
    SessionEvent("CUST1", ts("2025-06-04 12:00:00"), "user_login"),
    SessionEvent("CUST1", ts("2025-06-04 12:10:00"), "view_tariffs"),
    SessionEvent("CUST1", ts("2025-06-04 12:20:00"), "tariff_switch"),
    SessionEvent("CUST1", ts("2025-06-04 13:00:00"), "user_login"),
    SessionEvent("CUST1", ts("2025-06-04 13:05:00"), "user_logout"),
    // CUST2: one long session, events within gap of each other
    SessionEvent("CUST2", ts("2025-06-04 12:00:00"), "user_login"),
    SessionEvent("CUST2", ts("2025-06-04 12:29:00"), "energy_consumed"),
    SessionEvent("CUST2", ts("2025-06-04 12:58:00"), "bill_payment"))

  test("batch sessionization splits on 30-min gaps") {
    val sessions = Sessionize.batchSessions(events.toDS()).collect()
      .sortBy(s => (s.customerId, s.sessionStart.getTime))
    assert(sessions.map(s => (s.customerId, s.nEvents, s.durationSec)).toSeq ==
      Seq(("CUST1", 3, 1200L), ("CUST1", 2, 300L), ("CUST2", 3, 3480L)))
  }

  test("shuffled input produces the same sessions") {
    val shuffled = new scala.util.Random(3).shuffle(events)
    val a = Sessionize.batchSessions(events.toDS()).collect().toSet
    val b = Sessionize.batchSessions(shuffled.toDS()).collect().toSet
    assert(a == b)
  }

  test("typed operator agrees with the relational window formulation (ev_sessionization)") {
    val dir = "/root/testdata/sf0.001"
    val relational = graft.queries.EventsQueries.sessionization(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id").toString,
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us"),
        r.getAs[Long]("n_events"))).toSet
    val typedEvents = graft.util.Tables.load(spark, dir, "events")
      .selectExpr("CAST(user_id AS STRING) AS customerId",
        "ts AS eventTime", "event_type AS eventType")
      .as[SessionEvent]
    def us(t: Timestamp): Long = t.getTime / 1000 * 1000000 + t.getNanos / 1000
    val typed = Sessionize.batchSessions(typedEvents).collect()
      .map(s => (s.customerId, us(s.sessionStart), us(s.sessionEnd),
        s.nEvents.toLong)).toSet
    assert(typed == relational)
  }

  test("typed operator agrees with Spark's native session_window on the fixture") {
    import org.apache.spark.sql.functions._
    // session_window's end is last-event + gap; Session.sessionEnd is
    // the last event itself — compare modulo that definitional shift
    val native = events.toDS()
      .groupBy(col("customerId"),
        session_window(col("eventTime"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("customerId"), col("w.start").as("start"),
        col("w.end").as("end"), col("n"))
      .as[(String, Timestamp, Timestamp, Long)].collect()
      .map { case (c, s, e, n) =>
        (c, s.getTime, e.getTime - Sessionize.GapMs, n) }.toSet
    val typed = Sessionize.batchSessions(events.toDS()).collect()
      .map(s => (s.customerId, s.sessionStart.getTime,
        s.sessionEnd.getTime, s.nEvents.toLong)).toSet
    assert(typed == native)
  }

  test("cross-batch late events extend the open session backwards or close as singletons") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val sessions = Sessionize.streamingSessions(
      mem.toDS().withWatermark("eventTime", "6 hours"))
    val q = sessions.writeStream
      .format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // open session 12:00-12:20
      mem.addData(
        SessionEvent("C", ts("2025-06-04 12:00:00"), "a"),
        SessionEvent("C", ts("2025-06-04 12:20:00"), "b"))
      q.processAllAvailable()
      // late within gap of the start -> extends backwards;
      // late far before -> immediate singleton session
      mem.addData(
        SessionEvent("C", ts("2025-06-04 11:45:00"), "late-near"),
        SessionEvent("C", ts("2025-06-04 08:00:00"), "late-far"))
      q.processAllAvailable()
      // advance watermark to close the open session
      mem.addData(SessionEvent("Z", ts("2025-06-05 12:00:00"), "tick"))
      q.processAllAvailable()

      val closed = spark.table("sess_late").as[Session].collect()
        .filter(_.customerId == "C").sortBy(_.sessionStart.getTime)
      assert(closed.map(s => (s.nEvents, s.durationSec)).toSeq ==
        Seq((1, 0L), (3, 2100L)), closed.toSeq)
    } finally q.stop()
  }

  test("streaming sessionization emits closed sessions as the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val sessions = Sessionize.streamingSessions(
      mem.toDS().withWatermark("eventTime", "0 seconds"))
    val q = sessions.writeStream
      .format("memory").queryName("sess_mem")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(events.take(3): _*) // CUST1 session 1
      q.processAllAvailable()
      // advance watermark far past the gap -> session 1 must close
      mem.addData(SessionEvent("CUST1", ts("2025-06-04 15:00:00"), "user_login"))
      q.processAllAvailable()
      mem.addData(SessionEvent("CUST9", ts("2025-06-04 18:00:00"), "user_login"))
      q.processAllAvailable()

      val closed = spark.table("sess_mem").as[Session].collect()
      assert(closed.exists(s =>
        s.customerId == "CUST1" && s.nEvents == 3 && s.durationSec == 1200L),
        closed.toSeq)
    } finally q.stop()
  }
}
