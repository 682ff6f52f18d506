package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

/** The built-in `session_window` formulation must agree with the other
  * two sessionization surfaces:
  *
  *  - batch `session_window` == the DuckDB-oracled relational
  *    lag/cumsum query on the real events table (start equal, end
  *    equal modulo the `+gap` window-close convention, counts equal);
  *  - streaming (watermarked, Append, out-of-order input inside the
  *    watermark) == batch on the same data — the stream==batch
  *    discipline every streaming operator here follows.
  */
class SessionWindowsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val GapUs = 30L * 60 * 1000000

  test("batch session_window equals the relational sessionization query") {
    val ev = Tables.load(spark, dir, "events").select(col("user_id"), col("ts"))
    val built = SessionWindows.batchSessions(ev)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        (unix_micros(col("session_end")) - GapUs).as("end_us"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    val relational = graft.queries.EventsQueries
      .sessionization(spark, dir)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(built.nonEmpty)
    assert(built == relational)
  }

  test("streaming sessions equal batch on out-of-order input within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    // two users; u1 has two sessions split by a >30min gap; events
    // arrive out of order WITHIN each micro-batch
    val rows = Seq(
      (1L, ts("2025-06-04 12:07:00")),
      (1L, ts("2025-06-04 12:00:00")),
      (2L, ts("2025-06-04 12:10:00")),
      (1L, ts("2025-06-04 12:20:00")),
      (1L, ts("2025-06-04 13:30:00")), // new session for u1
      (2L, ts("2025-06-04 12:35:00"))) // still inside u2's session

    val mem = MemoryStream[(Long, Timestamp)]
    val stream = mem.toDF().toDF("user_id", "ts")
    val q = SessionWindows.streamingSessions(stream)
      .writeStream.format("memory").queryName("sess_mem")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(4): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(4): _*)
      q.processAllAvailable()
      // advance the watermark far enough to close every open session
      mem.addData((99L, ts("2025-06-05 00:00:00")))
      q.processAllAvailable()

      val got = spark.table("sess_mem")
        .filter(col("user_id") =!= 99L)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .sortBy(r => (r._1, r._2.getTime)).toSeq
      val want = SessionWindows.batchSessions(rows.toDF("user_id", "ts"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .sortBy(r => (r._1, r._2.getTime)).toSeq
      assert(want.size == 3) // u1 x2, u2 x1
      assert(got == want)
    } finally q.stop()
  }
}
