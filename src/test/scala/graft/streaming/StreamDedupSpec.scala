package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("byContent keeps the first arrival per content hash across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    val out = StreamDedup.byContent(stream, "ts", "1 hour", "text")
    val q = out.writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "alpha beta", ts("2025-06-04 12:00:00")),
        (2L, "alpha beta", ts("2025-06-04 12:00:30")), // dup in same batch
        (3L, "gamma", ts("2025-06-04 12:01:00")))
      q.processAllAvailable()
      mem.addData(
        (4L, "alpha beta", ts("2025-06-04 12:05:00")), // dup across batches
        (5L, "delta", ts("2025-06-04 12:06:00")))
      q.processAllAvailable()
      val kept = spark.table("dedup_mem").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("byContent passes null-text rows through instead of collapsing them") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Option[String], Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    val out = StreamDedup.byContent(stream, "ts", "1 hour", "text")
    val q = out.writeStream.format("memory").queryName("dedup_null_mem")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, Some("alpha"), ts("2025-06-04 12:00:00")),
        (2L, None, ts("2025-06-04 12:00:10")),
        (3L, None, ts("2025-06-04 12:00:20")), // distinct doc, also null text
        (4L, Some("alpha"), ts("2025-06-04 12:00:30"))) // real duplicate
      q.processAllAvailable()
      val kept = spark.table("dedup_null_mem").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("byKey drops re-sends of the same key within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("event_id", "payload", "ts")
    val out = StreamDedup.byKey(stream, "ts", "10 minutes", Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("dedup_key_mem")
      .outputMode("append").start()
    try {
      mem.addData(
        (10L, "a", ts("2025-06-04 12:00:00")),
        (11L, "b", ts("2025-06-04 12:00:10")))
      q.processAllAvailable()
      // at-least-once re-delivery of event 10 with identical payload
      mem.addData((10L, "a", ts("2025-06-04 12:00:00")))
      q.processAllAvailable()
      val n = spark.table("dedup_key_mem").count()
      assert(n == 2)
    } finally q.stop()
  }
}
