package graft.streaming

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** RocksDB state store (graft.streaming.StateStores): the provider
  * swap that makes streaming state size independent of executor heap
  * must be semantics-free. Each test runs a stateful pipeline under
  * the RocksDB provider on an isolated session and checks BOTH
  * directions: results equal the default-provider run, and the
  * progress events prove RocksDB actually engaged (rocksdb* custom
  * metrics on the state operator — a mis-spelled provider class conf
  * would silently fall back nowhere, but a conf applied to the wrong
  * session would silently keep the default provider; the metric
  * assertion catches that). */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  /** Isolated session (own SQLConf, shared context) with RocksDB on. */
  private lazy val rocks: SparkSession = {
    val s = spark.newSession()
    StateStores.useRocksDb(s, maxMemoryMB = 256)
    s
  }

  private def rocksEngaged(q: StreamingQuery): Boolean =
    q.lastProgress.stateOperators.exists(
      _.customMetrics.keySet().asScala.exists(_.startsWith("rocksdb")))

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def event(tpe: String, time: String, cust: String, session: Int,
      extra: String = ""): String =
    s"""{"event_type": "$tpe", "event_time": "$time", "payload": {"customer_id": "$cust", "session_id": $session, "channel": "web_portal"$extra}}"""

  private val lines = Seq(
    event("user_login", "2025-06-04T14:05:00Z", "CUST01", 1),
    event("tariff_switch", "2025-06-04T12:30:00Z", "CUST01", 1,
      """, "tariff_type": "green", "payment_amount": 20.5"""),
    event("energy_consumed", "2025-06-04T12:45:00Z", "CUST02", 2,
      """, "energy_consumed": 41.787"""),
    event("bill_payment", "2025-06-04T13:58:33Z", "CUST03", 3,
      """, "payment_amount": 100.3"""),
    event("user_login", "2025-06-04T12:01:00Z", "CUST02", 2),
    event("energy_consumed", "2025-06-04T13:10:00Z", "CUST02", 2,
      """, "energy_consumed": 10.0"""))

  test("hourly aggregate under RocksDB equals the batch ground truth") {
    implicit val sqlCtx = rocks.sqlContext
    val mem = MemoryStream[String]
    val streamDf = EventsPipeline.hourlyMetrics(
      EventsPipeline.rawEvents(
        EventsPipeline.parseAndValidate(mem.toDF()))
        .withWatermark("event_time", "24 hours"))

    val q = streamDf.writeStream
      .format("memory").queryName("agg_rocks")
      .outputMode("complete")
      .start()
    try {
      mem.addData(lines.take(3): _*)
      q.processAllAvailable()
      mem.addData(lines.drop(3): _*)
      q.processAllAvailable()

      assert(rocksEngaged(q), "state operator reports no rocksdb metrics " +
        "— RocksDB provider did not engage")

      def key(r: org.apache.spark.sql.Row): String =
        r.getAs[Timestamp]("hour").toString
      val streamed = rocks.table("agg_rocks").collect()
        .map(r => key(r) -> r).toMap
      // ground truth on the DEFAULT session/provider
      val batch = EventsPipeline.hourlyMetrics(EventsPipeline.rawEvents(
        EventsPipeline.parseAndValidate(lines.toDF("value")))).collect()
        .map(r => key(r) -> r).toMap

      assert(streamed.keySet == batch.keySet)
      for ((k, b) <- batch; f <- b.schema.fieldNames)
        assert(streamed(k).getAs[Any](f) == b.getAs[Any](f), s"field $f @ $k")
    } finally q.stop()
  }

  test("watermark dedup state behaves identically under RocksDB") {
    implicit val sqlCtx = rocks.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    val out = StreamDedup.byContent(stream, "ts", "1 hour", "text")
    val q = out.writeStream.format("memory").queryName("dedup_rocks")
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

      assert(rocksEngaged(q), "dedup state operator reports no rocksdb " +
        "metrics — RocksDB provider did not engage")
      val kept = rocks.table("dedup_rocks").select("doc_id")
        .as[Long].collect().toSet
      // same survivors StreamDedupSpec pins under the default provider
      assert(kept == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("the RocksDB conf is session-local: the shared session keeps the default provider") {
    // guard against the conf leaking into the JVM-wide test session
    // (would silently re-run every other streaming spec under RocksDB)
    val k = "spark.sql.streaming.stateStore.providerClass"
    assert(rocks.conf.get(k) == StateStores.RocksDbProvider)
    assert(spark.conf.getOption(k).forall(_ != StateStores.RocksDbProvider))
  }
}
