package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RangeJoin

/** Stream-stream interval join (watermarked both sides) and its
  * equivalence with the batch band range join over the same rows. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (id, user, time) purchases / (id, user, time) errors
  private val purchases = Seq(
    (1L, 10L, ts("2025-06-04 12:00:00")),
    (2L, 10L, ts("2025-06-04 12:30:00")),
    (3L, 11L, ts("2025-06-04 12:07:00")))
  private val errors = Seq(
    (100L, 10L, ts("2025-06-04 12:03:00")), // within 5m of p1
    (101L, 10L, ts("2025-06-04 12:26:00")), // within 5m of p2
    (102L, 10L, ts("2025-06-04 12:50:00")), // near nothing
    (103L, 11L, ts("2025-06-04 12:04:00")), // within 5m of p3 (other user)
    (104L, 12L, ts("2025-06-04 12:00:00"))) // user with no purchases

  private val expectedPairs = Set((1L, 100L), (2L, 101L), (3L, 103L))

  test("watermarked stream-stream interval join emits exactly the in-band pairs") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val eMem = MemoryStream[(Long, Long, Timestamp)]
    // the horizon must cover cross-batch lateness: batch 1 advances the
    // watermark to max(ts) - horizon, and right-side state older than
    // (watermark - band) is evicted — a 10-minute horizon here would
    // correctly DROP the (p3, e103) pair whose error arrives one batch
    // before the late purchase
    val p = pMem.toDF().toDF("p_id", "p_user", "p_ts")
      .withWatermark("p_ts", "1 hour")
    val e = eMem.toDF().toDF("e_id", "e_user", "e_ts")
      .withWatermark("e_ts", "1 hour")
    val joined = p.join(e, expr(
      """p_user = e_user AND
        |e_ts BETWEEN p_ts - INTERVAL 5 MINUTES AND p_ts + INTERVAL 5 MINUTES""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ssj_mem")
      .outputMode("append").start()
    try {
      // split the data across two micro-batches, out of order
      pMem.addData(purchases.take(2): _*)
      eMem.addData(errors.take(3): _*)
      q.processAllAvailable()
      pMem.addData(purchases.drop(2): _*)
      eMem.addData(errors.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("ssj_mem").select("p_id", "e_id")
        .as[(Long, Long)].collect().toSet
      assert(got == expectedPairs)
    } finally q.stop()
  }

  test("stream-static enrichment join: per-batch dimension lookup, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val dimPath = tmpDir("graft-dim").resolve("dim").toString
    Seq((10L, "gold"), (11L, "silver")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val mem = MemoryStream[(Long, Long)]
    val joined = mem.toDF().toDF("event_id", "user_id")
      .join(dim, Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("ss_enrich")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10L), (2L, 12L))
      q.processAllAvailable()
      mem.addData((3L, 11L), (4L, 10L))
      q.processAllAvailable()
      val got = spark.table("ss_enrich")
        .select("event_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      // known users enrich in every batch; unknown users survive with
      // null (left join — ingest never drops events on a dim miss), and
      // no state store is involved (the dim is re-joined per batch)
      assert(got == Map(1L -> Some("gold"), 2L -> None,
        3L -> Some("silver"), 4L -> Some("gold")))
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("batch band range join produces the same pairs") {
    val tolUs = 5L * 60 * 1000000
    val p = purchases.toDF("p_id", "user", "t")
      .select($"p_id", $"user", unix_micros($"t").as("t_us"))
    val e = errors.toDF("e_id", "user", "t")
      .select($"e_id", $"user", unix_micros($"t").as("t_us"))
    val got = RangeJoin.withinTolerance(p, e, "user", "t_us", tolUs)
      .select("p_id", "e_id").as[(Long, Long)].collect().toSet
    assert(got == expectedPairs)
  }

  test("one-sided interval join: streamed equals the batch plan on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val horizon = expr("INTERVAL 10 MINUTES")
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val eMem = MemoryStream[(Long, Long, Timestamp)]
    val p = pMem.toDF().toDF("p_id", "p_user", "p_ts")
      .withWatermark("p_ts", "1 hour")
    val e = eMem.toDF().toDF("e_id", "e_user", "e_ts")
      .withWatermark("e_ts", "1 hour")
    val q = graft.operators.IntervalJoin
      .following(p, e, "p_user", "e_user", "p_ts", "e_ts", horizon)
      .select("p_id", "e_id")
      .writeStream.format("memory").queryName("iij_mem")
      .outputMode("append").start()
    try {
      pMem.addData(purchases: _*)
      eMem.addData(errors.take(2): _*)
      q.processAllAvailable()
      eMem.addData(errors.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("iij_mem").as[(Long, Long)].collect().toSet
      val batch = graft.operators.IntervalJoin.following(
          purchases.toDF("p_id", "p_user", "p_ts"),
          errors.toDF("e_id", "e_user", "e_ts"),
          "p_user", "e_user", "p_ts", "e_ts", horizon)
        .select("p_id", "e_id").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("band replication finds pairs that straddle a bucket boundary") {
    val tol = 100L
    val left = Seq((1L, 1L, 199L), (2L, 1L, 205L)).toDF("id", "k", "t")
    val right = Seq((10L, 1L, 201L), (11L, 1L, 350L)).toDF("rid", "k", "t")
    // 199 (bucket 1) vs 201 (bucket 2): |dt|=2 <= 100 must match across
    // the boundary; 205 vs 350: |dt|=145 > 100 must not match
    val got = RangeJoin.withinTolerance(left, right, "k", "t", tol)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L)))
  }
}
