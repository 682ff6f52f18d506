package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.PatternMatch.{ChainMatch, PatternEvent}

class PatternMatchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: String): Timestamp = Timestamp.valueOf(m)

  private val fixture = Seq(
    // user 1: v c p (one full chain), then a lone v c pair
    PatternEvent(1L, 10L, ts("2024-01-01 10:00:00"), "view"),
    PatternEvent(1L, 11L, ts("2024-01-01 10:01:00"), "click"),
    PatternEvent(1L, 12L, ts("2024-01-01 10:02:00"), "purchase"),
    PatternEvent(1L, 13L, ts("2024-01-01 10:03:00"), "view"),
    PatternEvent(1L, 14L, ts("2024-01-01 10:04:00"), "click"),
    // user 2: v c v c p — restart inside the chain, one completion
    PatternEvent(2L, 20L, ts("2024-01-01 11:00:00"), "view"),
    PatternEvent(2L, 21L, ts("2024-01-01 11:01:00"), "click"),
    PatternEvent(2L, 22L, ts("2024-01-01 11:02:00"), "view"),
    PatternEvent(2L, 23L, ts("2024-01-01 11:03:00"), "click"),
    PatternEvent(2L, 24L, ts("2024-01-01 11:04:00"), "purchase"),
    // user 3: v e c p — an interloper breaks adjacency, no chain
    PatternEvent(3L, 30L, ts("2024-01-01 12:00:00"), "view"),
    PatternEvent(3L, 31L, ts("2024-01-01 12:01:00"), "error"),
    PatternEvent(3L, 32L, ts("2024-01-01 12:02:00"), "click"),
    PatternEvent(3L, 33L, ts("2024-01-01 12:03:00"), "purchase"))

  test("batch automaton counts consecutive chains, restarts, rejects interlopers") {
    val got = PatternMatch.batchMatches(fixture.toDS()).collect()
      .sortBy(_.userId)
    assert(got.map(m => (m.userId, m.endEventId)).toSeq ==
      Seq((1L, 12L), (2L, 24L)))
  }

  test("shuffled input produces the same matches") {
    val shuffled = new scala.util.Random(7).shuffle(fixture)
    val a = PatternMatch.batchMatches(fixture.toDS()).collect().toSet
    val b = PatternMatch.batchMatches(shuffled.toDS()).collect().toSet
    assert(a == b)
  }

  test("typed operator agrees with the relational ev_funnel_sequences per user") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.util.Tables.load(spark, dir, "events")
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        col("ts").as("eventTime"), col("event_type").as("eventType"))
      .as[PatternEvent]
    val typed = PatternMatch.batchMatches(events).groupByKey(_.userId)
      .count().collect().toMap
    val relational = graft.queries.EventsQueries
      .funnelSequences(spark, dir)
      .select("user_id", "n_full_chain").as[(Long, Long)].collect()
      .filter(_._2 > 0L).toMap
    assert(typed == relational)
    assert(typed.values.sum > 0L)
  }

  test("automaton equals brute-force sliding windows on seeded random streams") {
    val types = Array("view", "click", "purchase", "error", "signup")
    val pat = PatternMatch.DefaultPattern
    for (seed <- Seq(1, 2, 3, 4, 5)) {
      val rnd = new scala.util.Random(seed)
      val evs = (0 until 2000).map { i =>
        PatternEvent(rnd.nextInt(50).toLong, i.toLong,
          new Timestamp(1700000000000L + i * 1000L),
          types(rnd.nextInt(types.length)))
      }
      val got = PatternMatch.batchMatches(evs.toDS()).collect()
        .groupBy(_.userId).view.mapValues(_.length.toLong).toMap
      val expected = evs.groupBy(_.userId).collect {
        case (u, es) =>
          val ordered = es.sortBy(e => (e.eventTime.getTime, e.eventId))
            .map(_.eventType)
          val n = ordered.sliding(pat.length)
            .count(w => w.length == pat.length && w.sameElements(pat))
          u -> n.toLong
      }.filter(_._2 > 0L).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("streaming matches across micro-batches equal the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PatternEvent]
    val matches = PatternMatch.streamingMatches(
      mem.toDS().withWatermark("eventTime", "1 hour"))
    val q = matches.writeStream.format("memory")
      .queryName("pattern_stream").outputMode(OutputMode.Append()).start()
    try {
      // split mid-chain: user 1's purchase arrives in the second batch,
      // so the automaton must carry its matched prefix across batches
      val (b1, b2) = fixture.sortBy(e => (e.eventTime.getTime, e.eventId))
        .partition(_.eventTime.before(ts("2024-01-01 10:02:00")))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("pattern_stream").as[ChainMatch]
        .collect().toSet
      val expected = PatternMatch.batchMatches(fixture.toDS()).collect().toSet
      assert(got == expected)
    } finally q.stop()
  }
}
