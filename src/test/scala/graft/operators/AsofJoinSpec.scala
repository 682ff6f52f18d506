package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val quotes = Seq(
    // (key, time, px)
    ("A", ts("2025-06-04 10:00:00"), 1.0),
    ("A", ts("2025-06-04 11:00:00"), 2.0),
    ("B", ts("2025-06-04 10:30:00"), 9.0))
    .toDF("k", "t", "px")

  private val trades = Seq(
    // (id, key, time)
    (1L, "A", ts("2025-06-04 09:59:59")), // before any quote -> null
    (2L, "A", ts("2025-06-04 10:00:00")), // exact tie -> inclusive
    (3L, "A", ts("2025-06-04 10:59:59")), // between quotes -> 1.0
    (4L, "A", ts("2025-06-04 12:00:00")), // after last -> 2.0
    (5L, "B", ts("2025-06-04 11:00:00")), // other key -> 9.0
    (6L, "C", ts("2025-06-04 11:00:00"))) // key with no quotes -> null
    .toDF("id", "k", "t")

  test("backward as-of picks the most recent right row at-or-before") {
    val out = AsofJoin.backward(trades, quotes, "k", "t")
      .select("id", "px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(1.0),
      4L -> Some(2.0), 5L -> Some(9.0), 6L -> None))
  }

  test("left columns survive untouched and row count is preserved") {
    val out = AsofJoin.backward(trades, quotes, "k", "t")
    assert(out.columns.toSeq == Seq("id", "k", "t", "px"))
    assert(out.count() == trades.count())
  }

  test("ev_asof_join matches a window-free per-row recomputation (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.EventsQueries.asofLastError(spark, dir)
      .select("event_id", "last_error_value")
      .as[(Long, Option[Double])].collect().toMap
    val ev = graft.util.Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
      .collect()
    val errors = ev.filter(_.getString(3) == "error")
    // ASOF leaves equal-timestamp ties unspecified (both here in maxBy
    // and in the operator's window) — guard the precondition so a
    // regenerated testdata with a tie fails loudly instead of flaking
    val tied = errors.groupBy(e => (e.getLong(1), e.getTimestamp(2)))
      .filter(_._2.size > 1).keys
    assert(tied.isEmpty,
      s"duplicate (user_id, ts) error rows make this oracle ambiguous: ${tied.take(3)}")
    val expected = ev.filter(_.getString(3) == "purchase").map { p =>
      val prior = errors.filter(e =>
        e.getLong(1) == p.getLong(1) &&
          !e.getTimestamp(2).after(p.getTimestamp(2)))
      p.getLong(0) -> (if (prior.isEmpty) None
        else Some(prior.maxBy(_.getTimestamp(2).getTime).getDouble(4)))
    }.toMap
    assert(got == expected)
  }
}
