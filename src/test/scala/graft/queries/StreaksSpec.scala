package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_streaks: the row_number-difference islands must equal a direct
  * run-length scan. */
class StreaksSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built runs: lengths, island counts, and the >=3 emission gate") {
    val d = tmpDir("graft-streaks")
    // user 1: e e e v e e  -> error streaks 3 then 2 (max 3, 2 islands)
    //         and a single view (below gate)
    // user 2: v v v v      -> view streak 4
    val types1 = Seq("error", "error", "error", "view", "error", "error")
    val types2 = Seq("view", "view", "view", "view")
    val rows =
      types1.zipWithIndex.map { case (t, i) =>
        ((i + 1).toLong, s"2024-03-04 10:0$i:00", 1L, t) } ++
      types2.zipWithIndex.map { case (t, i) =>
        ((i + 10).toLong, s"2024-03-04 11:0$i:00", 2L, t) }
    writeFixture(d, "events", rows.map { case (id, ts, u, t) =>
      (id, Timestamp.valueOf(ts), u, t, 1.0, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = EventsQueries.streaks(spark, d.toString).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      (1L, "error") -> ((3L, 2L)),
      (2L, "view") -> ((4L, 1L))))
  }

  test("islands equal a direct run-length scan on real data") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.util.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"event_type").collect()
      .map { r =>
        val t = r.getTimestamp(2)
        // MICROsecond order, matching the query's epoch_us sort —
        // getTime alone truncates to millis and can reorder events
        (r.getLong(0), r.getLong(1),
          t.getTime / 1000 * 1000000L + t.getNanos / 1000, r.getString(3))
      }
    val expect = ev.groupBy(_._1).flatMap { case (u, es) =>
      val runs = es.sortBy(e => (e._3, e._2)).map(_._4)
        .foldLeft(List.empty[(String, Int)]) {
          case ((t, n) :: rest, cur) if t == cur => (t, n + 1) :: rest
          case (acc, cur) => (cur, 1) :: acc
        }
      runs.groupBy(_._1).map { case (t, rs) =>
        (u, t) -> (rs.map(_._2).max.toLong, rs.length.toLong) }
    }.filter(_._2._1 >= 3L).toMap
    val got = EventsQueries.streaks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
