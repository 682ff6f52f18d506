package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_gap_fill: planted gaps must appear as zero-count spine rows
  * carrying the last observed value, and observed hours must pass
  * through untouched. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("planted gaps are densified with LOCF values and flagged") {
    // errors at hours 02, 03, 06 — gaps at 04 and 05
    val rows = Seq((2, 10.0), (3, 20.0), (6, 40.0)).zipWithIndex.map {
      case ((h, v), i) =>
        (i.toLong, Timestamp.valueOf(f"2024-03-02 $h%02d:15:00"),
          1L, "error", v, """{"k":1}""")
    } :+ ((99L, Timestamp.valueOf("2024-03-02 04:30:00"), 2L, "view",
      999.0, """{"k":1}""")) // non-error traffic must not plug the gap
    val d = tmpDir("graft-gapfill")
    writeFixture(d, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

    val got = EventsQueries.gapFill(spark, d.toString).collect()
      .map(r => (r.getLong(1), r.isNullAt(2), r.getLong(3), r.getLong(4)))
    // (n_events, x_micro null?, x_locf, is_gap) for hours 02..06
    assert(got.toSeq == Seq(
      (1L, false, 10000000L, 0L),
      (1L, false, 20000000L, 0L),
      (0L, true, 20000000L, 1L), // 04: gap, carries hour-03's value
      (0L, true, 20000000L, 1L), // 05: still carrying
      (1L, false, 40000000L, 0L)))
  }

  test("a dense series passes through with no gaps and locf == observed") {
    val rows = (0 until 5).map(h =>
      (h.toLong, Timestamp.valueOf(f"2024-03-02 $h%02d:15:00"),
        1L, "error", 5.0 + h, """{"k":1}"""))
    val d = tmpDir("graft-gapfill2")
    writeFixture(d, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = EventsQueries.gapFill(spark, d.toString).collect()
    assert(got.length == 5)
    assert(got.forall(_.getLong(4) == 0L))
    assert(got.forall(r => r.getLong(2) == r.getLong(3)))
  }
}
