package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_attribution: last-touch credit assignment on a fixture where
  * every credit is known. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  test("credits the most recent in-window touch, per user") {
    val d = tmpDir("graft-attrib")
    val rows = Seq(
      // user 1: view then purchase 1h later -> 'view'
      (1L, "2024-03-04 10:00:00", 1L, "view", 0.0),
      (2L, "2024-03-04 11:00:00", 1L, "purchase", 50.0),
      // user 2: click then purchase 100h later -> outside 72h -> 'none'
      (3L, "2024-03-01 00:00:00", 2L, "click", 0.0),
      (4L, "2024-03-05 04:00:00", 2L, "purchase", 70.0),
      // user 3: purchase with no touch at all -> 'none'
      (5L, "2024-03-04 12:00:00", 3L, "purchase", 30.0),
      // user 4: view then click then purchase -> LAST touch ('click')
      (6L, "2024-03-04 09:00:00", 4L, "view", 0.0),
      (7L, "2024-03-04 09:30:00", 4L, "click", 0.0),
      (8L, "2024-03-04 10:15:00", 4L, "purchase", 20.0),
      // user 5's touch must NOT leak into user 6's purchase
      (9L, "2024-03-04 10:00:00", 5L, "view", 0.0),
      (10L, "2024-03-04 10:30:00", 6L, "purchase", 10.0))
    writeFixture(d, "events", rows.map { case (id, ts, u, t, v) =>
      (id, Timestamp.valueOf(ts), u, t, v, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

    val out = EventsQueries.attribution(spark, d.toString).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(out.keySet == Set("view", "click", "none"))
    assert(out("view") == ((1L, 50.0, 0.2)))
    assert(out("click") == ((1L, 20.0, 0.2)))
    assert(out("none") == ((3L, 110.0, 0.6)))
  }

  test("shares sum to 1 on real data") {
    val out = EventsQueries
      .attribution(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val s = out.map(_.getDouble(3)).sum
    assert(math.abs(s - 1.0) < 1e-9, s"shares sum to $s")
  }
}
