package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_did: a planted treatment effect on top of a shared trend must
  * be recovered exactly; the naive post-only delta must not. */
class DidSpec extends SparkSpec {
  import spark.implicits._

  test("planted effect + common trend: DiD isolates the effect") {
    val d = tmpDir("graft-did")
    var id = 0L
    def purchase(u: Long, ts: String, v: Double) = {
      id += 1
      (id, Timestamp.valueOf(ts), u, "purchase", v, """{"k":1}""")
    }
    // control users (u%3==0): pre 10, post 30  (trend +20)
    // variant users (u%3==1): pre 20, post 45  (trend +20, effect +5)
    // note the arms also differ in LEVEL (+10), which a naive post
    // comparison would misread as part of the effect
    val rows =
      Seq(0L, 3L, 6L).flatMap(u => Seq(
        purchase(u, "2024-01-05 10:00:00", 10.0),
        purchase(u, "2024-01-20 10:00:00", 30.0))) ++
      Seq(1L, 4L, 7L).flatMap(u => Seq(
        purchase(u, "2024-01-05 10:00:00", 20.0),
        purchase(u, "2024-01-20 10:00:00", 45.0)))
    writeFixture(d, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = EventsQueries.did(spark, d.toString).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 30.0)
    assert(r.getDouble(4) == 20.0 && r.getDouble(5) == 45.0)
    assert(math.abs(r.getDouble(6) - 5.0) < 1e-12, s"did ${r.getDouble(6)}")
    // the naive post-only delta would claim 15
    assert(math.abs((r.getDouble(5) - r.getDouble(3)) - 15.0) < 1e-12)
  }

  test("real data: the estimate re-derives from the published cell means") {
    val r = EventsQueries.did(spark, "/root/testdata/sf0.001")
      .collect().head
    val expect = (r.getDouble(5) - r.getDouble(4)) -
      (r.getDouble(3) - r.getDouble(2))
    assert(r.getDouble(6) == expect)
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
  }
}
