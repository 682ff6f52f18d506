package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_power_analysis: closed-form check on a tiny fixture plus
  * internal consistency of the published numbers. */
class PowerAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val Zsum = 1.959964 + 0.841621

  test("moments and MDE match a direct computation") {
    val d = tmpDir("graft-power")
    // control users 0,3,6,9 with revenues 10,20,30,40; variant users
    // 1,4,7,10 with revenues 20,20,40,40 (plus non-purchase noise)
    val rows = Seq(
      (1L, 0L, "purchase", 10.0), (2L, 3L, "purchase", 20.0),
      (3L, 6L, "purchase", 30.0), (4L, 9L, "purchase", 40.0),
      (5L, 1L, "purchase", 20.0), (6L, 4L, "purchase", 20.0),
      (7L, 7L, "purchase", 40.0), (8L, 10L, "purchase", 40.0),
      (9L, 0L, "view", 99.0), (10L, 7L, "click", 5.0))
    writeFixture(d, "events", rows.map { case (id, u, t, v) =>
      (id, Timestamp.valueOf("2024-03-04 10:00:00"), u, t, v, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = EventsQueries.powerAnalysis(spark, d.toString).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(math.abs(r.getDouble(2) - 25.0) < 1e-9) // control mean
    // pooled var: control var = 500/3, variant var = 400/3
    val varP = (500.0 / 3 + 400.0 / 3) / 2
    assert(math.abs(r.getDouble(3) - varP) < 1e-6)
    val mde = Zsum * math.sqrt(varP * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getDouble(4) - mde) < 1e-6)
  }

  test("published numbers are internally consistent; MDE shrinks with n") {
    def row(dir: String) =
      EventsQueries.powerAnalysis(spark, dir).collect().head
    val small = row("/root/testdata/sf0.001")
    val big = row("/root/testdata/sf0.01")
    // n_required re-derives from the published var and mean
    for (r <- Seq(small, big)) {
      val expect = math.ceil(2.0 * Zsum * Zsum * r.getDouble(3) /
        math.pow(r.getDouble(2) * 0.05, 2)).toLong
      assert(r.getLong(6) == expect, s"$r")
      assert(r.getDouble(5) > 0.0)
    }
    assert(big.getLong(0) > small.getLong(0))
    assert(big.getDouble(5) < small.getDouble(5),
      "relative MDE did not shrink with sample size")
  }
}
