package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_ewma_forecast: closed-form behavior on constant and step series. */
class EwmaForecastSpec extends SparkSpec {
  import spark.implicits._

  private def hourlyEvents(countsByHour: Seq[Int]): java.nio.file.Path = {
    val d = tmpDir("graft-ewma")
    var id = 0L
    val rows = countsByHour.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map { _ =>
        id += 1
        (id, Timestamp.valueOf(f"2024-03-04 $h%02d:15:00"), 1L, "view",
          1.0, """{"k":1}""")
      }
    }
    writeFixture(d, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    d
  }

  test("constant series: zero residual everywhere after the first hour") {
    val d = hourlyEvents(Seq.fill(12)(7))
    val rows = EventsQueries.ewmaForecast(spark, d.toString).collect()
    assert(rows.length == 12)
    assert(rows.head.isNullAt(2), "first hour has no lags -> null forecast")
    rows.tail.foreach { r =>
      assert(math.abs(r.getDouble(2) - 7.0) < 1e-12)
      assert(math.abs(r.getDouble(3)) < 1e-12)
    }
  }

  test("an outage hour gets its own row and a large negative residual") {
    // hours 0-5 and 7-11 at 7 events; hour 6 has NO events at all —
    // the densified spine must still produce its row with n_events=0
    // and residual -7, the exact anomaly a sparse series would hide
    val d = hourlyEvents(Seq(7, 7, 7, 7, 7, 7, 0, 7, 7, 7, 7, 7))
    val rows = EventsQueries.ewmaForecast(spark, d.toString).collect()
    assert(rows.length == 12, "outage hour missing from the spine")
    val outage = rows(6)
    assert(outage.getLong(1) == 0L)
    assert(math.abs(outage.getDouble(2) - 7.0) < 1e-12)
    assert(math.abs(outage.getDouble(3) + 7.0) < 1e-12)
    // the hour after the outage sees a forecast pulled DOWN by the 0
    assert(rows(7).getDouble(2) < 7.0)
    assert(rows(7).getDouble(3) > 0.0)
  }

  test("step series: the smoother lags the step and decays toward it") {
    // 6 hours at 5, then 6 hours at 20 — right after the step the
    // forecast still reflects the old level (positive residual that
    // shrinks as the smoother catches up)
    val d = hourlyEvents(Seq.fill(6)(5) ++ Seq.fill(6)(20))
    val rows = EventsQueries.ewmaForecast(spark, d.toString).collect()
    val resid = rows.map(r =>
      if (r.isNullAt(3)) Double.NaN else r.getDouble(3))
    assert(resid(6) > 10.0, s"step residual ${resid(6)}")
    // catching up: residual decreases monotonically after the step
    (7 until 12).foreach { i =>
      assert(resid(i) < resid(i - 1), s"resid not decaying at $i")
      assert(resid(i) > 0.0)
    }
  }
}
