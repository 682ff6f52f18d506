package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_trend_theil_sen: the median-of-slopes estimator must recover a
  * planted linear trend exactly and hold it against outliers that
  * would bend a least-squares fit. */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  private def eventsAt(rows: Seq[(Int, Double)]): java.nio.file.Path = {
    val d = tmpDir("graft-tsen")
    val df = rows.zipWithIndex.map { case ((h, v), i) =>
      (i.toLong, Timestamp.valueOf(f"2024-03-03 $h%02d:10:00"),
        1L, "purchase", v, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    writeFixture(d, "events", df)
    d
  }

  test("a clean linear trend is recovered exactly") {
    // x(h) = 100 + 7h -> slope 7e6 micro/hour
    val dir = eventsAt((0 until 12).map(h => (h, 100.0 + 7.0 * h)))
    val r = EventsQueries.trendTheilSen(spark, dir.toString).head()
    assert(r.getDouble(0) == 7e6, s"slope ${r.getDouble(0)}")
    assert(r.getLong(2) == 12L * 11L / 2L)
  }

  test("two gross outliers do not bend the slope") {
    val clean = (0 until 12).map(h => (h, 100.0 + 7.0 * h))
    // hours 3 and 8 spiked 100x
    val dirty = clean.map { case (h, v) =>
      if (h == 3 || h == 8) (h, v * 100.0) else (h, v)
    }
    val r = EventsQueries.trendTheilSen(spark, eventsAt(dirty).toString).head()
    val slope = r.getDouble(0)
    // the median slope stays within 15% of the true 7e6 — an OLS fit
    // on the same data lands wildly off (the outliers carry ~99% of
    // the total variation)
    assert(math.abs(slope - 7e6) < 0.15 * 7e6, s"slope $slope")
  }
}
