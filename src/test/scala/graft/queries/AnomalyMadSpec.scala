package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_anomaly_mad: the robust detector must flag a planted spike that
  * a mean-based threshold would dilute, and stay silent (with a NULL
  * score) on a constant series. */
class AnomalyMadSpec extends SparkSpec {
  import spark.implicits._

  private def eventsAt(rows: Seq[(Int, Double)]): java.nio.file.Path = {
    // one event per (hour offset, value) on a fixed day
    val d = tmpDir("graft-mad")
    val df = rows.zipWithIndex.map { case ((h, v), i) =>
      (i.toLong, Timestamp.valueOf(f"2024-03-01 $h%02d:30:00"),
        (i % 7).toLong, "purchase", v, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    writeFixture(d, "events", df)
    d
  }

  test("a planted spike is flagged; quiet hours are not") {
    // 20 quiet hours around 100, one 10x spike at hour 20
    val quiet = (0 until 20).map(h => (h, 100.0 + (h % 5)))
    val dir = eventsAt(quiet :+ (20, 1000.0))
    val rows = EventsQueries.anomalyMad(spark, dir.toString).collect()
    assert(rows.length == 21)
    val flagged = rows.filter(_.getLong(5) == 1L).map(_.getLong(0)).toSeq
    val spikeUs = Timestamp.valueOf("2024-03-01 20:00:00").getTime * 1000L
    assert(flagged == Seq(spikeUs), s"flagged $flagged")
    // the spike's robust score is huge; quiet scores are small
    val spikeScore = rows.find(_.getLong(0) == spikeUs).get.getDouble(4)
    assert(spikeScore > 50.0, s"spike score $spikeScore")
  }

  test("constant series: MAD = 0, score NULL, nothing flagged") {
    val dir = eventsAt((0 until 10).map(h => (h, 42.0)))
    val rows = EventsQueries.anomalyMad(spark, dir.toString).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.isNullAt(4)), "scores must be NULL at MAD=0")
    assert(rows.forall(_.getLong(5) == 0L), "constant series has no anomalies")
  }

  test("robustness: the spike does not drag the baseline (median stays quiet-level)") {
    val quiet = (0 until 20).map(h => (h, 100.0 + (h % 5)))
    val dir = eventsAt(quiet :+ (20, 1000.0))
    val med = EventsQueries.anomalyMad(spark, dir.toString)
      .select("med").head().getDouble(0)
    // median in micro units: stays near 100e6 despite the 1000 spike
    assert(med > 90e6 && med < 110e6, s"median $med")
  }
}
