package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_benford_audit: a Benford-conforming series must sit under the
  * chi-square critical value and a fabricated uniform-digit series
  * must blow past it — the discrimination the audit exists for. */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  private val Chi2Critical = 15.5 // 8 df, alpha = 0.05

  private def eventsOf(values: Seq[Double]): java.nio.file.Path = {
    val d = tmpDir("graft-benford")
    val df = values.zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf("2024-03-04 10:00:00"),
        1L, "purchase", v, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    writeFixture(d, "events", df)
    d
  }

  test("a Benford-conforming series passes the chi-square screen") {
    // exponential growth covers several orders of magnitude uniformly
    // in log space — the canonical Benford-generating process
    val vals = (0 until 2000).map(i => math.pow(10.0, 0.5 + i * 0.002))
    val rows = EventsQueries.benfordAudit(spark, eventsOf(vals).toString)
      .collect()
    assert(rows.length == 9)
    val chi2 = rows.map(_.getDouble(4)).sum
    assert(chi2 < Chi2Critical, s"chi2 $chi2")
    // digit 1 carries the most mass, digit 9 the least
    val byDigit = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDigit(1L) > byDigit(9L))
  }

  test("a fabricated uniform-digit series blows the screen") {
    // every first digit equally likely — the invented-numbers tell
    val vals = (0 until 2000).map(i => (1 + i % 9) * 100.0 + (i % 7))
    val rows = EventsQueries.benfordAudit(spark, eventsOf(vals).toString)
      .collect()
    val chi2 = rows.map(_.getDouble(4)).sum
    assert(chi2 > 10.0 * Chi2Critical, s"chi2 $chi2")
  }
}
