package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_cuped: planted pre/post correlation must be harvested; the
  * published numbers must satisfy the CUPED identity. */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(users: Seq[(Long, Double, Double)])
      : java.nio.file.Path = {
    val d = tmpDir("graft-cuped")
    var id = 0L
    val rows = users.flatMap { case (u, pre, post) =>
      Seq((pre, "2024-01-05 10:00:00"), (post, "2024-01-20 10:00:00"))
        .filter(_._1 > 0).map { case (v, ts) =>
          id += 1
          (id, Timestamp.valueOf(ts), u, "purchase", v, """{"k":1}""")
        }
    }
    writeFixture(d, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    d
  }

  test("strongly correlated pre-period removes most metric variance") {
    // post = 2*pre + small wiggle: correlation ~1, CUPED should
    // recover nearly all of the variance
    val users = (1L to 40L).map { u =>
      val pre = 10.0 + u
      (u, pre, 2.0 * pre + (u % 3).toDouble * 0.1)
    }
    val r = EventsQueries.cuped(spark, eventsOf(users).toString)
      .collect().head
    assert(r.getLong(0) == 40L)
    assert(r.getDouble(4) > 0.98, s"reduction ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(1) - 2.0) < 0.01, s"theta ${r.getDouble(1)}")
  }

  test("uncorrelated pre-period yields near-zero reduction; identity holds") {
    // pre cycles with period 4, post with period 5 -> near-orthogonal
    val users = (1L to 40L).map { u =>
      ((u, 10.0 + (u % 4).toDouble, 50.0 + (u % 5).toDouble * 3)) }
    val r = EventsQueries.cuped(spark, eventsOf(users).toString)
      .collect().head
    assert(r.getDouble(4) < 0.1, s"spurious reduction ${r.getDouble(4)}")
    // CUPED identity: var_reduction == corr^2 (up to fp)
    val rho = r.getDouble(5)
    assert(math.abs(r.getDouble(4) - rho * rho) < 1e-9)
    // and on real data too
    val real = EventsQueries
      .cuped(spark, "/root/testdata/sf0.001").collect().head
    val rr = real.getDouble(5)
    assert(math.abs(real.getDouble(4) - rr * rr) < 1e-9)
    assert(real.getDouble(3) <= real.getDouble(2))
  }
}
