package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_transition_matrix + ev_bootstrap_ci invariants on hand-built
  * fixtures where the right answer is known in closed form. */
class TransitionBootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, String, Long, String, Double)])
      : java.nio.file.Path = {
    val d = tmpDir("graft-transboot")
    val df = rows.map { case (id, ts, user, typ, v) =>
      (id, Timestamp.valueOf(ts), user, typ, v, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    writeFixture(d, "events", df)
    d
  }

  test("transition matrix counts exactly the consecutive per-user pairs") {
    // user 1: view -> click -> purchase; user 2: view -> view.
    // Cross-user pairs (purchase->view) must NOT appear.
    val d = eventsOf(Seq(
      (1L, "2024-03-04 10:00:00", 1L, "view", 1.0),
      (2L, "2024-03-04 10:01:00", 1L, "click", 1.0),
      (3L, "2024-03-04 10:02:00", 1L, "purchase", 1.0),
      (4L, "2024-03-04 10:00:30", 2L, "view", 1.0),
      (5L, "2024-03-04 10:03:00", 2L, "view", 1.0)))
    val rows = EventsQueries.transitionMatrix(spark, d.toString).collect()
    val m = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m.keySet == Set(("view", "click"), ("click", "purchase"),
      ("view", "view")))
    assert(m(("view", "click")) == ((1L, 2L, 0.5)))
    assert(m(("view", "view")) == ((1L, 2L, 0.5)))
    assert(m(("click", "purchase")) == ((1L, 1L, 1.0)))
  }

  test("transition probabilities row-normalize to 1 on real data") {
    val rows = EventsQueries
      .transitionMatrix(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, grp) =>
      val p = grp.map(_.getDouble(4)).sum
      assert(math.abs(p - 1.0) < 1e-9, s"$from sums to $p")
      // n_from is the same row total on every row of the group
      assert(grp.map(_.getLong(3)).distinct.length == 1)
      assert(grp.map(_.getLong(2)).sum == grp.head.getLong(3))
    }
  }

  test("bootstrap over a constant sample collapses to a point") {
    // every replicate mean of a constant-valued sample is that
    // constant regardless of the Poisson weights -> CI = [c, c]
    val d = eventsOf((0 until 500).map(i =>
      (i.toLong, "2024-03-04 10:00:00", 1L, "purchase", 42.5)))
    val r = EventsQueries.bootstrapCi(spark, d.toString).collect().head
    assert(r.getLong(0) == 500L)
    assert(r.getDouble(1) == 42.5)
    assert(r.getDouble(2) == 42.5 && r.getDouble(3) == 42.5)
  }

  test("bootstrap CI brackets the point estimate and orders correctly") {
    val r = EventsQueries.bootstrapCi(spark, "/root/testdata/sf0.001")
      .collect().head
    val (n, mean, lo, hi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    assert(lo < hi)
    assert(lo <= mean && mean <= hi)
    // a 95% CI of a mean over n samples should be a small fraction of
    // the mean itself, not degenerate or enormous
    assert((hi - lo) / mean < 0.5)
  }
}
