package graft.queries

import graft.SparkSpec

/** txt_hybrid_rrf: fusion arithmetic and ranking invariants against
  * the two legs it fuses. */
class HybridRrfSpec extends SparkSpec {

  private lazy val fused =
    TextQueries.hybridRrf(spark, "/root/testdata/sf0.001").collect()

  test("every fused row recomputes from its leg ranks exactly") {
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val rs = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val rd = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(rs.nonEmpty || rd.nonEmpty, "row from neither leg")
      val expect = rs.map(x => 1000000L / (60L + x)).getOrElse(0L) +
        rd.map(x => 1000000L / (60L + x)).getOrElse(0L)
      assert(r.getLong(2) == expect, s"rrf mismatch on $r")
    }
  }

  test("per-query ranks are contiguous and ordered by fused score") {
    fused.groupBy(_.getLong(0)).foreach { case (q, grp) =>
      val byRank = grp.sortBy(_.getLong(5))
      assert(byRank.map(_.getLong(5)).toSeq == (1L to grp.length).toSeq)
      val scores = byRank.map(_.getLong(2)).toSeq
      assert(scores == scores.sorted(Ordering[Long].reverse), s"query $q")
      assert(grp.length <= 10)
    }
  }

  test("fusion promotes docs both legs agree on") {
    // any doc ranked by BOTH legs must outrank a doc seen by only one
    // leg at a worse single-leg rank: 2 votes beat 1 weaker vote
    fused.groupBy(_.getLong(0)).foreach { case (_, grp) =>
      val both = grp.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
      val solo = grp.filter(r => r.isNullAt(3) ^ r.isNullAt(4))
      for (b <- both; s <- solo) {
        val bBest = math.min(b.getLong(3), b.getLong(4))
        val sRank = if (s.isNullAt(3)) s.getLong(4) else s.getLong(3)
        if (bBest <= sRank)
          assert(b.getLong(5) < s.getLong(5),
            s"two-leg doc ${b.getLong(1)} behind one-leg ${s.getLong(1)}")
      }
    }
  }
}
