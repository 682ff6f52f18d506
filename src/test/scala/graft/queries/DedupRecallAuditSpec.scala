package graft.queries

import graft.SparkSpec

/** dedup_recall_audit: the audit must be exactly consistent with its
  * two parent queries — every exact pair accounted once, hits only
  * for pairs the banded set really contains, recall arithmetic exact. */
class DedupRecallAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("audit rows reconcile exactly with the parent pair queries") {
    val rows = DedupQueries.dedupRecallAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)

    val exact = DedupQueries.prefixJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val caught = DedupQueries.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // totals: every exact pair lands in exactly one band
    assert(rows.map(_._2).sum == exact.length)
    // per-band reconstruction from the parents
    val want = exact
      .groupBy { case (_, _, j) => math.min(math.floor(j * 10), 9.0).toLong }
      .map { case (band, g) =>
        val hit = g.count { case (a, b, _) => caught((a, b)) }.toLong
        (band, g.length.toLong, hit, hit * 10000L / g.length)
      }.toSeq.sortBy(_._1)
    assert(rows.toSeq == want)
    // hits never exceed the band size
    rows.foreach { case (_, n, h, bp) =>
      assert(h <= n); assert(bp <= 10000L)
    }
  }
}
