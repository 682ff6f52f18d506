package graft.queries

import graft.SparkSpec

/** util_ks_drift: the per-source two-sample KS row must report D = 1 on
  * disjoint supports, D = 0 on identical distributions, and obey the
  * statistic's identities on real data. */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, src: String, nTok: Int) =
    (id, Seq.fill(nTok)("w").mkString(" "), src)

  test("disjoint length supports: D = 1, test fires, at_len is the gap edge") {
    // source a: 20 docs of lengths 1..20; source b: 20 docs of 101..120.
    // ECDFs never overlap, so D = 1 for both sources; the max is first
    // attained at x = 20 (F_a = 1, F_b = 0), and crit at n=m=20 is
    // floor(1.358 * sqrt(40/400) * 1e6) = floor(429437.99..) = 429437 < 1e6.
    val rows = (1 to 20).map(i => doc(i.toLong, "a", i)) ++
      (1 to 20).map(i => doc(100L + i, "b", 100 + i))
    val d = tmpDir("graft-ks-disjoint")
    writeFixture(d, "documents", rows.toDF("doc_id", "text", "source"))
    val out = ProfileQueries.ksDrift(spark, d.toString).collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_docs") == 20L && r.getAs[Long]("n_rest") == 20L)
      assert(r.getAs[Long]("d_micro") == 1000000L, r)
      assert(r.getAs[Long]("crit_micro") == 429437L, r)
      assert(r.getAs[Boolean]("drifted"), r)
      assert(r.getAs[Long]("at_len") == 20L, r)
    }
  }

  test("identical length distributions: D = 0, test does not fire") {
    val rows = (1 to 20).map(i => doc(i.toLong, "a", 10 + (i % 5))) ++
      (1 to 20).map(i => doc(100L + i, "b", 10 + (i % 5)))
    val d = tmpDir("graft-ks-same")
    writeFixture(d, "documents", rows.toDF("doc_id", "text", "source"))
    val out = ProfileQueries.ksDrift(spark, d.toString).collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("d_micro") == 0L, r)
      assert(!r.getAs[Boolean]("drifted"), r)
    }
  }

  test("real corpus: statistic identities hold per source") {
    val out = ProfileQueries.ksDrift(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val n = out.head.getAs[Long]("n_docs") + out.head.getAs[Long]("n_rest")
    for (r <- out) {
      assert(r.getAs[Long]("n_docs") + r.getAs[Long]("n_rest") == n, r)
      val dM = r.getAs[Long]("d_micro")
      assert(dM >= 0L && dM <= 1000000L, r)
      assert(r.getAs[Long]("at_len") > 0L, r)
      assert(r.getAs[Boolean]("drifted") ==
        (dM > r.getAs[Long]("crit_micro")), r)
    }
  }
}
