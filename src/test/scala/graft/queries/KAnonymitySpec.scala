package graft.queries

import graft.SparkSpec

/** util_k_anonymity: every published class must actually reach k (the
  * whole point of the audit), rows must be conserved through the
  * generalization ladder, and each ladder level must engage exactly
  * where the hierarchy says it should. */
class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  private val K = 5

  /** Two regions, four nations; three engineered segments:
    * SOLID — 6 customers in one nation (stays at level 0),
    * SPREAD — 2 customers in each of nations 0..2 (nation classes < k,
    * region AMERICA class = 6 ≥ k → level 1),
    * LONER — 1 customer in nation 3 / region ASIA (even (LONER, ASIA)
    * is 1 < k → suppressed level 2). */
  private lazy val dir = {
    val d = tmpDir("graft-kanon")
    writeFixture(d, "region",
      Seq((0L, "AMERICA"), (1L, "ASIA")).toDF("r_regionkey", "r_name"))
    writeFixture(d, "nation",
      Seq((0L, "CANADA", 0L), (1L, "BRAZIL", 0L), (2L, "PERU", 0L),
        (3L, "JAPAN", 1L))
        .toDF("n_nationkey", "n_name", "n_regionkey"))
    val custs =
      (0 until 6).map(i => (100L + i, "SOLID", 0L)) ++
        (0 until 6).map(i => (200L + i, "SPREAD", (i % 3).toLong)) ++
        Seq((300L, "LONER", 3L))
    writeFixture(d, "customer",
      custs.toDF("c_custkey", "c_mktsegment", "c_nationkey"))
    d
  }

  test("each ladder level engages exactly where the hierarchy dictates") {
    val rows = ProfileQueries.kAnonymity(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSet == Set(
      (0L, "SOLID", "CANADA", 6L),
      (1L, "SPREAD", "AMERICA", 6L),
      (2L, "*", "*", 1L)))
  }

  test("published classes reach k; rows are conserved (real data)") {
    val sf = "/root/testdata/sf0.001"
    val rows = ProfileQueries.kAnonymity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val nCust = graft.util.Tables.load(spark, sf, "customer").count()
    assert(rows.map(_._4).sum == nCust, "generalization must not drop rows")
    for ((level, seg, geo, n) <- rows if level < 2) {
      assert(n >= K, s"under-k class published: $level/$seg/$geo = $n")
      assert(seg != "*" && geo != "*")
    }
    // the only class allowed below k is the terminal suppressed bucket
    val suppressed = rows.filter(_._1 == 2L)
    assert(suppressed.forall(r => r._2 == "*" && r._3 == "*"))
    assert(suppressed.size <= 1)
  }
}
