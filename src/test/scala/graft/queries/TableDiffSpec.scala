package graft.queries

import graft.SparkSpec

/** util_table_diff: the four statuses must partition both sides, and
  * the synthetic mutation set must be detected exactly. */
class TableDiffSpec extends SparkSpec {

  test("statuses partition both table versions exactly") {
    val dir = "/root/testdata/sf0.001"
    val rows = ProfileQueries.tableDiff(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = graft.util.Tables.load(spark, dir, "customer").count()

    def cnt(s: String): Long = rows.getOrElse(s, 0L)
    // side A = base: removed + changed + unchanged
    assert(cnt("removed") + cnt("changed") + cnt("unchanged") == n)
    // side B: added + changed + unchanged
    val expectedAdded = graft.util.Tables.load(spark, dir, "customer")
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 103 === 0)
      .count()
    assert(cnt("added") == expectedAdded)
    // a key in BOTH mutation classes (key 0 divides everything) must
    // be counted exactly once: removal runs before the change branch,
    // so the totals above already balanced — additionally pin that
    // changed really is the 97-class minus the removed overlap
    val f = org.apache.spark.sql.functions
    val c = graft.util.Tables.load(spark, dir, "customer")
    val expectedChanged = c
      .filter(f.col("c_custkey") % 97 === 0 && f.col("c_custkey") % 101 =!= 0)
      .count()
    assert(cnt("changed") == expectedChanged)
  }
}
