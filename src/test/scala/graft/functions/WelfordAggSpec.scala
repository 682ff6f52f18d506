package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WelfordAggSpec extends SparkSpec {
  import spark.implicits._

  private def relErr(a: Double, b: Double): Double =
    math.abs(a - b) / math.max(1e-300, math.abs(b))

  test("matches built-in avg/var_samp on the events values") {
    val ev = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("value")).na.drop()
    val w = udaf(WelfordAgg)
    val row = ev.agg(
      w(col("value")).as("wf"),
      avg(col("value")).as("m"),
      var_samp(col("value")).as("v")).head
    val (wm, wv) = (row.getStruct(0).getDouble(0), row.getStruct(0).getDouble(1))
    assert(relErr(wm, row.getDouble(1)) < 1e-12)
    assert(relErr(wv, row.getDouble(2)) < 1e-9)
  }

  test("pairwise merge is order-robust and matches single-pass reduce") {
    val xs = (1 to 4096).map(i => 1e9 + math.sin(i) * 3.0) // mean >> stddev
    val whole = xs.foldLeft(WelfordAgg.zero)(WelfordAgg.reduce)
    // merge in two different split orders
    val parts = xs.grouped(1000)
      .map(_.foldLeft(WelfordAgg.zero)(WelfordAgg.reduce)).toSeq
    val fwd = parts.reduce(WelfordAgg.merge)
    val rev = parts.reverse.reduce(WelfordAgg.merge)
    for (m <- Seq(fwd, rev)) {
      assert(m.n == whole.n)
      assert(relErr(m.mean, whole.mean) < 1e-14)
      assert(relErr(m.m2, whole.m2) < 1e-9)
    }
    // the catastrophic-cancellation regime: naive sum-of-squares loses
    // all variance digits here; Welford keeps ~9+
    val (_, v) = WelfordAgg.finish(whole)
    val exactVar = {
      val mean = xs.sum / xs.size
      xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1)
    }
    assert(relErr(v, exactVar) < 1e-9)
  }
}
