package graft.queries

import graft.SparkSpec

/** The HLL++ sketch variant must track the exact distincts within its
  * configured relative standard deviation (0.5% -> allow 3 sigma). */
class ApproxSpec extends SparkSpec {

  test("approx hourly distincts stay within 1.5% of exact") {
    val dir = "/root/testdata/sf0.01"
    val exact = EventsQueries.hourlyMetrics(spark, dir).collect()
      .map(r => r.getAs[Long]("hour_us") ->
        (r.getAs[Long]("new_sessions"), r.getAs[Long]("active_users"))).toMap
    val approx = EventsQueries.hourlyMetricsApprox(spark, dir).collect()
      .map(r => r.getAs[Long]("hour_us") ->
        (r.getAs[Long]("new_sessions_approx"), r.getAs[Long]("active_users_approx"))).toMap
    assert(exact.keySet == approx.keySet)
    for ((h, (exS, exU)) <- exact) {
      val (apS, apU) = approx(h)
      assert(math.abs(apS - exS) <= math.max(1L, (exS * 0.015).toLong), s"sessions @ $h")
      assert(math.abs(apU - exU) <= math.max(1L, (exU * 0.015).toLong), s"users @ $h")
    }
  }

  test("sketch-merged DAU/WAU/MAU stay within 3% of exact") {
    // lgK=14 -> rsd ~0.8%; 3 sigma + union slack -> 3%. The WAU/MAU
    // columns go through hll_union_agg, so this also pins that the
    // calendar-sized sketch merges estimate the same windows the exact
    // twin's (day,user)-grain explode counts.
    val dir = "/root/testdata/sf0.01"
    val exact = EventsQueries.activeUsers(spark, dir).collect()
      .map(r => r.getAs[Long]("day_us") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("mau")))
      .toMap
    val approx = EventsQueries.activeUsersApprox(spark, dir).collect()
      .map(r => r.getAs[Long]("day_us") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("mau")))
      .toMap
    assert(exact.keySet == approx.keySet)
    def ok(ap: Long, ex: Long): Boolean =
      math.abs(ap - ex) <= math.max(1L, (ex * 0.03).toLong)
    for ((d, (exD, exW, exM)) <- exact) {
      val (apD, apW, apM) = approx(d)
      assert(ok(apD, exD), s"dau @ $d: $apD vs $exD")
      assert(ok(apW, exW), s"wau @ $d: $apW vs $exW")
      assert(ok(apM, exM), s"mau @ $d: $apM vs $exM")
    }
  }
}
