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
}
