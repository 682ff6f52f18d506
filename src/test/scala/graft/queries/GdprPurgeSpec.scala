package graft.queries

import graft.SparkSpec

/** util_gdpr_purge: the accounting must match the purge it predicts. */
class GdprPurgeSpec extends SparkSpec {
  import spark.implicits._

  // sf0.01: the smallest SF whose 15-user-per-mille hash draw yields a
  // nonempty request list (sf0.001 has 15 users, none at 0 mod 20)
  private val dir = "/root/testdata/sf0.01"

  test("accounting reconciles exactly with the anti-join purge") {
    val acct = ProfileQueries.gdprPurge(spark, dir).collect()
    val ev = graft.util.Tables.load(spark, dir, "events")
    val kept = ProfileQueries.gdprPurged(spark, dir)
    // kept rows == sum of n_kept; purged rows == the complement
    assert(kept.count() == acct.map(_.getLong(2)).sum)
    assert(ev.count() - kept.count() == acct.map(_.getLong(1)).sum)
    // no requesting user survives the purge
    val keptUsers = kept.select($"user_id").distinct()
      .as[Long].collect().toSet
    val reqUsers = ev.select($"user_id").distinct().as[Long].collect()
      .filter { u =>
        // same 20-bit md5 membership as the query
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
        val h60 = java.lang.Long.parseLong(
          md.take(8).map(b => f"$b%02x").mkString.take(15), 16)
        h60 % 20L == 0L
      }.toSet
    assert(reqUsers.nonEmpty, "fixture produced no erasure requests")
    assert(keptUsers.intersect(reqUsers).isEmpty)
    // distinct purged users reconcile
    assert(acct.map(_.getLong(4)).max <= reqUsers.size)
  }
}
