package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests for the custom join operators: on random inputs the
  * distributed formulations must equal a brute-force reference
  * computed driver-side. Seeded generation (no scalatestplus bridge in
  * the offline cache). */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  // (id, key, t) with deliberately clustered keys/times to force
  // collisions, boundary hits, and empty keys
  private def gen(rnd: Random, n: Int): Seq[(Long, Long, Long)] =
    (1 to n).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong))

  test("RangeJoin.withinTolerance equals brute force on random inputs") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val tol = 1 + rnd.nextInt(300)
      val ls = gen(rnd, 60)
      val rs = gen(rnd, 60)
      val expected = (for {
        (lid, lk, lt) <- ls
        (rid, rk, rt) <- rs
        if lk == rk && math.abs(lt - rt) <= tol
      } yield (lid, rid)).toSet
      val got = RangeJoin.withinTolerance(
          ls.toDF("id", "k", "t"),
          rs.toDF("rid", "k", "t"),
          "k", "t", tol)
        .select("id", "rid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed tol=$tol")
    }
  }

  test("SaltedJoin.inner equals the plain join on forced-hot-key skew") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed + 200)
      // ~80% of fact rows hammer one hot key; seq (not set) compare so
      // a replication bug that duplicates output rows fails loudly
      val hot = rnd.nextInt(5).toLong
      val fact = (1 to 400).map { i =>
        (i.toLong, if (rnd.nextInt(5) > 0) hot else rnd.nextInt(10).toLong)
      }
      val dim = (0L to 9L).map(k => (k, s"d$k"))
      val expected = (for {
        (id, k) <- fact; (dk, label) <- dim if dk == k
      } yield (id, label)).sorted
      val got = SaltedJoin.inner(
          fact.toDF("row_id", "k"), dim.toDF("k", "label"), "k", salts = 4)
        .select("row_id", "label").as[(Long, String)].collect().toSeq.sorted
      assert(got == expected, s"seed=$seed hot=$hot")
    }
  }

  test("IntervalJoin.following equals brute force on random inputs") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed + 300)
      val h = 1 + rnd.nextInt(300)
      val ls = gen(rnd, 60)
      val rs = gen(rnd, 60)
      val expected = (for {
        (lid, lk, lt) <- ls
        (rid, rk, rt) <- rs
        if lk == rk && rt >= lt && rt < lt + h
      } yield (lid, rid)).toSet
      val got = IntervalJoin.following(
          ls.toDF("id", "k", "t"), rs.toDF("rid", "rk", "rt"),
          "k", "rk", "t", "rt", lit(h.toLong))
        .select("id", "rid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed h=$h")
    }
  }

  test("AsofJoin.backward equals brute force on random inputs") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed + 100)
      val ls = gen(rnd, 60)
      // right rows carry a payload; unique (key, t) pairs so the
      // brute-force argmax is well-defined (SQL ASOF leaves ties
      // unspecified, see operator scaladoc)
      val rs = gen(rnd, 60).map { case (id, k, t) => (k, t, id * 10.0) }
        .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      val expected = ls.map { case (lid, lk, lt) =>
        val prior = rs.filter(r => r._1 == lk && r._2 <= lt)
        lid -> (if (prior.isEmpty) None
          else Some(prior.maxBy(_._2)._3))
      }.toMap
      val got = AsofJoin.backward(
          ls.toDF("id", "k", "t"),
          rs.toDF("k", "t", "px"),
          "k", "t")
        .select("id", "px").as[(Long, Option[Double])].collect().toMap
      assert(got == expected, s"seed=$seed")
    }
  }
}
