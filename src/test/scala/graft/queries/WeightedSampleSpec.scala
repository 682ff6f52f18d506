package graft.queries

import java.security.MessageDigest

import graft.SparkSpec

/** util_weighted_sample is verified two ways:
  *
  *  - from-definition: an independent pure-Scala reimplementation of
  *    the Efraimidis–Spirakis key (md5→uniform, −ln(u)/w, nano
  *    quantization) over the collected sf0.001 docs must reproduce
  *    the query's exact rows — any engine-side formula drift breaks
  *    byte equality;
  *  - the sampling MATH: the exponential-race winner is distributed
  *    w_i/Σw (the property that makes the top-K an actual weighted
  *    sample without replacement, not just a deterministic pick).
  *    Simulated over thousands of independent hash seeds, empirical
  *    win rates must sit on the theoretical weights.
  */
class WeightedSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Pure-Scala twin of TextFunctions.h60. */
  private def h60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def key(s: String, w: Long): Long = {
    val u = (h60(s) + 1L).toDouble / 1152921504606846976L.toDouble
    math.round(-math.log(u) / w.toDouble * 1e9)
  }

  test("query rows equal an independent from-definition computation") {
    val got = ProfileQueries.weightedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "doc_id", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = docs.filter(_._3 > 0)
      .map { case (src, id, nc, text) => (src, id, nc, key(text, nc)) }
      .groupBy(_._1).toSeq
      .flatMap { case (src, rows) =>
        rows.sortBy(r => (r._4, r._2)).take(20).zipWithIndex
          .map { case ((_, id, nc, k), i) => (src, (i + 1).toLong, id, nc, k) }
      }
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("race winner frequency matches w_i / sum(w) — it IS weighted sampling") {
    val weights = Seq(1L, 2L, 3L, 4L) // sum 10
    val trials = 4000
    val wins = Array.fill(weights.size)(0)
    for (seed <- 0 until trials) {
      val winner = weights.zipWithIndex
        .map { case (w, i) => (key(s"item$i|seed$seed", w), i) }.min._2
      wins(winner) += 1
    }
    weights.zipWithIndex.foreach { case (w, i) =>
      val expected = w.toDouble / 10.0
      val got = wins(i).toDouble / trials
      // sd = sqrt(p(1-p)/n) <= 0.0077 at n=4000; 0.03 is ~4 sigma
      assert(math.abs(got - expected) < 0.03,
        s"item $i: got $got, expected $expected")
    }
  }
}
