package graft.queries

import graft.SparkSpec

/** txt_winnowing: the Schleimer guarantee, the density bound, and
  * bit-equality with a direct reference winnow. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16 // SpanL
  private val W = 8  // WinnowW

  private def corpus(docsArg: Seq[(Long, Seq[String])]): java.nio.file.Path = {
    val d = tmpDir("graft-winnow")
    val rows = docsArg.map { case (id, toks) =>
      val text = toks.mkString(" ")
      (id, text, "en", s"src${id % 3}", text.length.toLong)
    }
    writeFixture(d, "documents",
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    d
  }

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Direct rightmost-min winnowing over a token list. */
  private def refWinnow(toks: Seq[String]): Set[(Long, Long)] = {
    val spans = (0 to toks.length - L)
      .map(i => h60(toks.slice(i, i + L).mkString(" ")))
    (0 to spans.length - W).map { i =>
      val win = spans.slice(i, i + W)
      val m = win.min
      // rightmost position achieving the min
      val pos = (i until i + W).filter(p => win(p - i) == m).max
      (pos.toLong, m)
    }.toSet
  }

  test("selected fingerprints equal the direct reference winnow") {
    val toks = (0 until 120).map(i => s"w${(i * 13) % 53}q$i")
    val d = corpus(Seq(0L -> toks))
    val got = TextQueries.winnowFingerprints(spark, d.toString)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == refWinnow(toks), "relational winnow != reference")
    assert(got.nonEmpty)
  }

  test("guarantee: a shared run of W+L-1 tokens shares a fingerprint") {
    val common = (0 until 30).map(i => s"shared${i}z") // 30 >= W+L-1=23
    val a = (0 until 40).map(i => s"a${i}x") ++ common ++
      (0 until 40).map(i => s"a${i}y")
    val b = (0 until 25).map(i => s"b${i}x") ++ common ++
      (0 until 55).map(i => s"b${i}y")
    val d = corpus(Seq(0L -> a, 1L -> b))
    val fps = TextQueries.winnowFingerprints(spark, d.toString).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(fps(0L).intersect(fps(1L)).nonEmpty,
      "no shared fingerprint despite a 30-token common run")
    // and the rollup reports the shared pressure
    val roll = TextQueries.winnowing(spark, d.toString).collect()
    assert(roll.map(_.getLong(5)).sum >= 2L)
  }

  test("density stays near the theoretical 2/(W+1)") {
    val out = TextQueries
      .winnowing(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val density = r.getDouble(4)
      assert(density > 0.10 && density < 0.40,
        s"density $density far from 2/(W+1)=${2.0 / (W + 1)}")
    }
  }
}
