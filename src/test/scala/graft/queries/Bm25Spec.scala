package graft.queries

import graft.SparkSpec

/** From-first-principles check of `txt_bm25_topk`: the DuckDB oracle
  * restates the same relational formulation, so a shared FORMULA error
  * (wrong idf smoothing, swapped k1/b, missing length normalization)
  * would hash-match anyway. This spec recomputes Okapi BM25 directly
  * from the definition in plain Scala over a seeded fixture corpus —
  * same space tokenizer, k1 = 1.2, b = 0.75, +1-smoothed idf, and the
  * same micro-quantization (both sides run on one JVM, so identical
  * double ops give identical bits) — and demands the full
  * (q_id, doc_id, score_pico, rank) result set match exactly.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  /** 60 seeded docs over a 24-word vocabulary; doc_id % 50 == 0 makes
    * docs 0 and 50 the registered query set. */
  private lazy val dir = {
    val d = tmpDir("graft-bm25")
    val docs = fixtureDocs
      .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docs)
    d
  }

  private lazy val fixtureDocs: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu",
      "xi", "omicron", "pi", "rho", "sigma", "tau", "upsilon", "phi",
      "chi", "psi", "omega")
    (0L until 60L).map { id =>
      val n = 5 + rnd.nextInt(26)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  /** Direct BM25 from the definition (not a restatement of the query's
    * relational shape): per-query loop over candidate docs. */
  private def bruteBm25: Seq[(Long, Long, Long, Long)] = {
    val tf: Map[(Long, String), Long] = fixtureDocs
      .flatMap { case (id, t) => t.split(" ").map(w => (id, w)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val dl: Map[Long, Long] =
      tf.groupBy(_._1._1).map { case (id, m) => id -> m.values.sum }
    val nDocs = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nDocs.toDouble
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    def idfMicro(w: String): Long =
      math.round(math.log(((nDocs - df(w)).toDouble + 0.5) /
        (df(w).toDouble + 0.5) + 1.0) * 1e6)
    def tfPartMicro(doc: Long, w: String): Long = {
      val f = tf((doc, w)).toDouble
      math.round(f * 2.2 /
        (f + 1.2 * (0.25 + 0.75 * (dl(doc).toDouble / avgdl))) * 1e6)
    }
    for {
      q <- Seq(0L, 50L)
      qTerms = fixtureDocs.find(_._1 == q).get._2.split(" ").distinct.toSeq
      scored = dl.keys.filter(_ != q).toSeq
        .map { doc =>
          val s = qTerms.filter(w => tf.contains((doc, w)))
            .map(w => idfMicro(w) * tfPartMicro(doc, w)).sum
          (doc, s)
        }
        .filter(_._2 > 0)
        .sortBy { case (doc, s) => (-s, doc) }
        .take(10)
      ((doc, s), i) <- scored.zipWithIndex
    } yield (q, doc, s, (i + 1).toLong)
  }

  test("txt_bm25_topk equals BM25 computed directly from the definition") {
    val got = TextQueries.bm25TopK(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_pico"), r.getAs[Long]("rank"))).toSeq
    val want = bruteBm25
    assert(got.size == want.size, s"sizes: got ${got.size}, want ${want.size}")
    assert(got.sorted == want.sorted,
      s"mismatch:\n got=${got.sorted.take(5)}\nwant=${want.sorted.take(5)}")
  }
}
