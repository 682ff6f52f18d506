package graft.queries

import graft.SparkSpec

/** ann_ir_metrics: the label-relevance IR table must obey its integer
  * arithmetic identities on real data, and report hand-computed
  * nDCG/MRR/P@k values on a planted geometry where the exact ranking
  * is certain. */
class IrMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("real corpus: metric identities hold per query and tier") {
    val rows = SimilarityQueries.irMetrics(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; t <- Seq("exact", "lsh")) {
      val nRel = r.getAs[Long](s"n_rel_$t")
      assert(nRel >= 0L && nRel <= 10L, s"$t: $r")
      assert(nRel <= r.getAs[Long]("n_rel_corpus"), s"$t: $r")
      // P@10 is exactly n_rel/10 in bp
      assert(r.getAs[Long](s"p10_bp_$t") == nRel * 1000L, s"$t: $r")
      // a first relevant rank exists iff any relevant was retrieved,
      // and MRR is then in [1e6/10, 1e6]
      val mrr = r.getAs[Long](s"mrr_micro_$t")
      assert((mrr > 0L) == (nRel > 0L), s"$t: $r")
      if (nRel > 0L) assert(mrr >= 100000L && mrr <= 1000000L, s"$t: $r")
      val ndcg = r.getAs[Long](s"ndcg_bp_$t")
      assert(ndcg >= 0L && ndcg <= 10000L, s"$t: $r")
      assert((ndcg > 0L) == (nRel > 0L), s"$t: $r")
    }
  }

  test("planted ranking: hand-computed nDCG/MRR/P@k for the exact tier") {
    // query = e1; corpus member i (i = 1..49) has cosine 0.99 - 0.01*i
    // to the query, so the exact rank of member i is exactly i.
    // Members 1 and 3 share the query's label: relevant at ranks 1,3.
    val rows = (0 until 50).map { i =>
      if (i == 0)
        (0L, "R", Array(1f) ++ Array.fill(63)(0f))
      else {
        val c = (0.99 - 0.01 * i).toFloat
        val v = Array(c, math.sqrt(1.0 - c.toDouble * c).toFloat) ++
          Array.fill(62)(0f)
        (i.toLong, if (i == 1 || i == 3) "R" else s"n$i", v)
      }
    }
    val d = tmpDir("graft-irmetrics")
    writeFixture(d, "embeddings", rows.toDF("vec_id", "label", "embedding"))
    val out = SimilarityQueries.irMetrics(spark, d.toString).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_rel_corpus") == 2L)
    assert(r.getAs[Long]("n_rel_exact") == 2L)
    assert(r.getAs[Long]("p10_bp_exact") == 2000L)
    assert(r.getAs[Long]("mrr_micro_exact") == 1000000L)
    // DCG = W1 + W3 = 1000000 + 500000; IDCG = W1 + W2 = 1630930
    // floor(1500000 * 10000 / 1630930) = 9197
    assert(r.getAs[Long]("ndcg_bp_exact") == 9197L)
  }
}
