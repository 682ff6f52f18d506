package graft.queries

import graft.SparkSpec

/** ANN behavior on the real sf0.001 embeddings: the brute-force path
  * is ground truth; LSH must return correctly-ranked subsets of its
  * own buckets with reasonable top-1 agreement. */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Double)]] =
    df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("n_id"), r.getAs[Double]("cosine")))
      .groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.sortBy(_._2).map(t => (t._3, t._4)).toSeq
      }

  test("brute-force top-k is correctly ranked and complete") {
    val res = topk(SimilarityQueries.bruteTopK(spark, dir))
    assert(res.nonEmpty)
    for ((q, neighbors) <- res) {
      assert(neighbors.size == 10, s"query $q")
      val cosines = neighbors.map(_._2)
      assert(cosines == cosines.sortBy(-_), s"query $q not rank-ordered")
      assert(!neighbors.map(_._1).contains(q), "self match")
    }
  }

  test("LSH top-k ranks within buckets consistently with brute force") {
    val brute = topk(SimilarityQueries.bruteTopK(spark, dir))
    val lsh = topk(SimilarityQueries.lshTopK(spark, dir))
    assert(lsh.nonEmpty)
    for ((q, neighbors) <- lsh) {
      val cosines = neighbors.map(_._2)
      assert(cosines == cosines.sortBy(-_), s"query $q not rank-ordered")
      // every LSH hit must score exactly what brute force scored it
      val bruteScores = brute(q).toMap
      for ((n, c) <- neighbors if bruteScores.contains(n))
        assert(bruteScores(n) == c, s"cosine mismatch q=$q n=$n")
    }
    // bucketing must cut candidate work: if bucketCode regressed to a
    // constant, every query would land in one giant bucket — the bucket
    // column in the output must show a spread
    assert(lsh.values.forall(_.size <= 10))
    val buckets = SimilarityQueries.lshTopK(spark, dir)
      .select("bucket").distinct().count()
    assert(buckets >= 2, s"all LSH queries share $buckets bucket(s) — no pruning")
  }
}
