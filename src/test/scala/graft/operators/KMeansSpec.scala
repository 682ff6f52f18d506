package graft.operators

import graft.SparkSpec

/** Lloyd's invariants on the real embeddings table: every iteration's
  * inertia is no worse than the previous one, assignments partition
  * the corpus, and centroids keep the requested arity. */
class KMeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("inertia is non-increasing across Lloyd iterations") {
    val emb = graft.util.Tables.load(spark, dir, "embeddings")
    val (assigned, centroids, inertia) = KMeans.fit(emb, k = 8, iters = 3)
    assert(inertia.length == 3)
    inertia.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a * (1 + 1e-12), s"inertia rose: $inertia")
      case _ => ()
    }
    // assignments are a partition of the corpus
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    // centroid table keeps k rows of dim-length vectors
    val cents = centroids.collect()
    assert(cents.length == 8)
    assert(cents.forall(_.getSeq[Double](1).length == 64))
    // round-1 inertia agrees with the oracle-checked step query (same
    // seeds, same seed-assignment); the step quantizes d2 to 1e-6 and
    // formulates d2 as |x|^2+|c|^2-2x.c, so compare with a relative
    // tolerance
    val stepInertia = graft.queries.SimilarityQueries.kmeansStep(spark, dir)
      .select("inertia_q").collect().map(_.getLong(0)).sum / 1e6
    assert(math.abs(inertia.head - stepInertia) <= 1e-6 * stepInertia,
      s"fit ${inertia.head} vs step $stepInertia")
  }

  test("a cluster that goes empty keeps its centroid (k-row contract)") {
    import spark.implicits._
    // the two lowest vec_ids are IDENTICAL, so every point ties on d2
    // and the (d2, cent_id) tie-break starves seed 1 from round one —
    // the k-centroid contract must survive via carry-forward, exactly
    // as fitGrouped documents
    val emb = Seq(
      (0L, Array.fill(4)(1.0f)),
      (1L, Array.fill(4)(1.0f)),
      (2L, Array(1.1f, 1.0f, 1.0f, 1.0f)),
      (3L, Array(0.9f, 1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val (assigned, centroids, _) = KMeans.fit(emb, k = 2, iters = 2)
    val cents = centroids.collect()
    assert(cents.length == 2, cents.mkString(","))
    assert(cents.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
    // the starved seed keeps its ORIGINAL centroid vector
    val kept = cents.find(_.getLong(0) == 1L).get.getSeq[Double](1)
    assert(kept == Seq(1.0, 1.0, 1.0, 1.0))
    // and the assignment still covers every vector
    assert(assigned.count() == 4)
  }
}
