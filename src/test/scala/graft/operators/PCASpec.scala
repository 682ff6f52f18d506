package graft.operators

import graft.SparkSpec

/** Invariants of the deflated power-iteration basis on the real
  * embeddings table, plus bit-level agreement with the oracle-checked
  * one-step queries (same all-ones start, same fixed-point sums). */
class PCASpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("basis is orthonormal and returned in energy order") {
    val emb = graft.util.Tables.load(spark, dir, "embeddings")
    val comps = PCA.fit(emb, k = 3, iters = 3)
    assert(comps.map(_._1).sorted == Seq(0, 1, 2))
    // unit norms
    comps.foreach { case (i, v, _) =>
      assert(math.abs(math.sqrt(dot(v, v)) - 1.0) < 1e-12, s"comp $i norm")
    }
    // pairwise orthogonal: deflation removes each found direction
    for (Seq((i, a, _), (j, b, _)) <- comps.combinations(2).map(_.toSeq))
      assert(math.abs(dot(a, b)) < 1e-6, s"components $i,$j not orthogonal")
    // sorted by energy on return (finite power steps can extract
    // near-degenerate directions out of eigenvalue order — the sort is
    // the contract, extraction order survives in comp_id)
    val energies = comps.map(_._3)
    assert(energies == energies.sortBy(-_), energies.toString)
    assert(energies.forall(_ > 0.0))
  }

  test("first extraction is bit-equal to the power-iteration query step") {
    val emb = graft.util.Tables.load(spark, dir, "embeddings")
    val v1 = PCA.fit(emb, k = 1, iters = 1).head
    val q = graft.queries.SimilarityQueries.powerIteration(spark, dir)
      .collect().head
    // identical all-ones start + identical fixed-point accumulation ⇒
    // identical doubles, not just close ones
    assert(math.abs(v1._3 - q.getAs[Double]("anorm")) < 1e-12)
    for ((pos, name) <- Seq(0 -> "v1_0", 31 -> "v1_31", 63 -> "v1_63"))
      assert(math.abs(v1._2(pos) - q.getAs[Double](name)) < 1e-12,
        s"$name: ${v1._2(pos)} vs ${q.getAs[Double](name)}")
  }

  test("deflated second extraction is bit-equal to emb_pca2's audit row") {
    val emb = graft.util.Tables.load(spark, dir, "embeddings")
    val comps = PCA.fit(emb, k = 2, iters = 1)
    val q = graft.queries.SimilarityQueries.pca2(spark, dir).collect().head
    val v2 = comps.find(_._1 == 1).get
    assert(math.abs(v2._3 - q.getAs[Double]("anorm2")) < 1e-12)
    for ((pos, name) <- Seq(0 -> "v2_0", 31 -> "v2_31", 63 -> "v2_63"))
      assert(math.abs(v2._2(pos) - q.getAs[Double](name)) < 1e-12,
        s"$name: ${v2._2(pos)} vs ${q.getAs[Double](name)}")
  }
}
