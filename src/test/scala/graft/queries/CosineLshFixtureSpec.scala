package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The differentiator between the two embedding-dedup blockings:
  * label blocking ([[DedupQueries.embeddingCosine]]) can never pair
  * vectors from different labels, while hyperplane-LSH blocking
  * ([[DedupQueries.cosineLsh]]) buckets by DIRECTION — an identical
  * vector duplicated under another label must be caught by the LSH
  * variant and provably missed by the label variant. */
class CosineLshFixtureSpec extends SparkSpec {
  import spark.implicits._

  test("cross-label duplicate: caught by LSH blocking, missed by label blocking") {
    val dir = tmpDir("graft-lsh-fix")
    // two identical embeddings under DIFFERENT labels (the cross-label
    // dup), plus orthogonal-ish noise rows and a zero vector that must
    // be ignored (NaN-cosine guard)
    val base = Array.tabulate(64)(i => if (i % 7 == 0) 1.0f else 0.1f)
    val other = Array.tabulate(64)(i => if (i % 2 == 0) -1.0f else 0.8f)
    val rows = Seq(
      (10L, base, 0),
      (20L, base, 1), // same direction, different label
      (30L, other, 0),
      (40L, Array.fill(64)(0.0f), 1)) // zero vector
    writeFixture(dir, "embeddings",
      rows.toDF("vec_id", "embedding", "label"))

    val lsh = DedupQueries.cosineLsh(spark, dir.toString).collect()
    val lshPairs = lsh.map(r =>
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(lshPairs.contains((10L, 20L)), s"cross-label dup missed: $lshPairs")
    // the zero vector pairs with nothing (cosine undefined, excluded)
    assert(lsh.forall(r =>
      r.getAs[Long]("vec_a") != 40L && r.getAs[Long]("vec_b") != 40L))
    // every reported pair really clears the threshold (exact verify)
    assert(lsh.forall(r => r.getAs[Double]("cosine") >= 0.4))

    val labelBlocked = DedupQueries.embeddingCosine(spark, dir.toString)
      .collect().map(r =>
        (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(!labelBlocked.contains((10L, 20L)),
      "label blocking unexpectedly paired across labels")
  }
}
