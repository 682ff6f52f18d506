package graft.queries

import graft.SparkSpec

/** emb_whiten: the whitened coordinates must actually equalize the
  * energy the basis directions carry — the property that makes
  * whitening worth running before a quantizer. */
class WhitenSpec extends SparkSpec {
  import spark.implicits._

  /** Anisotropic fixture: isotropic noise plus one dominant direction
    * with ~5x the per-axis scale, so lambda1/lambda2 is large and the
    * one-step power basis locks onto the planted direction. The
    * direction has all-positive entries so its overlap with pca2's
    * all-ones start is large — a single power step then converges
    * (with a near-orthogonal direction one step would leave the basis
    * contaminated by the start vector; that is a documented property
    * of the 1-step basis, not of the whitening). */
  private lazy val dir = {
    val rnd = new scala.util.Random(17)
    val u = Array.fill(64)(math.abs(rnd.nextGaussian()).toFloat + 0.2f)
    val un = math.sqrt(u.map(x => x * x.toDouble).sum).toFloat
    val uu = u.map(x => x / un)
    val rows = (0 until 400).map { i =>
      val a = (rnd.nextGaussian() * 12.0).toFloat // dominant component
      val v = Array.tabulate(64)(j =>
        uu(j) * a + (rnd.nextGaussian() * 1.5).toFloat)
      (i.toLong, s"l${i % 4}", v.toSeq)
    }
    val d = tmpDir("graft-whiten")
    writeFixture(d, "embeddings", rows.toDF("vec_id", "label", "embedding"))
    d
  }

  private def moments(rows: Seq[(Double, Double)]): (Double, Double, Double) = {
    val n = rows.size.toDouble
    (rows.map(r => r._1 * r._1).sum / n,
      rows.map(r => r._2 * r._2).sum / n,
      rows.map(r => r._1 * r._2).sum / n)
  }

  test("whitening equalizes the planted anisotropy") {
    val w = SimilarityQueries.whiten2(spark, dir.toString).collect()
      .map(r => (r.getLong(1) / 1e6, r.getLong(2) / 1e6)).toSeq
    assert(w.size == 400)
    val (e11, e22, e12) = moments(w)
    // raw second moments along the fitted directions differ by the
    // planted ~lambda1/lambda2 (>> 1); whitened they must be near 1
    // and near each other
    // empirical whitening makes these 1 by construction, up to the
    // micro/fixed-point quantization
    assert(math.abs(e11 - 1.0) < 0.01, s"E[w1^2] = $e11")
    assert(math.abs(e22 - 1.0) < 0.01, s"E[w2^2] = $e22")
    // cross-moment small relative to the diagonal (decorrelated)
    assert(math.abs(e12) / math.sqrt(e11 * e22) < 0.25,
      s"whitened correlation ${e12 / math.sqrt(e11 * e22)}")
  }

  test("the dominant direction's raw energy exceeds the second by the planted factor") {
    // sanity that the fixture really is anisotropic as claimed: undo
    // the whitening scale to recover raw projection energies
    val w = SimilarityQueries.whiten2(spark, dir.toString).collect()
      .map(r => (r.getLong(1) / 1e6, r.getLong(2) / 1e6)).toSeq
    val (e11, e22, _) = moments(w)
    // whitened energies are raw/lambda; lambda1 >> lambda2 on this
    // fixture, so equal whitened energies certify the equalization did
    // real work only if the raw anisotropy existed — recompute it from
    // the fixture directly
    val vecs = spark.read.parquet(dir.resolve("embeddings.parquet").toString)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val mean2 = Array.tabulate(64)(j => vecs.map(v => v(j) * v(j)).sum / vecs.length)
    val maxAxis = mean2.max
    val minAxis = mean2.min
    assert(maxAxis / minAxis > 2.0,
      s"fixture not anisotropic: $maxAxis / $minAxis")
    assert(e11 > 0.0 && e22 > 0.0)
  }

  test("whitened output is deterministic across runs") {
    val a = SimilarityQueries.whiten2(spark, dir.toString).collect().toSeq
    val b = SimilarityQueries.whiten2(spark, dir.toString).collect().toSeq
    assert(a == b)
  }
}
