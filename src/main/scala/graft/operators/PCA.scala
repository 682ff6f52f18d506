package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Top-k principal directions by power iteration with deflation — the
  * iterated generalization of the oracle-checked one-step queries
  * (`emb_power_iteration` / `emb_pca2` in
  * graft.queries.SimilarityQueries): whitening / low-rank projection
  * needs a basis, not a single probe step.
  *
  * Per component: run `iters` power steps v ← normalize(Σ_x (x'·v) x')
  * from the deterministic all-ones start, where x' is the input with
  * every PREVIOUSLY found component projected out (deflation), then
  * record the direction and its energy ‖Σ (x'·v) x'‖.
  *
  * Scale shape: each step is ONE corpus pass — the per-row projection
  * s = x'·v is a sequential in-array fold against the current
  * direction (a k·64-double broadcast literal, like KMeans' centroid
  * broadcast), and the accumulation Σ s·x' is the labelCentroids
  * fixed-point idiom: per-position round-to-int64 sums (2^20 scale),
  * one (pos) shuffle with map-side combine, O(1) agg buffers. The
  * driver sees only 64 doubles per step — the same bounded-scalar
  * discipline as KMeans.fit's inertia. Shuffle-order-proof by
  * construction: integer sums commute, so repeated runs give
  * bit-identical bases.
  */
object PCA {

  private val Scale = 1048576.0 // 2^20, as in emb_power_iteration

  /** @param emb  (vec_id, embedding: Array[Float|Double]) frame
    * @param k    number of components (k << dim; each costs `iters`
    *             corpus passes)
    * @param iters power steps per component
    * @return components SORTED by energy (descending): (comp_id,
    *         direction Array[Double] unit-norm, energy), where
    *         comp_id is the extraction (deflation) order. The sort
    *         matters because a finite number of power steps can pull
    *         near-degenerate directions out of eigenvalue order;
    *         orthogonality holds regardless (spec'd). First extraction
    *         starts from the plain all-ones vector — bit-identical
    *         arithmetic to the oracle-checked `emb_power_iteration` /
    *         `emb_pca2` steps (spec'd to 1e-12). */
  def fit(emb: DataFrame, k: Int, iters: Int): Seq[(Int, Array[Double], Double)] = {
    require(k >= 1 && iters >= 1)
    val first = emb.select(col("embedding")).first()
    val dim = first.getSeq[Any](0).length

    val x = transform(col("embedding"), _.cast(DoubleType))

    def litVec(v: Array[Double]): Column = array(v.map(lit): _*)

    /** x with the found components projected out. */
    def deflate(found: Seq[Array[Double]]): Column =
      found.foldLeft(x) { (acc, v) =>
        val t = aggregate(zip_with(acc, litVec(v), (a, b) => a * b),
          lit(0.0), (s, p) => s + p)
        zip_with(acc, litVec(v), (a, b) => a - t * b)
      }

    /** One power step: m = Σ_rows (x'·v) x', fixed-point; returns the
      * unnormalized accumulator. */
    def step(xd: Column, v: Array[Double]): Array[Double] = {
      val s = aggregate(zip_with(xd, litVec(v), (a, b) => a * b),
        lit(0.0), (acc, p) => acc + p)
      val m = emb
        .select(col("vec_id"), xd.as("y"), s.as("s"))
        // barrier: s is consumed per exploded position below (the
        // emb_power_iteration CollapseProject guard)
        .repartition(col("vec_id"))
        .select(col("s"), posexplode(col("y")))
        .select(col("pos"),
          round(col("s") * col("col") * lit(Scale)).cast(LongType).as("q"))
        .groupBy(col("pos"))
        .agg(sum(col("q")).as("sq"))
        .collect()
      val out = new Array[Double](dim)
      m.foreach(r => out(r.getAs[Int]("pos")) = r.getAs[Long]("sq") / Scale)
      out
    }

    def norm(v: Array[Double]): Double = math.sqrt(v.map(c => c * c).sum)

    val found = Seq.newBuilder[(Int, Array[Double], Double)]
    var basis = Seq.empty[Array[Double]]
    for (c <- 0 until k) {
      val xd = deflate(basis)
      // all-ones start, NOT unit-normalized: the first step is then
      // the exact arithmetic of the oracle-checked query twins
      var v = Array.fill(dim)(1.0)
      var energy = 0.0
      for (_ <- 0 until iters) {
        val m = step(xd, v)
        energy = norm(m)
        require(energy > 0.0,
          s"PCA: component $c collapsed to zero (rank-deficient input)")
        v = m.map(_ / energy)
      }
      found += ((c, v, energy))
      basis = basis :+ v
    }
    found.result().sortBy(-_._3)
  }
}
