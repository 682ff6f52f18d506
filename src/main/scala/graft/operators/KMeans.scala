package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * iterated form of the oracle-checked single step
  * (`SimilarityQueries.kmeansStep`, `emb_kmeans_step`).
  *
  * Loop discipline (the `dedup_clusters` pattern): centroids are a
  * k-row DataFrame that is `localCheckpoint(eager = true)`-ed every
  * round — persist alone does NOT truncate the logical plan, and an
  * uncheckpointed iterative plan grows exponentially in Catalyst
  * re-optimization. Assignment broadcasts the k centroids (never the
  * corpus); recomputation is one (cluster, pos) shuffle with O(1)
  * aggregation buffers. The only per-group array materialization is
  * rebuilding the k centroid vectors themselves — k x dim values,
  * bounded by construction, never corpus-sized.
  *
  * Determinism: seeds are the k lowest vec_ids; the argmin tie-breaks
  * on (d2, cent_id); rounds are a fixed count. Inertia per round is
  * returned so callers can stop early; it is non-increasing by
  * Lloyd's-algorithm invariant (asserted in KMeansSpec).
  */
object KMeans {

  /** @param emb (vec_id: Long, embedding: Array[Float|Double]); other
    *            columns are projected away — join extra attributes back
    *            on vec_id from `assignments`.
    * @return (assignments: vec_id/x/cent_id/d2, centroids: cent_id/cvec,
    *         inertia per round) */
  def fit(emb: DataFrame, k: Int, iters: Int)
      : (DataFrame, DataFrame, Seq[Double]) = {
    require(k >= 1 && iters >= 1)
    require(!emb.isEmpty, "KMeans.fit: input is empty")

    val vecs = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("x"))

    // deterministic seeding: the k lowest vec_ids (kmeans++ at scale
    // would sample by d2 with a seeded hash — same loop shape).
    // orderBy+limit plans as TakeOrderedAndProject (per-partition
    // top-k, k-row driver merge); the row_number window runs on those
    // k rows only — never a full-corpus single-partition sort
    var centroids = vecs
      .orderBy(col("vec_id")).limit(k)
      .withColumn("rn", row_number().over(Window.orderBy(col("vec_id"))))
      .select((col("rn") - 1).cast("long").as("cent_id"), col("x").as("cvec"))
      .localCheckpoint(true)

    val d2 = aggregate(
      zip_with(col("x"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    val wMin = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2"), col("cent_id"))

    def assign(): DataFrame =
      vecs.crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("x"), col("cent_id"), d2.as("d2"))
        .withColumn("rn", row_number().over(wMin))
        .filter(col("rn") === 1)
        .drop("rn")

    val inertia = Seq.newBuilder[Double]
    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = assign()
      // one pass: inertia + new centroids from the same assignment
      assigned.persist()
      inertia += assigned.agg(sum(col("d2"))).head.getDouble(0)
      val means = assigned
        .select(col("cent_id"), posexplode(col("x")))
        .groupBy(col("cent_id"), col("pos"))
        // fixed-point 2^27 component sums (the fitGrouped /
        // labelCentroids idiom): double avg() depends on shuffle merge
        // order, and a ULP of centroid drift can flip a near-tie
        // assignment run-to-run
        .agg((sum(round(col("col") * (1L << 27)).cast("long"))
          .cast("double") / (1L << 27) / count(lit(1))).as("m"))
        // k x dim rows -> k rows: bounded collect, sorted for a
        // deterministic component order
        .groupBy(col("cent_id"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec2"))
      // a cluster that went empty (duplicate seeds, d2 ties) keeps its
      // previous centroid, so the k-centroid contract holds every
      // round — the same carry-forward fitGrouped documents
      val next = centroids.join(means, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("cvec2"), col("cvec")).as("cvec"))
        .localCheckpoint(true)
      assigned.unpersist()
      centroids = next
    }
    (assign(), centroids, inertia.result())
  }

  /** Lloyd's over many independent groups at once — one loop trains
    * every group's codebook together (the PQ per-subspace case: 16
    * subspaces x k entries in a single broadcast join per round,
    * instead of 16 separate fits each paying its own passes).
    *
    * @param slices (grp: Int, vec_id: Long, x: Array[Double]) — each
    *               group's points, all groups unioned in one frame.
    * @param seeds  (grp, cent_id: Long, cvec: Array[Double]) — initial
    *               centroids per group, k rows per group.
    * @return (grp, cent_id, cvec) trained centroids. A cluster that
    *         goes empty in a round keeps its previous centroid, so
    *         every group returns exactly its k seed ids (PQ composite
    *         stitching relies on identical id sets across groups).
    *
    * Same loop discipline as [[fit]]: centroids localCheckpoint(eager)
    * per round (persist does not truncate lineage); assignment
    * broadcasts the (groups x k)-row codebook, never the corpus; the
    * argmin is a partial-aggregable min(struct) — no window, no
    * corpus-sized state. */
  def fitGrouped(slices: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0)
    val d2 = aggregate(
      zip_with(col("x"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    var cents = seeds.localCheckpoint(true)
    for (_ <- 0 until iters) {
      val means = slices.join(broadcast(cents), "grp")
        .select(col("grp"), col("vec_id"), col("cent_id"), col("x"), d2.as("d2"))
        // argmin carries x through the min struct: (d2, cent_id) is the
        // ordering, x is constant within the (grp, vec_id) group
        .groupBy(col("grp"), col("vec_id"))
        .agg(min(struct(col("d2"), col("cent_id"), col("x"))).as("best"))
        .select(col("grp"), col("best.cent_id").as("cent_id"),
          posexplode(col("best.x")))
        .groupBy(col("grp"), col("cent_id"), col("pos"))
        // fixed-point 2^27 component sums (the labelCentroids idiom):
        // double avg() depends on shuffle merge order, and a ULP of
        // centroid drift can flip near-tie codes run-to-run. Each term
        // casts to long BEFORE the sum — summing integer-valued doubles
        // is only exact while the running sum stays under 2^53, which a
        // corpus-scale group would exceed
        .agg((sum(round(col("col") * (1L << 27)).cast("long"))
          .cast("double") / (1L << 27) / count(lit(1))).as("m"))
        .groupBy(col("grp"), col("cent_id"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec2"))
      cents = cents.join(means, Seq("grp", "cent_id"), "left")
        .select(col("grp"), col("cent_id"),
          coalesce(col("cvec2"), col("cvec")).as("cvec"))
        .localCheckpoint(true)
    }
    cents
  }
}
