package graft.queries

import graft.SparkSpec

/** The measured case FOR residual encoding: a planted geometry where
  * raw-vector IVF-PQ provably loses recall and the residual variant
  * keeps recall 1.0, at the same 16-byte code budget.
  *
  * Plant: 9 well-separated clusters x 110 members; within a cluster,
  * members sit at one of 12 "delta" offsets (a 2.0 spike on one
  * coordinate) plus tiny noise — the fine structure retrieval must
  * rank by. Ids are laid out so each cluster holds exactly ONE coarse
  * centroid (vec_id ≡ 7 mod 40) and all PQ seed ids (< 500,
  * ≡ 7 mod 16) live in clusters 0-4: clusters 5-8 contain no seed
  * beyond (at most) their own centroid. A raw-encoded member of such a
  * cluster quantizes every subspace to the same nearest seed as all
  * its siblings — identical codes, identical ADC scores, and the
  * 50-row shortlist degenerates to the n_id tie-break, dropping true
  * neighbors. Residual encoding subtracts the cell centroid first, so
  * every cluster's members land in the SAME delta-offset residual
  * distribution the shared residual codebook resolves — the code
  * budget goes to the offsets, which is exactly the FAISS IVFPQ
  * argument.
  *
  * Ground truth is exact in-process top-10. */
class ResidualPqSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  test("residual encoding keeps recall where raw-vector PQ drops it") {
    val rnd = new scala.util.Random(11)
    val nClusters = 9
    val perCluster = 110
    val nGroups = 12
    val centers = Array.fill(nClusters)(
      Array.fill(Dim)((rnd.nextInt(2) * 2 - 1) * 5.0))
    def vec(k: Int, g: Int): Array[Float] = {
      val v = centers(k).clone()
      if (g > 0) v(5 * g) += 2.0
      v.map(x => (x + rnd.nextGaussian() * 0.02).toFloat)
    }
    // id layout: one coarse centroid (≡7 mod 40) per cluster; all
    // other seed-eligible ids (<500, ≡7 mod 16, not ≡7 mod 40) in
    // clusters 0-4 covering every delta group; queries (≡0 mod 50)
    // round-robin over all 9 clusters; neutral filler ids ≥2000 that
    // match no special predicate
    val members = Seq.newBuilder[(Long, Int, Int)] // (id, cluster, group)
    (0 until nClusters).foreach(k => members += ((7L + 40 * k, k, 0)))
    val seedIds = Seq(23, 39, 55, 71, 103, 119, 135, 151, 183, 199, 215,
      231, 263, 279, 295, 311, 343, 359, 375, 391, 423, 439, 455, 471)
    seedIds.zipWithIndex.foreach { case (id, i) =>
      members += ((id.toLong, i % 5, i % nGroups))
    }
    (0 until 20).foreach(i => members += ((50L * i, i % nClusters, i % nGroups)))
    var next = 2000L
    def nextNeutral(): Long = {
      next += 1
      while (next % 40 == 7 || next % 50 == 0) next += 1
      next
    }
    val sized = members.result()
    val byCluster = sized.groupBy(_._2).view.mapValues(_.size).toMap
    val filled = sized ++ (0 until nClusters).flatMap { k =>
      (byCluster(k) until perCluster).map(i =>
        (nextNeutral(), k, i % nGroups))
    }
    val vecs = filled.map { case (id, k, g) => (id, vec(k, g), 0) }
    val dir = tmpDir("graft-residual-pq")
    writeFixture(dir, "embeddings", vecs.toDF("vec_id", "embedding", "label"))

    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i); s += d * d; i += 1
      }
      s
    }
    val byId = vecs.map(v => (v._1, v._2)).toMap
    val queries = vecs.map(_._1).filter(_ % 50 == 0)
    val truth: Map[Long, Set[Long]] = queries.map { q =>
      q -> vecs.map(_._1).filter(_ != q)
        .sortBy(n => (l2(byId(q), byId(n)), n)).take(10).toSet
    }.toMap

    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val found = rows.groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("n_id")).toSet }
      queries.map(q => truth(q).intersect(found.getOrElse(q, Set())).size)
        .sum.toDouble / (queries.size * 10)
    }
    val raw = recall(
      SimilarityQueries.ivfpqTopK(spark, dir.toString).collect())
    val res = recall(
      SimilarityQueries.ivfpqResidualTopK(spark, dir.toString).collect())
    info(f"recall@10 raw=$raw%.3f residual=$res%.3f " +
      s"(${queries.size} queries, $nClusters clusters x $perCluster)")
    assert(raw < 0.95, s"plant failed: raw-vector PQ did not degrade ($raw)")
    assert(res >= 0.99, s"residual recall $res")
    assert(res > raw + 0.05, s"residual $res vs raw $raw")
  }
}
