package graft.queries


import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.h60

/** The md5-threshold neighbor-pool caps (ann_knn_join,
  * dedup_embedding_cosine) are INACTIVE at every driver test SF —
  * which is the design, but means the oracle gate never exercises the
  * regime that actually runs at 100 TB. This spec builds a corpus
  * whose single label block (1500 vectors) exceeds MaxBlock=1000 and
  * pins the capped path: pool membership follows the documented hash
  * predicate, the expected pool size lands, the query side is never
  * sampled, and results are deterministic across runs. */
class PoolCapSpec extends SparkSpec {
  import spark.implicits._

  private val nVecs = 1500

  /** 1500 vectors in ONE label: 500 near-dup triples (shared base +
    * small deterministic noise) so cosine>=0.4 pairs abound. */
  private lazy val dir: String = {
    val rnd = new scala.util.Random(42)
    val rows = (0 until nVecs).map { i =>
      val base = Array.fill(8)(rnd.nextGaussian().toFloat)
      (i.toLong, base, 0)
    }
    // triples share a base: overwrite members 1,2 of each group with
    // noisy copies of member 0
    val byGroup = rows.grouped(3).flatMap { g =>
      val (id0, base, l) = g.head
      g.zipWithIndex.map { case ((id, _, _), j) =>
        val noisy = base.map(x => x + (if (j == 0) 0f else 0.01f * ((id % 7) + 1)))
        (id, noisy.toSeq, l)
      }
    }.toSeq
    val d = tmpDir("graft-cap").toString
    byGroup.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** The documented pool predicate, recomputed independently. */
  private lazy val pool: Set[Long] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(h60(col("vec_id").cast("string")) % lit(1048576L) * lit(nVecs.toLong) <
        lit(1048576L * 1000L))
      .select("vec_id").as[Long].collect().toSet

  test("pool follows the hash predicate at the expected ~1000/1500 rate") {
    // pass rate 1000/1500 = 2/3; binomial sd ~18 -> generous band
    assert(pool.size > 900 && pool.size < 1100, s"pool size ${pool.size}")
  }

  test("knn join under an active cap: neighbors from the pool, queries unsampled") {
    val out = SimilarityQueries.knnJoin(spark, dir)
      .select("vec_id", "nn_id", "rank").as[(Long, Long, Long)].collect()
    // the neighbor side is the sampled pool...
    assert(out.map(_._2).toSet.subsetOf(pool))
    // ...but the query side is NOT: every vector still gets neighbors
    assert(out.map(_._1).toSet == (0L until nVecs.toLong).toSet)
    assert(out.forall(_._3 <= 3))
    // deterministic under the cap
    val again = SimilarityQueries.knnJoin(spark, dir)
      .select("vec_id", "nn_id", "rank").as[(Long, Long, Long)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("cosine pairs under an active cap: canonical side from the pool only") {
    val got = DedupQueries.embeddingCosine(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(got.nonEmpty) // the near-dup triples produce pairs
    assert(got.map(_._1).toSet.subsetOf(pool), "vec_a must come from the pool")
    // higher-id side unsampled: some vec_b outside the pool
    assert(got.map(_._2).exists(b => !pool.contains(b)))
    got.foreach { case (a, b) => assert(a < b) }
  }
}
