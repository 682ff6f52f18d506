package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recall floor for the IVF-PQ composite (`ann_ivfpq_topk`) in the
  * regime a cell index exists for: clustered embeddings, where the
  * coarse quantizer's cells align with real neighborhoods. (On the
  * uniform-random sf* vectors distance concentration caps ANY cell
  * index near noise — 0.147 for both `ann_ivf_topk` and the composite
  * at sf0.1 — so, as in LshScalingSpec, the fixture plants the
  * structure the index is built to find.)
  *
  * Two floors are pinned:
  *  - absolute recall@10 vs the exact scan, and
  *  - the composite must not lose (beyond noise) to its coarse parent
  *    `ann_ivf_topk` — the probe set is identical, so any gap is the
  *    16-byte ADC shortlist dropping true neighbors before re-rank.
  */
class IvfPqRecallSpec extends SparkSpec {
  import spark.implicits._

  /** 25 planted clusters x 40 near-copies (unit vectors, sigma 0.03):
    * every vector's true top-10 are its cluster-mates; vec_id % 40 == 7
    * seeds exactly one coarse centroid per cluster. */
  private lazy val dir = {
    val d = tmpDir("graft-ivfpq")
    val rnd = new scala.util.Random(23)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = for {
      c <- 0 until 25
      center = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 40
    } yield ((c * 40 + m).toLong,
      unit(center.map(_ + 0.03 * rnd.nextGaussian())).toSeq, c)
    writeFixture(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    d
  }

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val truth = SimilarityQueries.bruteTopK(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.map { case (q, t) => (t & got.getOrElse(q, Set.empty)).size }.sum
    hits.toDouble / truth.values.map(_.size).sum
  }

  test("ivfpq recall@10 on clustered data: high floor, no loss vs coarse parent") {
    val ivf = recallOf(SimilarityQueries.ivfTopK(spark, dir.toString))
    val ivfpq = recallOf(SimilarityQueries.ivfpqTopK(spark, dir.toString))
    info(f"recall@10: ivf $ivf%.3f, ivfpq $ivfpq%.3f")
    assert(ivfpq >= 0.9, f"ivfpq recall $ivfpq%.3f under floor")
    assert(ivfpq >= ivf - 0.05, f"ADC shortlist lost recall: $ivfpq%.3f vs ivf $ivf%.3f")
  }

  test("learned codebooks keep the composite's recall (ann_ivfpq_learned)") {
    // same cell probes; only the codebook differs — Lloyd's-refined
    // codes must not DROP recall vs the seed codebook before re-rank
    // (this is ann_ivfpq_learned's correctness contract: its k-means
    // half isn't SQL-expressible, so no oracle row exists)
    val seed = recallOf(SimilarityQueries.ivfpqTopK(spark, dir.toString))
    val learned = recallOf(SimilarityQueries.ivfpqLearnedTopK(spark, dir.toString))
    info(f"recall@10: seed codebook $seed%.3f, learned $learned%.3f")
    assert(learned >= 0.9, f"ivfpq_learned recall $learned%.3f under floor")
    assert(learned >= seed - 0.05,
      f"training lost recall: $learned%.3f vs seed $seed%.3f")
  }
}
