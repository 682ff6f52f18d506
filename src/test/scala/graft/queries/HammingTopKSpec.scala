package graft.queries

import graft.SparkSpec

/** ann_hamming_topk: sign bits must recover planted neighborhoods and
  * carry real signal against the exact cosine truth. */
class HammingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("planted clusters: hamming neighbors are cluster members") {
    val d = tmpDir("graft-hamming")
    // clusters defined by ORTHANT: members of cluster c share the
    // sign pattern of a +-1 template; 1-bit codes preserve exactly
    // this structure
    val rnd = new scala.util.Random(11)
    val templates = Seq.fill(5)(Array.fill(64)(if (rnd.nextBoolean()) 1f else -1f))
    val rows = for (c <- 0 until 5; i <- 0 until 60) yield {
      val id = (c * 60 + i).toLong
      val v = templates(c).zipWithIndex.map { case (s, j) =>
        s * (1.0f + (((id * 7 + j) % 5).toFloat) * 0.1f) }
      (id, v.toSeq, c)
    }
    writeFixture(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val out = SimilarityQueries.hammingTopK(spark, d.toString).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, n, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(q / 60 == n / 60, s"neighbor $n from another cluster for $q")
      assert(h == 0L, "same-orthant member at nonzero hamming distance")
    }
  }

  test("real data: recall@10 vs exact cosine beats chance by 10x") {
    val dir = "/root/testdata/sf0.001"
    val truth = SimilarityQueries.bruteTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SimilarityQueries.hammingTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val recall = got.count(truth) / truth.size.toDouble
    val n = graft.util.Tables.load(spark, dir, "embeddings").count()
    val chance = 10.0 / (n - 1)
    assert(recall > 10 * chance,
      s"hamming recall $recall vs chance $chance")
  }
}
