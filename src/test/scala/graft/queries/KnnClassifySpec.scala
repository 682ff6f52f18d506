package graft.queries

import graft.SparkSpec

/** emb_knn_classify: on planted well-separated clusters the majority
  * vote must recover every label; on real data the mechanics hold. */
class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  test("planted clusters: every covered vector gets its cluster label") {
    val d = tmpDir("graft-knnclass")
    // 10 clusters, center c = 10 * e_c (axis-aligned, far apart);
    // members jitter by 0.001 so every projection sign matches the
    // center's -> one LSH bucket per cluster, seeds included
    val rows = for (c <- 0 until 10; i <- 0 until 40) yield {
      val id = (c * 40 + i).toLong
      val v = Array.tabulate(64) { j =>
        val base = if (j == c) 10.0f else 0.0f
        base + (((id * 31 + j) % 7).toFloat - 3.0f) * 0.001f
      }
      (id, v.toSeq, c)
    }
    writeFixture(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val out = SimilarityQueries.knnClassify(spark, d.toString).collect()
    // all 320 unlabeled vectors covered (8 seeds share each bucket)
    assert(out.length == 320, s"covered ${out.length}")
    assert(out.forall(_.getLong(4) == 1L), "a planted vector was mislabeled")
    assert(out.forall(_.getLong(3) == 5L), "vote pool not saturated")
  }

  test("real corpus: per-vector output, bounded votes, high coverage") {
    val out = SimilarityQueries
      .knnClassify(spark, "/root/testdata/sf0.001").collect()
    val nUnlabeled = graft.util.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter($"vec_id" % 5 =!= 0).count()
    assert(out.length >= (nUnlabeled * 0.9).toInt,
      s"coverage ${out.length}/$nUnlabeled")
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(r => r.getLong(3) >= 1L && r.getLong(3) <= 5L))
    out.foreach { r =>
      val expect = if (r.getInt(1) == r.getInt(2)) 1L else 0L
      assert(r.getLong(4) == expect)
    }
  }
}
