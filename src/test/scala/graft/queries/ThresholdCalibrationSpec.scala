package graft.queries

import graft.SparkSpec

/** emb_threshold_calibration: a separable space must show the rate
  * rising with cosine; structure must always hold. */
class ThresholdCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("separable clusters: top bins pure same-label, bottom bins cross") {
    val d = tmpDir("graft-calib")
    // two axis clusters: same-label pairs at cosine ~1, cross-label
    // pairs at ~0 -> the calibration curve is a step function
    val rows = for (c <- 0 until 2; i <- 0 until 30) yield {
      val id = (c * 30 + i).toLong
      val v = Array.tabulate(64) { j =>
        (if (j == c) 10.0f else 0.0f) +
          (((id * 19 + j) % 7).toFloat - 3f) * 0.01f
      }
      (id, v.toSeq, c)
    }
    writeFixture(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val out = SimilarityQueries.thresholdCalibration(spark, d.toString)
      .collect()
    val top = out.filter(_.getLong(0) >= 9L)
    val bottom = out.filter(_.getLong(0) <= 5L)
    assert(top.nonEmpty && top.forall(_.getDouble(4) == 1.0),
      "near-identical pairs not pure same-label")
    assert(bottom.forall(_.getDouble(4) == 0.0),
      "orthogonal pairs claimed same-label")
  }

  test("bins are valid and counts reconcile on real data") {
    val out = SimilarityQueries
      .thresholdCalibration(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 9L)
      assert(r.getLong(3) <= r.getLong(2))
      val lo = r.getDouble(1)
      assert(lo >= -1.0 && lo < 1.0)
    }
    val nPairs = SimilarityQueries
      .lshMultiProbe(spark, "/root/testdata/sf0.001").count()
    assert(out.map(_.getLong(2)).sum == nPairs)
  }
}
