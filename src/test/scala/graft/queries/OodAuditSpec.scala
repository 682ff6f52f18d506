package graft.queries

import graft.SparkSpec

/** emb_ood_audit: a planted orthogonal outlier must surface first. */
class OodAuditSpec extends SparkSpec {
  import spark.implicits._

  test("planted outlier orthogonal to every prototype ranks first") {
    val d = tmpDir("graft-ood")
    // 4 clusters on axes 0..3; vec 999 points along axis 40 — far
    // from every class prototype
    val rows = (for (c <- 0 until 4; i <- 0 until 25) yield {
      val id = (c * 25 + i).toLong
      val v = Array.tabulate(64)(j =>
        (if (j == c) 10.0f else 0.0f) +
          (((id * 17 + j) % 5).toFloat - 2.0f) * 0.01f)
      (id, v.toSeq, c)
    }) :+ {
      val v = Array.tabulate(64)(j => if (j == 40) 10.0f else 0.0f)
      (999L, v.toSeq, 2) // mislabeled into cluster 2
    }
    writeFixture(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val out = SimilarityQueries.oodAudit(spark, d.toString).collect()
    assert(out.head.getLong(0) == 999L,
      s"outlier not first: ${out.head}")
    // and it is far from everything while the rest are near a prototype
    assert(out.head.getDouble(3) < 0.2)
    assert(out.tail.forall(_.getDouble(3) > 0.8))
  }

  test("real corpus: 20 rows, ascending nearest-prototype cosine") {
    val out = SimilarityQueries
      .oodAudit(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 20)
    val cs = out.map(_.getDouble(3)).toSeq
    assert(cs == cs.sorted)
    assert(cs.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
  }
}
