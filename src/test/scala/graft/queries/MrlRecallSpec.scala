package graft.queries

import graft.SparkSpec

/** emb_mrl_recall: truncation keeps recall when the leading dims
  * carry the structure, and the full-dim row is exact by definition. */
class MrlRecallSpec extends SparkSpec {
  import spark.implicits._

  test("front-loaded structure survives truncation; noise tail does not matter") {
    val d = tmpDir("graft-mrl")
    // neighborhoods determined entirely by dims 0..7 (cluster one-hot
    // x 10); dims 8..63 carry deterministic noise. A 16-dim prefix
    // sees all structure -> recall 1.0
    val rows = for (c <- 0 until 5; i <- 0 until 60) yield {
      val id = (c * 60 + i).toLong
      val v = Array.tabulate(64) { j =>
        val sig = if (j == c) 10.0f else 0.0f
        val noise = if (j >= 8) (((id * 13 + j * 7) % 11).toFloat - 5f) * 0.05f
          else 0.0f
        sig + noise
      }
      (id, v.toSeq, c)
    }
    writeFixture(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val out = SimilarityQueries.mrlRecall(spark, d.toString).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(64L) == 1.0)
    // cluster MEMBERSHIP is fully recovered at any prefix; the
    // remaining loss is fine-grained within-cluster ordering, which
    // legitimately depends on how much of the noise tail the budget
    // sees — still far above the ~0.17 chance rate (10 of 59 in-cluster)
    // (no monotonicity assert: a half-seen noise tail can order a
    // cluster differently from both the 16-dim and full views)
    assert(out(16L) > 0.6, s"front-loaded recall@16 only ${out(16L)}")
    assert(out(32L) > 0.6, s"front-loaded recall@32 only ${out(32L)}")
  }

  test("real embeddings: three rows, full dim exact, budgets degrade") {
    val out = SimilarityQueries
      .mrlRecall(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(16L, 32L, 64L))
    assert(out(64L) == 1.0)
    // synthetic embeddings spread signal over all dims, so truncation
    // must cost real recall — the audit's reason to exist
    assert(out(16L) < out(64L) && out(32L) < out(64L))
    assert(out(16L) <= out(32L))
  }
}
