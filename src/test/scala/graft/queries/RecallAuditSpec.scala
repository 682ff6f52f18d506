package graft.queries

import graft.SparkSpec

/** ann_recall_audit: the published per-query recall numbers must obey
  * the structural invariants (multi-probe dominates single-probe; the
  * exact base is always k) and report perfect recall when the geometry
  * makes perfect recall certain. */
class RecallAuditSpec extends SparkSpec {
  import spark.implicits._

  test("multi-probe recall dominates single-probe for every query (real data)") {
    val rows = SimilarityQueries.recallAudit(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) == 10L, s"n_exact: $r")
      // the Hamming-1 probe set CONTAINS the home bucket, so the
      // multi-probe candidate set is a superset — recall can only rise
      assert(r.getLong(3) >= r.getLong(2), s"dominance violated: $r")
      assert(r.getLong(4) == r.getLong(2) * 1000L)
      assert(r.getLong(5) == r.getLong(3) * 1000L)
    }
  }

  test("planted duplicate clusters audit at recall 10000 bp") {
    // 3 clusters of 30 IDENTICAL vectors: every member of a cluster
    // hashes to the same bucket under any hyperplane set, and the
    // exact top-10 of a cluster query is inside its cluster (cosine 1
    // beats any cross-cluster cosine; ties break by n_id) — so both
    // LSH paths must report perfect recall for every query.
    val rnd = new scala.util.Random(5)
    def base(): Array[Float] = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val clusters = Seq.fill(3)(base())
    val rows = for {
      c <- 0 until 3
      i <- 0 until 30
    } yield {
      // query ids are multiples of 50 (the shared isQuery subset):
      // make the first member of each cluster a query
      val id = if (i == 0) c * 50L else 1000L + c * 100L + i
      (id, s"c$c", clusters(c))
    }
    val d = tmpDir("graft-recall")
    writeFixture(d, "embeddings",
      rows.toDF("vec_id", "label", "embedding"))
    val audit = SimilarityQueries.recallAudit(spark, d.toString).collect()
    assert(audit.length == 3)
    for (r <- audit) {
      assert(r.getLong(4) == 10000L, s"single-probe recall: $r")
      assert(r.getLong(5) == 10000L, s"multi-probe recall: $r")
    }
  }
}
