package graft.queries

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.functions.TextFunctions

/** Contract of `dedup_cosine_pool_audit`: the audit must EXPOSE md5
  * pool-cap saturation exactly where it truncates `dedup_cosine_lsh`'s
  * candidate generation — a planted saturated bucket shows up as
  * nonzero n_saturated_buckets / n_evicted, and the evicted share
  * reconciles EXACTLY with the pairs missing from the pair set (the
  * truncation is not a heuristic loss, it is the pool predicate
  * applied to the canonical side, and the audit counts precisely the
  * rows that predicate drops). At the bounded test SFs the audit is
  * all-zero — the "cap never binds here" claim, pinned. */
class CosinePoolAuditSpec extends SparkSpec {

  test("a planted saturated bucket is visible and reconciles with the truncated pair set") {
    import spark.implicits._
    val dir = tmpDir("cospool")
    // n identical 64-dim vectors: every band has ONE bucket of n
    // members, past the 1000-row pool cap — the exact shape a ≥50×
    // corpus reaches at W=6 (BENCH_SF1 round 15)
    val n = 1100
    val base = Array.tabulate(64)(i => math.sin(i + 1.0).toFloat)
    writeFixture(dir, "embeddings",
      (1 to n).map(i => (i.toLong, base)).toDF("vec_id", "embedding"))

    val audit = DedupQueries.cosinePoolAudit(spark, dir.toString).collect()
    assert(audit.length == 4) // one row per band
    audit.foreach { r =>
      assert(r.getAs[Long]("n_buckets") == 1L)
      assert(r.getAs[Long]("n_members") == n.toLong)
      assert(r.getAs[Long]("max_bucket") == n.toLong)
      assert(r.getAs[Long]("n_saturated_buckets") == 1L)
      assert(r.getAs[Long]("n_sat_members") == n.toLong)
      assert(r.getAs[Long]("n_evicted") > 0L)
      assert(r.getAs[Long]("evicted_ppm") > 0L)
    }

    // reconciliation: eviction is a pure function of (vec_id,
    // n_bucket), and all four buckets here have identical membership,
    // so an evicted id is evicted from EVERY bucket and can never be
    // the canonical (smaller) side of a candidate — the pair set
    // must be short by exactly the pairs whose smaller id is evicted
    val evicted = (1 to n).map(_.toLong).toDF("vec_id")
      .filter(!TextFunctions.h60Pool(col("vec_id"), lit(n.toLong), 1000L))
      .collect().map(_.getLong(0))
    assert(evicted.nonEmpty)
    assert(audit.forall(_.getAs[Long]("n_evicted") == evicted.length.toLong))
    val found = DedupQueries.cosineLsh(spark, dir.toString).count()
    val exact = n.toLong * (n - 1L) / 2L
    val expectedMissing = evicted.map(a => n.toLong - a).sum
    assert(found == exact - expectedMissing)
    assert(found < exact) // the silent truncation, made visible
  }

  test("all-zero at the bounded SF — the cap never binds below its capacity") {
    val audit = DedupQueries.cosinePoolAudit(spark, "/root/testdata/sf0.001")
      .collect()
    assert(audit.length == 4)
    assert(audit.forall(r => r.getAs[Long]("n_saturated_buckets") == 0L))
    assert(audit.forall(r => r.getAs[Long]("n_evicted") == 0L))
    assert(audit.forall(r => r.getAs[Long]("evicted_ppm") == 0L))
    assert(audit.forall(r => r.getAs[Long]("n_members") > 0L))
  }
}
