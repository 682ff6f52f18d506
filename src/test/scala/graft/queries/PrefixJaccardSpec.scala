package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Prefix filtering is EXACT — unlike the capped inverted join or
  * MinHash banding it may not lose a single qualifying pair. The spec
  * checks completeness against the ground truth from the FULL
  * (uncapped at this SF) inverted join, and that the prefix index is
  * genuinely smaller than the full index (the point of the
  * technique). */
class PrefixJaccardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prefix-filtered pairs equal the full inverted join at tau") {
    val tau = DedupQueries.PrefixTau
    val got = DedupQueries.prefixJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // ground truth: ngramJaccard emits ALL pairs >= 0.3 with the same
    // jaccard expression (its posting cap is inert at sf0.001 — no
    // shingle approaches df=1000 in 500 docs); filter to tau
    val truth = DedupQueries.ngramJaccard(spark, dir)
      .filter(col("jaccard") >= tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(truth.nonEmpty, "fixture has no high-threshold pairs")
    assert(got == truth)
  }

  test("the prefix index is a small fraction of the full index") {
    import graft.functions.TextFunctions.{shingleHashesOfToks, tokens}
    val tau = DedupQueries.PrefixTau
    val perDoc = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(shingleHashesOfToks(tokens(col("text")), 3)).as("n"))
      .agg(sum(col("n")).as("full"),
        sum(col("n") - ceil(lit(tau) * col("n")) + lit(1)).as("prefix"))
      .head()
    val (full, prefix) = (perDoc.getLong(0), perDoc.getLong(1))
    info(s"full index $full postings, prefix index $prefix")
    // at tau = 0.7 the prefix is ~30% of each doc + 1
    assert(prefix.toDouble / full.toDouble < 0.35, s"$prefix / $full")
  }
}
