package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The asymmetric prefix filter is EXACT: against a ground truth built
  * from the FULL shingle co-occurrence join it may not lose a single
  * containment ≥ τ pair — and it must catch the low-Jaccard embedded
  * case that is the operator's reason to exist. */
class ContainmentPairsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("probe-prefix candidates equal the full co-occurrence join at tau") {
    import graft.functions.TextFunctions.{shingleHashesOfToks, tokens}
    val tau = DedupQueries.ContainTau
    val got = DedupQueries.containmentPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("containment"))).toSeq
    assert(got.nonEmpty, "fixture has no containment pairs")
    // ground truth: every co-occurring (a, b) pair from the FULL
    // inverted index, no prefix, no cap
    val sh = graft.util.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(
        shingleHashesOfToks(tokens(col("text")), 3)).as("s"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
    val truth = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("n_a"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") * lit(5L) >= col("n_a") * lit(4L)) // exact τ=4/5
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") / col("n_a").cast("double"))
          .as("containment"))
      .orderBy(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("containment"))).toSeq
    assert(got == truth)
  }

  test("embedded document is caught despite tiny Jaccard") {
    // doc 1 = a 12-token chunk of doc 2's 120 tokens: every 3-shingle
    // of doc 1 occurs in doc 2 (containment 1.0) while Jaccard is
    // ~10/118 — far below any symmetric dedup threshold
    val big = (1 to 120).map(i => s"tok$i").mkString(" ")
    val small = (41 to 52).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, small, "en", "srcA"),
      (2L, big, "en", "srcB"),
      (3L, (200 to 260).map(i => s"w$i").mkString(" "), "en", "srcB"))
    val d = tmpDir("graft-containment")
    writeFixture(d, "documents", rows.toDF("doc_id", "text", "lang", "source"))
    val out = DedupQueries.containmentPairs(spark, d.toString).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("containment")))
    assert(out.exists { case (a, b, c) => a == 1L && b == 2L && c == 1.0 },
      out.toSeq.toString)
    // and the direction matters: big-in-small must NOT qualify
    assert(!out.exists { case (a, b, _) => a == 2L && b == 1L }, out.toSeq.toString)
  }

  test("the probe index is a small fraction of the full index") {
    import graft.functions.TextFunctions.{shingleHashesOfToks, tokens}
    val tau = DedupQueries.ContainTau
    val perDoc = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(shingleHashesOfToks(tokens(col("text")), 3)).as("n"))
      .agg(sum(col("n")).as("full"),
        sum(floor(lit(1 - tau) * col("n")) + lit(1)).as("probe"))
      .head()
    val (full, probe) = (perDoc.getLong(0), perDoc.getLong(1))
    info(s"full index $full postings, probe index $probe")
    assert(probe.toDouble / full.toDouble < 0.25, s"$probe / $full")
  }
}
