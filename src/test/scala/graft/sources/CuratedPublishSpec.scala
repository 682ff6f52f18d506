package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** REBUILD publication of the curated artifact — the ordered-swap
  * proof in [[CuratedCorpusLayout]]'s header, killed on both sides of
  * the `_docs` swap (the AnnPublishSpec/TextPublishSpec discipline):
  * a rebuild crashing BEFORE the swap must leave the old reader
  * surface — docs, TOMBSTONES (no resurrection of refresh-evicted
  * docs), manifest, checksums — byte-identical and gate-green; a
  * rebuild crashing AFTER it must be fail-closed (ok=false) until the
  * re-run completes, never a silent docs/manifest mix. */
class CuratedPublishSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private case class Boom(at: String) extends RuntimeException(at)

  private def deltaDocs = spark.read.parquet(s"$dir/documents.parquet")
    .filter(DedupQueries.DeltaPred)
    .select(col("doc_id"), col("source"), col("text"))
  private def deltaVecs = spark.read.parquet(s"$dir/embeddings.parquet")
    .filter(col("vec_id") % 5 === 3)
    .select(col("vec_id"), col("embedding"))

  private def killedRebuild(prefix: String, at: String): Unit = {
    val thrown = intercept[Boom] {
      CuratedCorpusLayout.buildIncrementalImpl(spark, dir, prefix, 4,
        lit(true), lit(true), DedupQueries.CosineLshBands,
        CuratedCorpusLayout.AutoPlanes, None,
        step => if (step == at) throw Boom(step))
    }
    assert(thrown.at == at)
  }

  test("rebuild killed BEFORE the docs swap: old surface fully consistent, evicted docs stay evicted") {
    dropPrefix("cpub")
    try {
      // corpus-only build + one evicting refresh, so the live surface
      // carries non-empty tombstone state (the thing a mis-ordered
      // rebuild would resurrect)
      CuratedCorpusLayout.buildIncremental(spark, dir, "cpub",
        buckets = 4, where = !DedupQueries.DeltaPred,
        whereVec = col("vec_id") % 5 =!= 3)
      CuratedCorpusLayout.refresh(spark, dir, "cpub", deltaDocs,
        deltaVecs, buckets = 4)
      assert(Tombstones.ids(spark, "cpub").count() > 0L,
        "no refresh evictions at this fixture — the resurrection pin " +
          "below would be vacuous")
      val served = CuratedCorpusLayout.serve(spark, "cpub")
        .orderBy(col("doc_id")).collect().toSeq
      val man = CuratedCorpusLayout.manifest(spark, "cpub")
        .orderBy(col("stage")).collect().toSeq
      assert(CuratedCorpusLayout.verifyHandoff(spark, "cpub")
        .head.getAs[Boolean]("ok"))

      killedRebuild("cpub", "before-docs-swap")

      // the ENTIRE old surface serves on: docs (tombstones included —
      // nothing resurrected), manifest, and a green gate
      assert(CuratedCorpusLayout.serve(spark, "cpub")
        .orderBy(col("doc_id")).collect().toSeq == served)
      assert(CuratedCorpusLayout.manifest(spark, "cpub")
        .orderBy(col("stage")).collect().toSeq == man)
      assert(CuratedCorpusLayout.verifyHandoff(spark, "cpub")
        .head.getAs[Boolean]("ok"))

      // the re-run completes and the artifact equals a clean full
      // incremental build
      CuratedCorpusLayout.buildIncremental(spark, dir, "cpub",
        buckets = 4)
      dropPrefix("cpub_ref")
      try {
        CuratedCorpusLayout.buildIncremental(spark, dir, "cpub_ref",
          buckets = 4)
        assert(CuratedCorpusLayout.serve(spark, "cpub")
          .orderBy(col("doc_id")).collect().toSeq ==
          CuratedCorpusLayout.serve(spark, "cpub_ref")
            .orderBy(col("doc_id")).collect().toSeq)
        assert(CuratedCorpusLayout.verifyHandoff(spark, "cpub")
          .head.getAs[Boolean]("ok"))
      } finally dropPrefix("cpub_ref")
    } finally dropPrefix("cpub")
  }

  test("rebuild killed AFTER the docs swap: fail-closed until the re-run, never a silent docs/manifest mix") {
    dropPrefix("cpub2")
    try {
      CuratedCorpusLayout.buildIncremental(spark, dir, "cpub2",
        buckets = 4, where = !DedupQueries.DeltaPred,
        whereVec = col("vec_id") % 5 =!= 3)
      val oldServed = CuratedCorpusLayout.serve(spark, "cpub2")
        .orderBy(col("doc_id")).collect().toSeq
      val oldMan = CuratedCorpusLayout.manifest(spark, "cpub2")
        .orderBy(col("stage")).collect().toSeq

      killedRebuild("cpub2", "after-docs-swap")

      // the crash window: NEW docs against the OLD manifest/checksums
      // — the gate refuses (fail-closed), so the mix is detected, and
      // the stale manifest can never be silently paired with the new
      // docs by a gated consumer
      val torn = CuratedCorpusLayout.serve(spark, "cpub2")
        .orderBy(col("doc_id")).collect().toSeq
      assert(torn != oldServed, "docs swap did not land — weak fixture")
      assert(CuratedCorpusLayout.manifest(spark, "cpub2")
        .orderBy(col("stage")).collect().toSeq == oldMan)
      assert(!CuratedCorpusLayout.verifyHandoff(spark, "cpub2")
        .head.getAs[Boolean]("ok"))

      // re-running the rebuild repairs: gate green, manifest new
      CuratedCorpusLayout.buildIncremental(spark, dir, "cpub2",
        buckets = 4)
      assert(CuratedCorpusLayout.verifyHandoff(spark, "cpub2")
        .head.getAs[Boolean]("ok"))
      assert(CuratedCorpusLayout.manifest(spark, "cpub2")
        .orderBy(col("stage")).collect().toSeq != oldMan)
    } finally dropPrefix("cpub2")
  }
}
