package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Publish atomicity of the generational TEXT and HYBRID-dense
  * indexes — the [[AnnPublishSpec]] contract extended to the other two
  * layouts ([[GenerationPointer]]): a rebuild killed at ANY point must
  * leave readers resolving one COMPLETE generation (postings AND
  * vocab/stats geometry together — the mixed-set window a per-table
  * swap publication had), and the frozen-geometry audits must
  * re-baseline at the pointer flip. */
class TextPublishSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private case class Boom(at: String) extends RuntimeException(at)

  test("text: a build killed before the flip leaves the old generation serving; re-run repairs") {
    dropPrefix("txt_pub")
    try {
      TextIndexLayout.build(spark, dir, "txt_pub", buckets = 4,
        where = col("doc_id") < 300L)
      val gen1 = TextIndexLayout.livePrefix(spark, "txt_pub")
      val before = TextIndexLayout.query(spark, dir, "txt_pub")
        .collect().toSeq
      assert(before.nonEmpty)

      // kill AFTER the new generation (all three tables) is fully
      // written, BEFORE the pointer flips: a reader still resolves the
      // complete OLD index — old postings with old geometry, never new
      // postings against old idf
      val thrown = intercept[Boom] {
        TextIndexLayout.buildImpl(spark, dir, "txt_pub", 4, col("doc_id") >= 0L,
          dropSuperseded = true,
          step => if (step == "before-publish") throw Boom(step))
      }
      assert(thrown.at == "before-publish")
      assert(TextIndexLayout.livePrefix(spark, "txt_pub") == gen1)
      assert(TextIndexLayout.query(spark, dir, "txt_pub")
        .collect().toSeq == before)

      // the re-run sweeps the stranded generation and completes
      TextIndexLayout.build(spark, dir, "txt_pub", buckets = 4)
      val gen2 = TextIndexLayout.livePrefix(spark, "txt_pub")
      assert(gen2 != gen1)
      assert(!spark.catalog.tableExists(s"${gen1}_postings"))
      assert(TextIndexLayout.query(spark, dir, "txt_pub")
        .collect().nonEmpty)
    } finally dropPrefix("txt_pub")
  }

  test("text: killed after the flip serves the NEW generation; audits re-baseline; sweep reclaims") {
    dropPrefix("txt_pub2")
    try {
      // build over HALF the corpus: the staleness audit vs the full
      // live corpus sees a large OOV/doc-count gap
      TextIndexLayout.build(spark, dir, "txt_pub2", buckets = 4,
        where = col("doc_id") < 300L)
      val gen1 = TextIndexLayout.livePrefix(spark, "txt_pub2")
      val staleBefore = TextIndexLayout.stalenessMetrics(spark, dir,
        "txt_pub2").collect().head
      val nFrozen1 = staleBefore.getAs[Long]("n_docs_frozen")

      // rebuild over the FULL corpus, killed between flip and drop:
      // readers see the complete NEW index immediately
      val thrown = intercept[Boom] {
        TextIndexLayout.buildImpl(spark, dir, "txt_pub2", 4, col("doc_id") >= 0L,
          dropSuperseded = true,
          step => if (step == "after-publish") throw Boom(step))
      }
      assert(thrown.at == "after-publish")
      val gen2 = TextIndexLayout.livePrefix(spark, "txt_pub2")
      assert(gen2 != gen1)
      val served = TextIndexLayout.query(spark, dir, "txt_pub2")
        .collect().toSeq
      assert(served.nonEmpty)
      // == the online query over the full corpus: the new geometry and
      // new postings arrived TOGETHER
      assert(served == graft.queries.TextQueries.bm25TopK(spark, dir)
        .collect().toSeq)

      // the audits resolve the LIVE generation's frozen geometry: the
      // rebuild re-baselined them at the flip — n_docs_frozen grew to
      // the full corpus and the OOV mass collapsed to zero
      val staleAfter = TextIndexLayout.stalenessMetrics(spark, dir,
        "txt_pub2").collect().head
      assert(staleAfter.getAs[Long]("n_docs_frozen") > nFrozen1)
      assert(staleAfter.getAs[Long]("oov_mass_ppm") == 0L)
      val drift = TextIndexLayout.driftAudit(spark, dir, "txt_pub2")
        .collect()
      assert(drift.forall(_.getAs[Long]("drift_micro") == 0L))

      // leftover old-generation bytes, reclaimed by the deferred sweep
      assert(spark.catalog.tableExists(s"${gen1}_postings"))
      GenerationPointer.sweepStale(spark, "txt_pub2", keepGenerations = 0)
      assert(!spark.catalog.tableExists(s"${gen1}_postings"))
      assert(TextIndexLayout.query(spark, dir, "txt_pub2")
        .collect().toSeq == served)
    } finally dropPrefix("txt_pub2")
  }

  test("dense leg: kill on both sides of the flip; deltas land in the live generation") {
    dropPrefix("sig_pub")
    try {
      HybridIndexLayout.buildDense(spark, dir, "sig_pub", buckets = 4,
        where = col("vec_id") < 300L)
      val gen1 = HybridIndexLayout.livePrefixDense(spark, "sig_pub")
      val qs = graft.util.Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id"), col("embedding"))
      val before = HybridIndexLayout.serveDense(spark, dir, "sig_pub", qs,
        excludeSelf = true).collect().toSeq
      assert(before.nonEmpty)

      // before-publish kill: old generation keeps serving
      val t1 = intercept[Boom] {
        HybridIndexLayout.buildDenseImpl(spark, dir, "sig_pub", 4,
          col("vec_id") >= 0L, dropSuperseded = true,
          step => if (step == "before-publish") throw Boom(step))
      }
      assert(t1.at == "before-publish")
      assert(HybridIndexLayout.livePrefixDense(spark, "sig_pub") == gen1)
      assert(HybridIndexLayout.serveDense(spark, dir, "sig_pub", qs,
        excludeSelf = true).collect().toSeq == before)

      // after-publish kill: new generation serves; sweep reclaims
      val t2 = intercept[Boom] {
        HybridIndexLayout.buildDenseImpl(spark, dir, "sig_pub", 4,
          col("vec_id") >= 0L, dropSuperseded = true,
          step => if (step == "after-publish") throw Boom(step))
      }
      assert(t2.at == "after-publish")
      val gen2 = HybridIndexLayout.livePrefixDense(spark, "sig_pub")
      assert(gen2 != gen1)
      GenerationPointer.sweepStale(spark, "sig_pub", keepGenerations = 0)
      assert(!spark.catalog.tableExists(s"${gen1}_sigs"))
      // a delta append resolves the live generation (nothing strands
      // in the swept one), and serving equals the one-shot build
      HybridIndexLayout.appendDeltaDense(spark, dir, "sig_pub",
        col("vec_id") >= 0L, buckets = 4) // all filed → no-op
      assert(spark.table(s"${gen2}_sigs").collect().toSet ==
        graft.queries.SimilarityQueries.lshSignatures(spark, dir)
          .collect().toSet)
    } finally dropPrefix("sig_pub")
  }
}
