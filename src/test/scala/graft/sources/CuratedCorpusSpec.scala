package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** Build-once contract of the curated-corpus artifact: serving must be
  * byte-equal to a live re-curation WITHOUT recomputing any chain
  * stage, the persisted manifest must reconcile with the registered
  * `pipeline_curate` rows, a rebuild must swap in atomically and
  * reproduce identical tables, and the checksum handoff gate must
  * catch post-publication tampering. */
class CuratedCorpusSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dropArtifact(prefix: String): Unit =
    Seq("docs", "manifest", "checksums").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  test("serve is byte-equal to a live re-curation; plan recomputes nothing") {
    dropArtifact("cur_art")
    CuratedCorpusLayout.build(spark, dir, "cur_art", buckets = 4)
    try {
      val served = CuratedCorpusLayout.serve(spark, "cur_art")
      // independent recompute: fresh chain run, same join back to text
      val (survivors, _) = DedupQueries.curateChain(spark, dir)
      val expected = survivors
        .select(col("doc_id"), col("source"), col("h"), col("n_tokens"))
        .join(graft.util.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text")), "doc_id")
        .collect().toSet
      assert(expected.nonEmpty)
      assert(served.collect().toSet == expected)
      assert(served.count() == expected.size)

      // the serve plan is a bare bucketed-table scan: none of the
      // chain's stages (document scan, posting cap constant, pair
      // joins, windows) appear
      val p = served.queryExecution.executedPlan.toString
      assert(p.contains("cur_art_docs"), p)
      assert(!p.contains("documents.parquet"), p)
      assert(!p.contains("1048576"), p)
      assert(!p.contains("SortMergeJoin"), p)

      // the manifest is the registered query's exact rows
      val live = graft.SparkEntry.queries("pipeline_curate")(spark, dir)
        .collect().toSeq
      val stored = CuratedCorpusLayout.manifest(spark, "cur_art")
        .orderBy(col("stage")).collect().toSeq
      assert(stored == live)
    } finally dropArtifact("cur_art")
  }

  test("servePacked window count reconciles with the manifest pack row") {
    dropArtifact("cur_pack")
    CuratedCorpusLayout.build(spark, dir, "cur_pack", buckets = 4)
    try {
      val packed = CuratedCorpusLayout.servePacked(spark, "cur_pack")
        .localCheckpoint(true)
      val nSeq = packed.count()
      val packRow = CuratedCorpusLayout.manifest(spark, "cur_pack")
        .filter(col("stage_name") === "pack").head()
      // same bin, same per-source doc_id prefix rule as the chain's
      // own pack accounting — the training run's cross-check
      assert(nSeq == packRow.getAs[Long]("n_out"),
        s"packed $nSeq windows, manifest promised ${packRow.get(4)}")
      assert(packed.agg(sum(col("seq_tokens"))).head.getLong(0) ==
        packRow.getAs[Long]("tokens_out"))
      // reads the artifact only: persisted n_tokens, no tokenization
      // (inspect a FRESH plan — the checkpointed frame above is
      // already truncated to an RDD scan)
      val plan = CuratedCorpusLayout.servePacked(spark, "cur_pack")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("split("), s"tokenized at serve time:\n$plan")
    } finally dropArtifact("cur_pack")
  }

  test("rebuild swaps atomically and reproduces identical tables") {
    dropArtifact("cur_art2")
    CuratedCorpusLayout.build(spark, dir, "cur_art2", buckets = 4)
    try {
      val before = CuratedCorpusLayout.serve(spark, "cur_art2")
        .collect().toSet
      val chkBefore = spark.table("cur_art2_checksums").collect().toSeq
      // second build exercises the write-aside + checked-rename branch
      CuratedCorpusLayout.build(spark, dir, "cur_art2", buckets = 4)
      assert(CuratedCorpusLayout.serve(spark, "cur_art2")
        .collect().toSet == before)
      assert(spark.table("cur_art2_checksums").collect().toSeq == chkBefore)
    } finally dropArtifact("cur_art2")
  }

  test("checksum gate: clean handoff passes; tampering fails it") {
    dropArtifact("cur_gate")
    CuratedCorpusLayout.build(spark, dir, "cur_gate", buckets = 4)
    try {
      val clean = CuratedCorpusLayout.verifyHandoff(spark, "cur_gate")
        .collect().head
      assert(clean.getAs[Boolean]("ok"), clean.toString)
      // tamper AFTER publication: one forged row appended to the store
      import spark.implicits._
      BucketedTables.appendBucketed(
        Seq((999999L, "forged", "deadbeef", 1L, "injected"))
          .toDF("doc_id", "source", "h", "n_tokens", "text"),
        "cur_gate_docs", "doc_id", 4)
      spark.catalog.refreshTable("cur_gate_docs")
      val tampered = CuratedCorpusLayout.verifyHandoff(spark, "cur_gate")
        .collect().head
      assert(!tampered.getAs[Boolean]("ok"), tampered.toString)
    } finally dropArtifact("cur_gate")
  }
}
