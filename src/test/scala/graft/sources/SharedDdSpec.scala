package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ONE `_dd` shingle index per composed gate+curation deployment
  * ([[IngestGate.buildWithCurated]]): the curated layout borrows the
  * gate's MinHash index instead of keeping a byte-identical copy —
  * and nothing downstream can tell. Verdicts, the served corpus, the
  * manifest, and replay idempotence must all be byte-equal to the
  * two-copy deployment, with exactly one filing per snapshot. */
class SharedDdSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val whereDocs = !(col("doc_id") % 5 === 3)
  private val whereVecs = !(col("vec_id") % 5 === 3)

  // two disjoint snapshot deltas carving up the non-corpus residue
  private def docsOf(pred: org.apache.spark.sql.Column) =
    spark.read.parquet(s"$dir/documents.parquet").filter(pred)
      .select(col("doc_id"), col("source"), col("text"))
  private def vecsOf(pred: org.apache.spark.sql.Column) =
    spark.read.parquet(s"$dir/embeddings.parquet").filter(pred)
      .select(col("vec_id"), col("embedding"))
  private def d1Docs = docsOf(col("doc_id") % 10 === 3)
  private def d1Vecs = vecsOf(col("vec_id") % 10 === 3)
  private def d2Docs = docsOf(col("doc_id") % 10 === 8)
  private def d2Vecs = vecsOf(col("vec_id") % 10 === 8)

  private val all = Seq("sddg_u", "sddc_u", "sddg_s", "sddc_s")

  test("shared-dd composed deployment == two-copy deployment, with one index and one filing") {
    all.foreach(dropPrefix)
    try {
      // two-copy control
      IngestGate.build(spark, dir, "sddg_u", buckets = 4, whereDocs,
        whereVecs)
      CuratedCorpusLayout.buildIncremental(spark, dir, "sddc_u",
        buckets = 4, where = whereDocs, whereVec = whereVecs)
      // shared deployment: curated borrows the gate's _dd
      IngestGate.buildWithCurated(spark, dir, "sddg_s", "sddc_s",
        buckets = 4, whereDocs = whereDocs, whereVecs = whereVecs)

      // ONE index: the shared curated prefix owns no shingle tables
      assert(!spark.catalog.tableExists("sddc_s_dd_shingles"))
      assert(!spark.catalog.tableExists("sddc_s_dd_bands"))
      assert(CuratedCorpusLayout.ddPrefixOf(spark, "sddc_s") == "sddg_s_dd")
      assert(CuratedCorpusLayout.ddPrefixOf(spark, "sddc_u") == "sddc_u_dd")

      val vS = IngestGate.ingestAndCurate(spark, dir, "sddg_s", "sddc_s",
        d1Docs, d1Vecs, buckets = 4).orderBy(col("doc_id")).collect().toSeq
      val vU = IngestGate.ingestAndCurate(spark, dir, "sddg_u", "sddc_u",
        d1Docs, d1Vecs, buckets = 4).orderBy(col("doc_id")).collect().toSeq
      assert(vS.nonEmpty && vS == vU,
        s"verdicts drifted: ${vS.size} vs ${vU.size}; first diff: " +
          s"${vS.zipAll(vU, null, null).find(p => p._1 != p._2)}")

      val dS = CuratedCorpusLayout.serve(spark, "sddc_s")
        .orderBy(col("doc_id")).collect().toSeq
      val dU = CuratedCorpusLayout.serve(spark, "sddc_u")
        .orderBy(col("doc_id")).collect().toSeq
      assert(dS.nonEmpty && dS == dU,
        s"curated corpus drifted: ${dS.size} vs ${dU.size}")
      assert(CuratedCorpusLayout.manifest(spark, "sddc_s")
        .orderBy(col("stage")).collect().toSeq ==
        CuratedCorpusLayout.manifest(spark, "sddc_u")
          .orderBy(col("stage")).collect().toSeq)
      assert(CuratedCorpusLayout.verifyHandoff(spark, "sddc_s")
        .head.getAs[Boolean]("ok"))

      // ONE filing: the shared index holds each (doc_id, s) row once —
      // the gate's append landed it and the refresh skipped its own
      assert(spark.table("sddg_s_dd_shingles")
        .groupBy(col("doc_id"), col("s")).count()
        .filter(col("count") > 1).isEmpty,
        "shared dd holds double-filed shingle rows")
      assert(spark.table("sddg_s_dd_shingles").count() ==
        spark.table("sddg_u_dd_shingles").count())

      // replay: identical verdicts, artifact unchanged, still one copy
      val replay = IngestGate.ingestAndCurate(spark, dir, "sddg_s",
        "sddc_s", d1Docs, d1Vecs, buckets = 4)
        .orderBy(col("doc_id")).collect().toSeq
      assert(replay == vS, "replayed verdicts drifted on the shared dd")
      assert(CuratedCorpusLayout.serve(spark, "sddc_s")
        .orderBy(col("doc_id")).collect().toSeq == dS)
      assert(spark.table("sddg_s_dd_shingles").count() ==
        spark.table("sddg_u_dd_shingles").count())

      // a STANDALONE refresh (no gate in the loop) on the shared
      // prefix still files the shared index itself — its idempotent
      // append is the fallback when the gate didn't land the delta
      CuratedCorpusLayout.refresh(spark, dir, "sddc_s", d2Docs, d2Vecs,
        buckets = 4)
      CuratedCorpusLayout.refresh(spark, dir, "sddc_u", d2Docs, d2Vecs,
        buckets = 4)
      val dS2 = CuratedCorpusLayout.serve(spark, "sddc_s")
        .orderBy(col("doc_id")).collect().toSeq
      val dU2 = CuratedCorpusLayout.serve(spark, "sddc_u")
        .orderBy(col("doc_id")).collect().toSeq
      assert(dS2.nonEmpty && dS2 == dU2,
        "standalone refresh on the shared prefix drifted")
      // and the delta reached the ONE shared index exactly once
      assert(spark.table("sddg_s_dd_shingles")
        .groupBy(col("doc_id"), col("s")).count()
        .filter(col("count") > 1).isEmpty)
    } finally all.foreach(dropPrefix)
  }

  test("borrowing an index over a different corpus fails fast") {
    Seq("sddx_g", "sddx_c").foreach(dropPrefix)
    try {
      IngestGate.build(spark, dir, "sddx_g", buckets = 4,
        whereDocs = col("doc_id") < 300L, whereVecs = col("vec_id") < 300L)
      val e = intercept[IllegalArgumentException] {
        CuratedCorpusLayout.buildIncremental(spark, dir, "sddx_c",
          buckets = 4, where = col("doc_id") < 200L,
          whereVec = col("vec_id") < 200L,
          ddPrefix = Some("sddx_g_dd"))
      }
      assert(e.getMessage.contains("different corpus"), e.getMessage)
      // and a borrow of a non-existent index names the fix
      val e2 = intercept[IllegalArgumentException] {
        CuratedCorpusLayout.buildIncremental(spark, dir, "sddx_c",
          buckets = 4, ddPrefix = Some("sddx_nope_dd"))
      }
      assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    } finally Seq("sddx_g", "sddx_c").foreach(dropPrefix)
  }
}
