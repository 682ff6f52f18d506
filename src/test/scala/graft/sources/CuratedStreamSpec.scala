package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** Streamed curated-corpus refresh: snapshots arriving as micro-batches
  * must leave the served corpus byte-equal to the full rebuild over
  * corpus ∪ (every batch) — the CuratedDeltaSpec equality, reached
  * through the stream-to-batch bridge, including a REPLAYED batch. */
class CuratedStreamSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val dir = "/root/testdata/sf0.001"

  // prefix sweep (catalog + orphaned warehouse dirs) — see SparkSpec
  private def dropAll(prefix: String): Unit = dropPrefix(prefix)

  test("two streamed snapshots + a replay converge to the full rebuild") {
    dropAll("curs"); dropAll("curs_ref")
    CuratedCorpusLayout.build(spark, dir, "curs_ref", buckets = 4)
    val refDocs = CuratedCorpusLayout.serve(spark, "curs_ref")
      .orderBy(col("doc_id")).collect().toSeq
    CuratedCorpusLayout.buildIncremental(spark, dir, "curs", buckets = 4,
      where = !DedupQueries.DeltaPred,
      whereVec = col("vec_id") % 5 =!= 3)
    try {
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .filter(DedupQueries.DeltaPred)
        .select(col("doc_id"), col("source"), col("text"))
        .join(spark.read.parquet(s"$dir/embeddings.parquet")
            .filter(col("vec_id") % 5 === 3)
            .select(col("vec_id").as("doc_id"), col("embedding")),
          Seq("doc_id"), "left")
        .as[(Long, String, String, Option[Array[Float]])]
        .collect().sortBy(_._1)
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val mem = MemoryStream[(Long, String, String, Option[Array[Float]])]
      val q = CuratedCorpusLayout.refreshStream(spark, dir, "curs",
        mem.toDF().toDF("doc_id", "source", "text", "embedding"),
        buckets = 4)
      try {
        mem.addData(b1.toSeq); q.processAllAvailable()
        mem.addData(b2.toSeq); q.processAllAvailable()
        // replay half of batch 2 — the refresh's idempotence absorbs it
        mem.addData(b2.take(b2.length / 2).toSeq); q.processAllAvailable()
      } finally q.stop()
      val got = CuratedCorpusLayout.serve(spark, "curs")
        .orderBy(col("doc_id")).collect().toSeq
      assert(got == refDocs,
        s"streamed curation diverged: got ${got.size}, ref ${refDocs.size}")
      assert(CuratedCorpusLayout.verifyHandoff(spark, "curs")
        .head.getAs[Boolean]("ok"))
    } finally { dropAll("curs"); dropAll("curs_ref") }
  }

  test("streamed assets NOT in the corpus dir still converge (crawl shape)") {
    // the real nightly-crawl contract: batches arrive ONLY through the
    // stream — their texts/embeddings exist nowhere in `dir`, so a
    // later batch's near-dup pair against an earlier streamed asset
    // must verify from the layout's own `_vecs`/`_texts` record
    dropAll("curo"); dropAll("curo_ref")
    val docsAll = spark.read.parquet(s"$dir/documents.parquet")
    val vecsAll = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpusDir = tmpDir("graft-curo-corpus")
    writeFixture(corpusDir, "documents",
      docsAll.filter(!DedupQueries.DeltaPred))
    writeFixture(corpusDir, "embeddings",
      vecsAll.filter(col("vec_id") % 5 =!= 3))
    val unionDir = tmpDir("graft-curo-union")
    writeFixture(unionDir, "documents", docsAll)
    writeFixture(unionDir, "embeddings", vecsAll)
    CuratedCorpusLayout.build(spark, unionDir.toString, "curo_ref",
      buckets = 4)
    val refDocs = CuratedCorpusLayout.serve(spark, "curo_ref")
      .orderBy(col("doc_id")).collect().toSeq
    CuratedCorpusLayout.buildIncremental(spark, corpusDir.toString, "curo",
      buckets = 4)
    try {
      val rows = docsAll.filter(DedupQueries.DeltaPred)
        .select(col("doc_id"), col("source"), col("text"))
        .join(vecsAll.filter(col("vec_id") % 5 === 3)
            .select(col("vec_id").as("doc_id"), col("embedding")),
          Seq("doc_id"), "left")
        .as[(Long, String, String, Option[Array[Float]])]
        .collect().sortBy(_._1)
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val mem = MemoryStream[(Long, String, String, Option[Array[Float]])]
      val q = CuratedCorpusLayout.refreshStream(spark, corpusDir.toString,
        "curo", mem.toDF().toDF("doc_id", "source", "text", "embedding"),
        buckets = 4)
      try {
        mem.addData(b1.toSeq); q.processAllAvailable()
        mem.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      val got = CuratedCorpusLayout.serve(spark, "curo")
        .orderBy(col("doc_id")).collect().toSeq
      assert(got == refDocs,
        s"out-of-dir stream diverged: got ${got.size}, ref ${refDocs.size}")
    } finally { dropAll("curo"); dropAll("curo_ref") }
  }
}
