package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streamed composed path ([[IngestGate.ingestAndCurateStream]])
  * must leave the curated artifact byte-equal to a full rebuild over
  * corpus ∪ (every batch), keep the gate indexes at their one-shot
  * state, and absorb a replayed batch — with verdicts re-emitted
  * identically, never filed twice. */
class IngestAndCurateStreamSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val dir = "/root/testdata/sf0.001"

  test("streamed gate+curation converges to the full rebuild; replay absorbed") {
    Seq("iasg", "iasc", "iasr").foreach(dropPrefix)
    val whereDocs = !(col("doc_id") % 5 === 3)
    val whereVecs = !(col("vec_id") % 5 === 3)
    try {
      // the reference artifact: one-shot full build over corpus ∪ delta
      CuratedCorpusLayout.build(spark, dir, "iasr", buckets = 4)
      val refDocs = CuratedCorpusLayout.serve(spark, "iasr")
        .orderBy(col("doc_id")).collect().toSeq
      assert(refDocs.nonEmpty)

      IngestGate.build(spark, dir, "iasg", buckets = 4, whereDocs, whereVecs)
      CuratedCorpusLayout.buildIncremental(spark, dir, "iasc", buckets = 4,
        where = whereDocs, whereVec = whereVecs)

      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 5 === 3)
        .select(col("doc_id"), col("source"), col("text"))
        .join(spark.read.parquet(s"$dir/embeddings.parquet")
            .filter(col("vec_id") % 5 === 3)
            .select(col("vec_id").as("doc_id"), col("embedding")),
          Seq("doc_id"), "left")
        .as[(Long, String, String, Option[Array[Float]])]
        .collect().sortBy(_._1)
      val (b1, b2) = rows.splitAt(rows.length / 2)

      val verdictBatches =
        scala.collection.mutable.ArrayBuffer[(Long, Seq[org.apache.spark.sql.Row])]()
      val mem = MemoryStream[(Long, String, String, Option[Array[Float]])]
      val q = IngestGate.ingestAndCurateStream(spark, dir, "iasg", "iasc",
        mem.toDF().toDF("doc_id", "source", "text", "embedding"),
        buckets = 4) { (v, id) =>
        verdictBatches += ((id, v.orderBy(col("doc_id")).collect().toSeq))
      }
      try {
        mem.addData(b1.toSeq); q.processAllAvailable()
        mem.addData(b2.toSeq); q.processAllAvailable()
        // replay batch 2 in full — verdicts must re-emit IDENTICALLY
        // (the layouts' anti-joins hide the already-filed copies) and
        // nothing may file twice
        mem.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()

      assert(verdictBatches.size == 3)
      assert(verdictBatches(1)._2.nonEmpty)
      assert(verdictBatches(2)._2 == verdictBatches(1)._2,
        "replayed batch emitted different verdicts")

      val got = CuratedCorpusLayout.serve(spark, "iasc")
        .orderBy(col("doc_id")).collect().toSeq
      assert(got == refDocs,
        s"streamed composed curation diverged: got ${got.size}, " +
          s"ref ${refDocs.size}")
      assert(CuratedCorpusLayout.verifyHandoff(spark, "iasc")
        .head.getAs[Boolean]("ok"))
      // gate text index: no doc filed twice through the replay
      assert(spark.table("iasg_dd_shingles")
        .groupBy(col("doc_id"), col("s")).count()
        .filter(col("count") > 1).isEmpty,
        "replay double-filed gate shingle rows")
    } finally Seq("iasg", "iasc", "iasr").foreach(dropPrefix)
  }
}
