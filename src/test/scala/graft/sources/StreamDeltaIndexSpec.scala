package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.queries.TextQueries

/** Stream-fed index maintenance contract: new vectors/documents
  * flowing through `maintainStream` (one idempotent delta per
  * micro-batch) must leave the persisted index BYTE-EQUAL to a batch
  * `build` + `appendDelta` over the same data split — including when
  * a micro-batch is REPLAYED (restart without a committed offset),
  * which the n_id/doc_id anti-joins absorb with no sink-side state. */
class StreamDeltaIndexSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val dir = "/root/testdata/sf0.001"

  test("streamed ANN deltas equal the batch delta; replays append nothing") {
    // "ann_sd_ref" extends the "ann_sd" prefix, so sweeping "ann_sd"
    // drops both suites' state (the documented dropPrefix behavior)
    val drop = () => dropPrefix("ann_sd")
    drop()
    val predA = col("vec_id") < 300L
    // reference: batch build over A, one batch delta for the rest
    AnnIndexLayout.build(spark, dir, "ann_sd_ref", buckets = 4, where = predA)
    AnnIndexLayout.appendDelta(spark, dir, "ann_sd_ref",
      col("vec_id") >= 300L, buckets = 4)
    // stream path: same build, then the delta arrives as THREE
    // micro-batches where the third REPLAYS half of the second
    AnnIndexLayout.build(spark, dir, "ann_sd", buckets = 4, where = predA)
    try {
      val delta = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") >= 300L)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val (b1, rest) = delta.splitAt(delta.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      val mem = MemoryStream[(Long, Array[Float])]
      val q = AnnIndexLayout.maintainStream(spark, "ann_sd",
        mem.toDF().toDF("vec_id", "embedding"), buckets = 4)
      try {
        mem.addData(b1.toSeq)
        q.processAllAvailable()
        mem.addData(b2.toSeq)
        q.processAllAvailable()
        mem.addData((b2.take(b2.length / 2) ++ b3).toSeq) // replay half of b2
        q.processAllAvailable()
      } finally q.stop()

      val physS = AnnIndexLayout.livePrefix(spark, "ann_sd")
      val physR = AnnIndexLayout.livePrefix(spark, "ann_sd_ref")
      def diff(t: String): Unit = {
        val s = spark.table(s"${physS}_$t").collect().toSet
        val r = spark.table(s"${physR}_$t").collect().toSet
        assert(s == r, s"$t only-stream=${(s -- r).take(5)} " +
          s"only-ref=${(r -- s).take(5)} sizes=${s.size}/${r.size}")
      }
      diff("cells")
      diff("codes")
      // counts too: set equality alone would hide double-filed rows
      assert(spark.table(s"${physS}_cells").count() ==
        spark.table(s"${physR}_cells").count())
      assert(spark.table(s"${physS}_codes").count() ==
        spark.table(s"${physR}_codes").count())
      // and the serve surface is byte-equal
      assert(AnnIndexLayout.query(spark, dir, "ann_sd").collect().toSeq ==
        AnnIndexLayout.query(spark, dir, "ann_sd_ref").collect().toSeq)
    } finally drop()
  }

  test("streamed dedup ingest: pairs dedup exactly-once end to end") {
    val drop = () => Seq("shingles", "bands", "ids").foreach(t =>
      Seq("dd_sd", "dd_sd_ref").foreach(p =>
        spark.sql(s"DROP TABLE IF EXISTS ${p}_$t")))
    drop()
    val predA = col("doc_id") < 300L
    // reference: batch build over A, the rest as one batch append
    DedupIndexLayout.buildDocs(spark, "dd_sd_ref",
      graft.util.Tables.load(spark, dir, "documents").filter(predA)
        .select(col("doc_id"), col("text")), buckets = 4)
    DedupIndexLayout.appendDeltaDocs(spark, "dd_sd_ref",
      graft.util.Tables.load(spark, dir, "documents").filter(!predA)
        .select(col("doc_id"), col("text")), buckets = 4)
    // ground truth for the EMITTED pairs: full-corpus pairs touching
    // any streamed (delta) doc
    val truth = graft.queries.DedupQueries.minhashPairs(spark, dir)
      .filter(col("doc_a") >= 300L || col("doc_b") >= 300L)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(truth.nonEmpty)

    DedupIndexLayout.buildDocs(spark, "dd_sd",
      graft.util.Tables.load(spark, dir, "documents").filter(predA)
        .select(col("doc_id"), col("text")), buckets = 4)
    try {
      val delta = graft.util.Tables.load(spark, dir, "documents")
        .filter(!predA).select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      val (b1, b2) = delta.splitAt(delta.length / 2)
      // the sink's usual contract: idempotent upsert keyed on the pair
      val upserted = scala.collection.mutable.Map[(Long, Long), Double]()
      val mem = MemoryStream[(Long, String)]
      val q = DedupIndexLayout.ingestStream(spark, "dd_sd",
        mem.toDF().toDF("doc_id", "text"), buckets = 4) { (pairs, _) =>
        pairs.collect().foreach(r => upserted.update(
          (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
          r.getAs[Double]("jaccard")))
      }
      try {
        mem.addData(b1.toSeq)
        q.processAllAvailable()
        mem.addData((b1.takeRight(10) ++ b2).toSeq) // replay tail of b1
        q.processAllAvailable()
      } finally q.stop()

      // at-least-once pair emission + idempotent upsert == the exact
      // full-corpus pair set touching the streamed docs
      assert(upserted.toMap == truth)
      // and the index itself is byte-equal to the batch-built twin
      assert(spark.table("dd_sd_shingles").collect().toSet ==
        spark.table("dd_sd_ref_shingles").collect().toSet)
      assert(spark.table("dd_sd_shingles").count() ==
        spark.table("dd_sd_ref_shingles").count())
      assert(spark.table("dd_sd_bands").collect().toSet ==
        spark.table("dd_sd_ref_bands").collect().toSet)
      assert(spark.table("dd_sd_bands").count() ==
        spark.table("dd_sd_ref_bands").count())
    } finally drop()
  }

  test("streamed text deltas equal the batch delta; replays append nothing") {
    // dropPrefix("txt_sd") also sweeps txt_sd_ref_* (the documented
    // nested-prefix behavior — dropped together deliberately)
    val drop = () => dropPrefix("txt_sd")
    drop()
    val predA = col("doc_id") < 300L
    TextIndexLayout.build(spark, dir, "txt_sd_ref", buckets = 4, where = predA)
    TextIndexLayout.appendDelta(spark, dir, "txt_sd_ref",
      col("doc_id") >= 300L, buckets = 4)
    TextIndexLayout.build(spark, dir, "txt_sd", buckets = 4, where = predA)
    try {
      val delta = graft.util.Tables.load(spark, dir, "documents")
        .filter(col("doc_id") >= 300L)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      val (b1, b2) = delta.splitAt(delta.length / 2)
      val mem = MemoryStream[(Long, String)]
      val q = TextIndexLayout.maintainStream(spark, "txt_sd",
        mem.toDF().toDF("doc_id", "text"), buckets = 4)
      try {
        mem.addData(b1.toSeq)
        q.processAllAvailable()
        mem.addData((b1.takeRight(5) ++ b2).toSeq) // replay tail of b1
        q.processAllAvailable()
      } finally q.stop()

      assert(spark.table(s"${TextIndexLayout.livePrefix(spark, "txt_sd")}_postings").collect().toSet ==
        spark.table(s"${TextIndexLayout.livePrefix(spark, "txt_sd_ref")}_postings").collect().toSet)
      assert(spark.table(s"${TextIndexLayout.livePrefix(spark, "txt_sd")}_postings").count() ==
        spark.table(s"${TextIndexLayout.livePrefix(spark, "txt_sd_ref")}_postings").count())
      assert(TextIndexLayout.query(spark, dir, "txt_sd").collect().toSeq ==
        TextIndexLayout.query(spark, dir, "txt_sd_ref").collect().toSeq)
    } finally drop()
  }
}
