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
    val drop = () => Seq("cells", "codes", "coarse", "pqcb").foreach(t =>
      Seq("ann_sd", "ann_sd_ref").foreach(p =>
        spark.sql(s"DROP TABLE IF EXISTS ${p}_$t")))
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

      def diff(t: String): Unit = {
        val s = spark.table(s"ann_sd_$t").collect().toSet
        val r = spark.table(s"ann_sd_ref_$t").collect().toSet
        assert(s == r, s"$t only-stream=${(s -- r).take(5)} " +
          s"only-ref=${(r -- s).take(5)} sizes=${s.size}/${r.size}")
      }
      diff("cells")
      diff("codes")
      // counts too: set equality alone would hide double-filed rows
      assert(spark.table("ann_sd_cells").count() ==
        spark.table("ann_sd_ref_cells").count())
      assert(spark.table("ann_sd_codes").count() ==
        spark.table("ann_sd_ref_codes").count())
      // and the serve surface is byte-equal
      assert(AnnIndexLayout.query(spark, dir, "ann_sd").collect().toSeq ==
        AnnIndexLayout.query(spark, dir, "ann_sd_ref").collect().toSeq)
    } finally drop()
  }

  test("streamed text deltas equal the batch delta; replays append nothing") {
    val drop = () => Seq("postings", "vocab", "stats").foreach(t =>
      Seq("txt_sd", "txt_sd_ref").foreach(p =>
        spark.sql(s"DROP TABLE IF EXISTS ${p}_$t")))
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

      assert(spark.table("txt_sd_postings").collect().toSet ==
        spark.table("txt_sd_ref_postings").collect().toSet)
      assert(spark.table("txt_sd_postings").count() ==
        spark.table("txt_sd_ref_postings").count())
      assert(TextIndexLayout.query(spark, dir, "txt_sd").collect().toSeq ==
        TextIndexLayout.query(spark, dir, "txt_sd_ref").collect().toSeq)
    } finally drop()
  }
}
