package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextQueries

/** LrArtifact: train-once/score-many for the GD-trained classifier.
  * Persisted weights must equal the online query's; the batch serve
  * path must be byte-equal to the query's scoring; the streaming serve
  * path must produce the same rows as the batch path. */
class LrArtifactSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val dir = "/root/testdata/sf0.001"

  private def drop(prefix: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_weights")

  test("persisted weights match the online query; serve is byte-equal to lrScore") {
    drop("lrart")
    LrArtifact.train(spark, dir, "lrart")
    try {

    // weights equal the online query's trained weights (as published
    // in the query's micro columns)
    val fromQuery = TextQueries.qualityLr(spark, dir).head()
    val w = LrArtifact.weights(spark, "lrart").head()
    for ((qIdx, wIdx) <- Seq(3 -> 0, 4 -> 1, 5 -> 2, 6 -> 3)) {
      assert(fromQuery.getLong(qIdx) == math.round(w.getDouble(wIdx) * 1e6))
    }
    assert(spark.table("lrart_weights").head().getAs[Long]("n_train") > 0L)

    // served scores over the training corpus == the online scoring
    val docs = graft.util.Tables.load(spark, dir, "documents")
    val served = LrArtifact.score(spark, "lrart", docs)
      .orderBy(col("doc_id")).collect().toSeq
    val feat = TextQueries.lrFeatures(docs).persist()
    feat.count()
    val online = TextQueries.lrScore(feat, TextQueries.lrTrain(spark, feat))
      .orderBy(col("doc_id")).collect().toSeq
    feat.unpersist()
    assert(served == online)
    } finally drop("lrart") // same-session drop removes the location
  }

  test("frozen weights score NEW documents the training corpus never saw") {
    drop("lrart2")
    LrArtifact.train(spark, dir, "lrart2")
    try {
    val fresh = Seq(
      (9001L, (0 until 40).map(i => s"new$i").mkString(" ")),
      (9002L, "tiny doc"))
      .toDF("doc_id", "text")
    val got = LrArtifact.score(spark, "lrart2", fresh)
      .orderBy(col("doc_id")).collect()
    assert(got.length == 2)
    // long diverse doc outranks the 2-token one under any sane model
    assert(got(0).getLong(2) > got(1).getLong(2))
    assert(got(0).getLong(1) == 1L && got(1).getLong(1) == 0L)
    } finally drop("lrart2")
  }

  test("streaming serve emits the same scored rows as the batch serve") {
    drop("lrart3")
    LrArtifact.train(spark, dir, "lrart3")
    try {
    val rows = Seq(
      (1L, (0 until 40).map(i => s"a$i").mkString(" ")),
      (2L, "the the the a a data data short"),
      (3L, (0 until 30).map(_ => "rep").mkString(" ")))

    val mem = MemoryStream[(Long, String)]
    val scored = LrArtifact.scoreStream(spark, "lrart3",
      mem.toDF().toDF("doc_id", "text"))
    val q = scored.writeStream.format("memory")
      .queryName("lr_stream_scores").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("lr_stream_scores")
      .orderBy(col("doc_id")).collect().toSeq
    val batch = LrArtifact.score(spark, "lrart3",
        rows.toDF("doc_id", "text"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(streamed == batch)
    } finally drop("lrart3")
  }
}
