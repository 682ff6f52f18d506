package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TextQueries
import graft.util.Tables

/** Train-once / score-many persistence for the GD-trained quality
  * classifier — the [[BpeArtifact]]/[[TextIndexLayout]] discipline
  * applied to model weights.
  *
  * The registered query (`txt_quality_lr`) trains and scores in one
  * plan so the DuckDB oracle can unroll the rounds; a production
  * pipeline trains ONCE on a sample, persists the weights, and scores
  * every shard (and every future stream of documents) from the frozen
  * artifact. [[train]] persists the 1-row weight table; [[score]]
  * re-applies the EXACT scoring projection the online query uses
  * (shared `TextQueries.lrScore`), so served scores are byte-equal by
  * construction; [[scoreStream]] runs the same projection on a
  * streaming frame — scoring is a stateless narrow map under a 1-row
  * broadcast, so it needs no watermark, no state store, and no
  * micro-batch coordination beyond the trigger.
  *
  * Scale: the artifact is 4 doubles — the degenerate (and therefore
  * ideal) case of the frozen-geometry rule: nothing about a grown or
  * streamed corpus can shift the model under the scorer's feet.
  */
object LrArtifact {

  /** Train on `dir`'s documents and persist `<prefix>_weights`
    * (b0..b3 + n_train). */
  def train(spark: SparkSession, dir: String, prefix: String): Unit = {
    val feat = TextQueries.lrFeatures(Tables.load(spark, dir, "documents"))
      .persist()
    val n = feat.count()
    TextQueries.lrTrain(spark, feat)
      .withColumn("n_train", lit(n))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_weights")
    feat.unpersist()
  }

  /** The persisted 1-row weight frame. */
  def weights(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_weights")
      .select(col("b0"), col("b1"), col("b2"), col("b3"))

  /** Score an arbitrary (doc_id, text, ...) frame under the frozen
    * weights — the online query's scoring tail with training replaced
    * by a table read. */
  def score(spark: SparkSession, prefix: String, docs: DataFrame): DataFrame =
    TextQueries.lrScore(TextQueries.lrFeatures(docs), weights(spark, prefix))

  /** Streaming twin of [[score]]: the same shared projection applied
    * to a streaming (doc_id, text) frame. The weight side is a 1-row
    * STATIC broadcast — a stream-static cross join Spark executes as
    * a stateless per-batch map, so scored rows flow with no state.
    * Note [[TextQueries.lrFeatures]]'s repartition is dropped for the
    * stream (a shuffle per micro-batch buys nothing at trigger-sized
    * batches); the scoring expressions are identical. */
  def scoreStream(spark: SparkSession, prefix: String,
      stream: DataFrame): DataFrame = {
    val w = weights(spark, prefix).head()
    val lit4 = Seq(lit(w.getDouble(0)).as("b0"), lit(w.getDouble(1)).as("b1"),
      lit(w.getDouble(2)).as("b2"), lit(w.getDouble(3)).as("b3"))
    // a 4-double model is loaded like any served model: read once at
    // query build, inlined as literals (the BpeArtifact.encodeDocs
    // pattern — artifact reads are not data-path collects)
    val feat = TextQueries.lrFeaturesNoShuffle(stream)
    TextQueries.lrScore(feat.select((feat.columns.map(col) ++ lit4): _*))
  }
}
