package graft.queries


import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.SparkSpec

/** The r7 txt_pack_sequences rework distributes the per-source prefix
  * sum across range partitions. The oracle pins two corpus sizes; this
  * spec pins the general equivalence with the serial per-source window
  * form on crafted corpora: a single source dominating the corpus (the
  * exact skew the rework exists for), single-doc sources, doc_id gaps,
  * and documents larger than the 512-token budget. */
class PackSequencesPropertySpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir("graft-pack").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(5)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The pre-rework formulation: serial cumulative window per source. */
  private def windowed(dir: String) = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    graft.util.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr("cum_before div 512"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .withColumn("fill_ratio", col("seq_tokens").cast(DoubleType) / lit(512.0))
      .orderBy(col("source"), col("seq_id"))
  }

  test("distributed prefix sum == serial window on skewed corpora") {
    val rnd = new scala.util.Random(7)
    def doc(n: Int): String = Seq.fill(n)("tok").mkString(" ")
    val rows =
      // one dominant source: 400 docs with gaps in doc_id
      (0 until 400).map(i =>
        (i * 3L, doc(1 + rnd.nextInt(200)), "dominant")) ++
      // a source of single over-budget docs (> 512 tokens each)
      (0 until 5).map(i => (10000L + i, doc(600 + i), "oversized")) ++
      // a single-doc source
      Seq((20000L, doc(17), "lonely"))
    val dir = writeDocs(rows)
    val got = TextQueries.packSequences(spark, dir).collect().map(_.toString).toSeq
    val want = windowed(dir).collect().map(_.toString).toSeq
    assert(got == want, s"\n got=${got.take(5)}\nwant=${want.take(5)}")
    assert(want.size > 40) // the dominant source actually split into many packs
  }
}
