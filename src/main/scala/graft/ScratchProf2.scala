package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries
import graft.sources.{BucketedTables, CuratedCorpusLayout, DedupIndexLayout}

/** Dev scratch: refresh phase timing at 10x. DELETE before commit. */
object ScratchProf2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/tmp/graft-sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-sp2-wh").toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof2] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val prefix = "sp2"
    val buckets = 8
    val deltaDocPred = DedupQueries.DeltaPred && col("doc_id") < 5000L
    val deltaVecPred = col("vec_id") % 5 === 3 && col("vec_id") < 5000L
    t("buildIncremental (corpus)")(
      CuratedCorpusLayout.buildIncremental(spark, sfDir, prefix, buckets,
        where = !deltaDocPred, whereVec = !deltaVecPred))
    val deltaDocs = graft.util.Tables.load(spark, sfDir, "documents")
      .filter(deltaDocPred).select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true)
    val deltaVecs = graft.util.Tables.load(spark, sfDir, "embeddings")
      .filter(deltaVecPred).select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val ids = deltaDocs.select(col("doc_id")).localCheckpoint(true)
    val deltaBase = t("deltaBase")(
      DedupQueries.curateBaseOf(deltaDocs).localCheckpoint(true))
    val mhNew = t("dedupDelta construct")(
      DedupIndexLayout.dedupDelta(spark, s"${prefix}_dd", deltaDocs))
    t("mh pairs append")(
      BucketedTables.appendBucketed(
        mhNew.join(spark.table(s"${prefix}_mh_pairs")
            .select(col("doc_a"), col("doc_b")),
          Seq("doc_a", "doc_b"), "left_anti"),
        s"${prefix}_mh_pairs", "doc_a", buckets))
    spark.catalog.refreshTable(s"${prefix}_mh_pairs")
    val shD = t("shD")(
      DedupQueries.withSizes(DedupQueries.shinglesOf(deltaDocs))
        .localCheckpoint(true))
    val corpusSized = BucketedTables.read(spark, s"${prefix}_dd_shingles")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    val allBase = BucketedTables.read(spark, s"${prefix}_base")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("is_train"))
      .unionByName(deltaBase.select(col("doc_id"), col("is_train")))
    val ctState = t("ct state construct")(
      DedupQueries.contamPairsState(corpusSized, shD, allBase, ids,
        spark.table(s"${prefix}_ct_pairs")).localCheckpoint(true))
    t("ct state write")(
      BucketedTables.replaceBucketed(spark, s"${prefix}_ct_pairs", "doc_id",
        buckets, ctState))
    t("dd append")(
      DedupIndexLayout.appendDeltaDocs(spark, s"${prefix}_dd", deltaDocs,
        buckets))
    val dv = DedupQueries.normedDirVecs(
      deltaVecs.dropDuplicates("vec_id")).localCheckpoint(true)
    val dIds = dv.select(col("vec_id")).localCheckpoint(true)
    val dBands = DedupQueries.cosineBandsOf(dv).localCheckpoint(true)
    val storedBands = BucketedTables.read(spark, s"${prefix}_cos_bands")
      .join(broadcast(dIds), Seq("vec_id"), "left_anti")
    val lookupE = DedupQueries.normedDirVecs(
      graft.util.Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .join(broadcast(dIds), Seq("vec_id"), "left_anti")
        .unionByName(deltaVecs.dropDuplicates("vec_id")
          .select(col("vec_id"), col("embedding"))))
    val cosState = t("cos state construct")(
      DedupQueries.cosPairsState(lookupE, storedBands, dBands,
        spark.table(s"${prefix}_cos_pairs"), dIds).localCheckpoint(true))
    t("cos state write")(
      BucketedTables.replaceBucketed(spark, s"${prefix}_cos_pairs", "vec_a",
        buckets, cosState))
    t("cos bands append")(
      BucketedTables.appendBucketed(
        dBands.join(BucketedTables.read(spark, s"${prefix}_cos_bands")
            .select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti"),
        s"${prefix}_cos_bands", "code", buckets))
    spark.catalog.refreshTable(s"${prefix}_cos_bands")
    t("base append")(
      BucketedTables.appendBucketed(
        deltaBase.join(BucketedTables.read(spark, s"${prefix}_base")
            .select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti"),
        s"${prefix}_base", "doc_id", buckets))
    spark.catalog.refreshTable(s"${prefix}_base")
    val (s7, attrition) = DedupQueries.curateGate(
      BucketedTables.read(spark, s"${prefix}_base"),
      () => spark.table(s"${prefix}_mh_pairs"),
      () => spark.table(s"${prefix}_cos_pairs"),
      () => spark.table(s"${prefix}_ct_pairs")
        .select(col("doc_id")).distinct())
    val s7c = t("gate (construct+ckpts)")(s7.localCheckpoint(true))
    t("attrition collect")(attrition.count())
    spark.stop()
  }
}
