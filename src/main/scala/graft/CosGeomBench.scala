package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries
import graft.sources.CuratedCorpusLayout

/** The sign-LSH geometry dial, actually turned: at ~100× SF the W=6
  * default's per-bucket postings (~corpus/2^W) make the cosine-state
  * pass the curated build's superlinear term, and the documented
  * remedy is a W=8+ rebuild ([[DedupQueries.cosineLshConfig]],
  * `CuratedCorpusLayout.buildIncremental` scaladoc). This measures the
  * turn at scale:
  *  - the focused cosine-state pass (bands + verified pairs) timed at
  *    W=6 and W=8 over the same corpus;
  *  - the verified pair sets' overlap — both are exact-cosine-checked,
  *    so the diff is pure candidate-generation recall (what the wider
  *    band trades for its postings bound);
  *  - ONE full `buildIncremental` at W=8 (timed), proving the
  *    deployment path takes the dial end to end and persists it in
  *    `_cos_geom`.
  */
object CosGeomBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-cosgeom-wh").toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val e = DedupQueries.normedDirVecs(
        graft.util.Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding")))
      .localCheckpoint(true)
    val nVecs = e.count()

    def cosPass(planes: Int): (org.apache.spark.sql.DataFrame, Double) =
      timed {
        val bands = DedupQueries.cosineBandsOf(e,
          DedupQueries.CosineLshBands, planes).persist()
        bands.count()
        val pairs = DedupQueries.cosineLshFromBands(e, bands)
          .select(col("vec_a"), col("vec_b")).localCheckpoint(true)
        pairs.count() // materialize inside the timed window
        bands.unpersist(false)
        pairs
      }
    val (p6, sec6) = cosPass(6)
    val (p8, sec8) = cosPass(8)
    val n6 = p6.count(); val n8 = p8.count()
    val common = p6.join(p8, Seq("vec_a", "vec_b"), "left_semi").count()
    // both sets are exact-cosine-verified, so union ⊆ truth: recall of
    // each geometry measured against the best available candidate pool
    val union = n6 + n8 - common

    val (_, buildSec8) = timed(
      CuratedCorpusLayout.buildIncremental(spark, sfDir, "cosgeom_w8",
        buckets = 8, cosPlanesPerBand = 8))
    val served = CuratedCorpusLayout.serve(spark, "cosgeom_w8").count()
    val geom = spark.table("cosgeom_w8_cos_geom").head()
    require(geom.getAs[Int]("planes_per_band") == 8,
      "the W=8 build did not persist its geometry")

    println(f"""{"metric":"cos_geom_w8_pass_sec","value":$sec8%.2f,"unit":"sec","w6_pass_sec":$sec6%.2f,"pairs_w6":$n6,"pairs_w8":$n8,"pairs_common":$common,"recall_w8_vs_union":${n8.toDouble / math.max(1L, union)}%.4f,"recall_w6_vs_union":${n6.toDouble / math.max(1L, union)}%.4f,"build_w8_sec":$buildSec8%.2f,"docs_served":$served,"n_vecs":$nVecs,"sf":${util.Json.quote(sfDir)}}""")
    spark.stop()
  }
}
