package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only scratch profiling of query sub-stages (edit freely). */
object ProfileParts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    val docs = graft.util.Tables.load(spark, sfDir, "documents")
    docs.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[parts] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def sh0 = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(shingleHashesOfToks(col("toks"), 3)).as("s"))

    for (round <- 1 to 3) {
      println(s"=== round $round ===")

      // variant A: current full ngramJaccard (sizes joins)
      time("ngramA full")(graft.queries.DedupQueries
        .ngramJaccard(spark, sfDir).count())
      spark.sharedState.cacheManager.clearCache()

      // variant B: carry n through the self-join; no sizes joins
      {
        val sh = sh0.persist()
        sh.count()
        val withN = sh.withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        val cold = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 1000).select(col("s"))
        val postings = withN.join(cold, "s")
        val res = postings.as("a").join(postings.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.n").as("na"), col("b.n").as("nb"))
          .agg(count(lit(1)).as("common"))
          .select(col("doc_a"), col("doc_b"),
            (col("common").cast(DoubleType) /
              (col("na") + col("nb") - col("common")).cast(DoubleType)).as("jaccard"))
          .filter(col("jaccard") >= 0.3)
          .orderBy(col("doc_a"), col("doc_b"))
        time("ngramB carry-n")(res.count())
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
