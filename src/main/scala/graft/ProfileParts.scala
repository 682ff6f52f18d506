package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      val sh = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          explode(shingleHashesOfToks(col("toks"), 3)).as("s"))
        .persist()
      time("sh materialize")(sh.count())

      val sig = sh.groupBy(col("doc_id"))
        .agg(
          min(minHash(0, col("s"))).as("m0"),
          (1 until 16).map(i => min(minHash(i, col("s"))).as(s"m$i")): _*)
        .persist()
      time("sig materialize")(sig.count())

      val bands = sig.select(col("doc_id"),
        explode(array((0 until 4).map { j =>
          struct(lit(j).as("band_id"),
            concat_ws(":", (0 until 4).map(r => col(s"m${4 * j + r}")): _*).as("key"))
        }: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band_id"), col("bk.key"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .persist()
      time("cand materialize")(cand.count())

      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val common = cand
        .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("common"))
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      time("verify jaccard")(common.count())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
