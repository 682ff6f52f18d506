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

    val sh = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(shingleHashesOfToks(col("toks"), 3)).as("s"))
      .persist()
    time("sh materialize")(sh.count())

    val cold = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 1000).select(col("s"))
    val postings = sh.join(cold, "s")
    val common = postings.as("a").join(postings.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    time("self join common 1")(common.count())
    time("self join common 2")(common.count())
    time("self join common 3")(common.count())

    // variant: pair expansion inside posting lists (no self-join):
    // group shingle -> sorted doc list, emit combinations, count pairs
    val lists = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= 1000 && size(col("ds")) >= 2)
    val pairs = lists.select(explode(flatten(transform(
      sequence(lit(0), size(col("ds")) - 2),
      i => transform(slice(col("ds"), i + lit(2), size(col("ds")) - i - lit(1)),
        d => struct(element_at(col("ds"), i + lit(1)).as("doc_a"), d.as("doc_b")))
    ))).as("p"))
      .groupBy(col("p.doc_a"), col("p.doc_b"))
      .agg(count(lit(1)).as("common"))
    time("pair expansion 1")(pairs.count())
    time("pair expansion 2")(pairs.count())
    time("pair expansion 3")(pairs.count())

    spark.sharedState.cacheManager.clearCache()
    spark.stop()
  }
}
