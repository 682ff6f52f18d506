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
    val docs = graft.util.Tables.load(spark, sfDir, "documents")
    docs.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[parts] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // mirror of DedupQueries.clusters with per-round telemetry
    val mName = classOf[graft.queries.DedupQueries.type]
    val t0 = System.nanoTime()
    val pairsDf = {
      // call private minhashPairsBody via the public pairs query minus sort
      graft.queries.DedupQueries.minhashPairs(spark, sfDir)
        .select(col("doc_a"), col("doc_b"))
    }.persist()
    time("pairs build")(println("pairs=" + pairsDf.count()))
    val edges = pairsDf.union(pairsDf.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("lbl")).persist()
    var prevSum = labels.agg(sum(col("lbl"))).first().getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 16) {
      val tr = System.nanoTime()
      val contrib = edges
        .join(labels.select(col("doc_id").as("src"), col("lbl")), "src")
        .select(col("dst").as("doc_id"), col("lbl"))
      val prop = labels.union(contrib)
        .groupBy(col("doc_id")).agg(min(col("lbl")).as("lbl"))
        .persist()
      prop.count()
      val next = prop.as("a")
        .join(prop.select(col("doc_id").as("lbl"), col("lbl").as("lbl2")).as("b"),
          Seq("lbl"), "left")
        .select(col("doc_id"), coalesce(col("lbl2"), col("lbl")).as("lbl"))
        .persist()
      val s = next.agg(sum(col("lbl"))).first().getLong(0)
      labels.unpersist()
      prop.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      rounds += 1
      println(f"[parts] round $rounds: ${(System.nanoTime() - tr) / 1e9}%.2f s sum=$s")
    }
    println(f"[parts] total: ${(System.nanoTime() - t0) / 1e9}%.2f s rounds=$rounds")
    spark.stop()
  }
}
