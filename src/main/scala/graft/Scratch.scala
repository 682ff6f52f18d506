package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe (deleted before final). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("dedup_simhash_pairs", "dedup_ngram_jaccard", "dedup_minhash_pairs", "dedup_embedding_cosine", "dedup_simhash")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"$q%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
