package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe for sub-plan timing — delete before shipping. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", sys.env.getOrElse("PROBE_UI", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Tables.names.foreach { n =>
      try graft.util.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docsDf = graft.util.Tables.load(spark, sfDir, "documents")
    time("docs rows")(println("  rows=" + docsDf.count()))
    time("docs tokens total")(println("  toks=" + docsDf
      .select(size(split(col("text"), " ")).as("n")).agg(sum("n")).head))

    for (rep <- 1 to sys.env.getOrElse("PROBE_REPS", "2").toInt) {
      val perDoc = TextQueries.bm25TermGrain(docsDf)
      val cached = perDoc.persist()
      time(s"rep$rep perDoc build+count")(println("  perDoc=" + cached.count()))
      val dl = TextQueries.bm25DocLens(cached)
      val (vocab, _) = TextQueries.bm25Vocab(cached, dl)
      val postings = TextQueries.bm25Postings(cached, vocab, dl)
      time(s"rep$rep postings noop") {
        postings.write.format("noop").mode("overwrite").save()
      }
      val qterms = cached.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("q_id"), col("term"))
      val scored = TextQueries.bm25Score(qterms, postings, excludeSelf = true)
      time(s"rep$rep score count")(println("  rows=" + scored.count()))
      cached.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
    }
    if (sys.env.contains("PROBE_UI")) {
      println("[probe] UI up at :4040; sleeping")
      Thread.sleep(600000)
    }
    spark.stop()
  }
}
