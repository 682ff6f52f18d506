package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.TextIndexLayout

/** BM25 online-serving benchmark: build the persisted text index once,
  * then answer the registered query set as a STREAM of micro-batches
  * through `TextIndexLayout.serveStream` and report queries/second —
  * the retrieval-side complement to `AnnServeBench`. Build time is
  * reported separately: at 100 TB the tokenize + postings build is
  * the rare nightly/delta job while serving is the steady state.
  */
object TextServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val batches = sys.env.getOrElse("SPARK_GRAFT_SERVE_BATCHES", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-tserve-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prefix = "txt_serve_bench"
    val tb0 = System.nanoTime()
    TextIndexLayout.build(spark, sfDir, prefix)
    val buildSec = (System.nanoTime() - tb0) / 1e9

    // the registered query subset (every 50th doc), as raw text —
    // the same set TextIndexLayoutSpec pins byte-equal online
    val qs = graft.util.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val groups = qs.grouped(math.max(1, (qs.size + batches - 1) / batches))
      .toSeq

    var served = 0L
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("q_id", "text")
    // corpus-member queries: self-exclusion on, like the online query
    val q = TextIndexLayout.serveStream(spark, prefix, stream,
      excludeSelf = true) {
      (res, _) => served += res.count()
    }
    val t0 = System.nanoTime()
    val batchSecs = groups.map { g =>
      val b0 = System.nanoTime()
      mem.addData(g: _*)
      q.processAllAvailable()
      (System.nanoTime() - b0) / 1e9
    }
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()
    require(served > 0, "no results served")

    val qps = qs.size / wall

    // PRF serving: the two-pass RM3 path over the same index + query
    // set — the per-query price of the second probe pass relative to
    // single-pass serving (batch mode; the stream bridge is identical)
    val qdf = qs.toDF("q_id", "text")
    val tp0 = System.nanoTime()
    val prfRows = TextIndexLayout.servePrf(spark, prefix, qdf,
      excludeSelf = true).count()
    val prfWall = (System.nanoTime() - tp0) / 1e9
    val prfQps = qs.size / prfWall

    println(f"""{"metric":"txt_serve_queries_per_sec","value":$qps%.1f,"unit":"queries/sec","queries":${qs.size},"result_rows":$served,"batches":${batchSecs.size},"wall_sec":$wall%.2f,"batch_sec_avg":${batchSecs.sum / batchSecs.size}%.2f,"batch_sec_max":${batchSecs.max}%.2f,"index_build_sec":$buildSec%.2f,"prf_queries_per_sec":$prfQps%.1f,"prf_result_rows":$prfRows,"sf":${util.Json.quote(sfDir)}}""")
    spark.stop()
  }
}
