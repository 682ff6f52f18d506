package graft

import org.apache.spark.sql.SparkSession
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
      .select(col("doc_id"),
        explode(shingleHashesOfToks(col("toks"), 3)).as("s"))

    def sig0 = {
      val votes = sh0.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n"),
        (0 until 60).map(b =>
          sum(shiftright(col("s"), b) % 2).as(s"c$b")): _*)
      val s1 = votes.select(col("doc_id"),
        (0 until 60)
          .map(b => when(col(s"c$b") * 2 > col("n"), lit(1L << b)).otherwise(0L))
          .reduce((a, b) => a + b).as("simhash"))
      docs.select(col("doc_id")).join(s1, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
    }

    // pair expansion within sorted bucket lists: ds = sorted array of
    // struct(id, payload); emits all (i<j) pairs
    def bucketPairs(lists: org.apache.spark.sql.DataFrame) =
      lists.select(explode(flatten(transform(
        sequence(lit(0), size(col("ds")) - 2),
        i => transform(
          slice(col("ds"), i + lit(2), size(col("ds")) - i - lit(1)),
          d => struct(element_at(col("ds"), i + lit(1)).as("a"), d.as("b")))
      ))).as("p"))

    for (round <- 1 to 2) {
      println(s"=== round $round ===")

      // simhash variant A: current self-join with persist
      {
        val sig = sig0.persist()
        sig.count()
        val chunks = sig.select(col("doc_id"), col("simhash"),
          explode(array((0 until 6).map { j =>
            struct(lit(j).as("chunk_id"),
              (shiftright(col("simhash"), 10 * j) % 1024).as("chunk"))
          }: _*)).as("c"))
          .select(col("doc_id"), col("simhash"), col("c.chunk_id"), col("c.chunk"))
        val pairs = chunks.as("a").join(chunks.as("b"),
            col("a.chunk_id") === col("b.chunk_id") && col("a.chunk") === col("b.chunk") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast(LongType).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 9)
        time("simhashA selfjoin+persist")(pairs.count())
        spark.sharedState.cacheManager.clearCache()
      }

      // simhash variant B: bucket-grouped pair expansion, no persist
      {
        val chunks = sig0.select(col("doc_id"), col("simhash"),
          explode(array((0 until 6).map { j =>
            struct(lit(j).as("chunk_id"),
              (shiftright(col("simhash"), 10 * j) % 1024).as("chunk"))
          }: _*)).as("c"))
          .select(col("doc_id"), col("simhash"), col("c.chunk_id"), col("c.chunk"))
        val lists = chunks.groupBy(col("chunk_id"), col("chunk"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ds"))
          .filter(size(col("ds")) >= 2)
        val pairs = bucketPairs(lists)
          .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
            bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash")))
              .cast(LongType).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 9)
        time("simhashB bucket-expand")(pairs.count())
        spark.sharedState.cacheManager.clearCache()
      }

      // ngram variant A: current postings self-join
      {
        val sh2 = sh0.persist()
        sh2.count()
        val cold = sh2.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 1000).select(col("s"))
        val postings = sh2.join(cold, "s")
        val common = postings.as("a").join(postings.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("common"))
        time("ngramA selfjoin")(common.count())
        spark.sharedState.cacheManager.clearCache()
      }

      // ngram variant B: bucket-grouped pair expansion (one shuffle on s,
      // df-filter folded into the same groupBy, no persist, no join)
      {
        val lists = sh0.groupBy(col("s"))
          .agg(sort_array(collect_list(struct(col("doc_id")))).as("ds"))
          .filter(size(col("ds")) >= 2 && size(col("ds")) <= 1000)
        val common = bucketPairs(lists)
          .groupBy(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("common"))
        time("ngramB bucket-expand")(common.count())
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
