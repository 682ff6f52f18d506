package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The broadcast/pointLookup plan gate on the ANN serve/delta paths
  * (`AnnIndexLayout.boundedBatch`, dialed by
  * `graft.ingest.pruneMaxDeltaDocs`): a request/delta within the gate
  * runs the broadcast-hinted shortlist-bounded plan; above it every
  * hint is dropped and `pointLookup` turns off, so the planner's own
  * size checks choose the join strategy — a bulk backfill can no
  * longer ride a forced broadcast past Spark's hard limit. The two
  * plans must be byte-equal (join algebra, not sampling); this spec
  * pins that on both public surfaces by running the SAME inputs under
  * both dial settings. */
class BoundedBatchGateSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val dial = "graft.ingest.pruneMaxDeltaDocs"

  private def withDial[A](v: Option[String])(body: => A): A = {
    val prev = spark.conf.getOption(dial)
    try {
      v match {
        case Some(x) => spark.conf.set(dial, x)
        case None    => spark.conf.unset(dial)
      }
      body
    } finally {
      prev match {
        case Some(x) => spark.conf.set(dial, x)
        case None    => spark.conf.unset(dial)
      }
    }
  }

  test("semanticDedupDelta: over-gate fallback is byte-equal to the hinted plan") {
    dropPrefix("bbg")
    AnnIndexLayout.build(spark, dir, "bbg", buckets = 4)
    try {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") === 40L)
        .select(col("embedding")).as[Array[Float]].head()
      val nearCopy = base.zipWithIndex.map { case (x, i) =>
        if (i == 0) x * 1.05f + 0.01f else x * 1.05f }
      val rnd = new scala.util.Random(7)
      val unrelated = Array.fill(base.length)(rnd.nextFloat() * 2f - 1f)
      val delta = Seq((910001L, nearCopy), (910002L, unrelated))
        .toDF("vec_id", "embedding")

      def run() = AnnIndexLayout
        .semanticDedupDelta(spark, dir, "bbg", delta, minCosine = 0.95)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9)))
        .sortBy(t => (t._1, t._2))
        .toSeq

      val hintedPlan = withDial(None)(run()) // default 4096 >> 2 docs
      val fallback   = withDial(Some("1"))(run()) // 2-doc delta is "bulk"
      assert(hintedPlan.nonEmpty, "fixture produced no pairs")
      assert(fallback == hintedPlan,
        s"over-gate plan drifted:\n$fallback\nvs\n$hintedPlan")
    } finally dropPrefix("bbg")
  }

  test("serve: over-gate fallback is byte-equal to the pointLookup plan") {
    dropPrefix("bbgs")
    AnnIndexLayout.build(spark, dir, "bbgs", buckets = 4)
    try {
      val queries = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 5L)
        .select(col("vec_id"), col("embedding"))

      def run() = AnnIndexLayout
        .serve(spark, dir, "bbgs", queries, excludeSelf = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .sortBy(t => (t._1, t._3))
        .toSeq

      val hintedPlan = withDial(None)(run())
      val fallback   = withDial(Some("1"))(run())
      assert(hintedPlan.nonEmpty, "serve returned no rows")
      assert(fallback == hintedPlan,
        s"over-gate serve drifted:\n$fallback\nvs\n$hintedPlan")
    } finally dropPrefix("bbgs")
  }
}
