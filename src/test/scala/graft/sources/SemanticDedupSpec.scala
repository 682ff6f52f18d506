package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Semantic dedup at ingest against the persisted IVF-PQ index: a
  * re-embedded near-copy of a corpus vector must be caught at the
  * cosine threshold, an unrelated vector must not, a replayed
  * (already-appended) delta must return the identical pair set, and a
  * purged corpus vector must stop matching immediately. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def dropIndex(prefix: String): Unit = dropPrefix(prefix)

  test("near-copy caught; unrelated not; replay + purge behave") {
    dropIndex("sem_dd")
    AnnIndexLayout.build(spark, dir, "sem_dd", buckets = 4)
    try {
      // a "re-embedded" near-copy: corpus vector 40, slightly scaled
      // and with one component nudged — cosine ≈ 1 but not bit-equal
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") === 40L)
        .select(col("embedding")).as[Array[Float]].head()
      val nearCopy = base.zipWithIndex.map { case (x, i) =>
        if (i == 0) x * 1.05f + 0.01f else x * 1.05f }
      val rnd = new scala.util.Random(3)
      val unrelated = Array.fill(base.length)(rnd.nextFloat() * 2f - 1f)
      val delta = Seq((900001L, nearCopy), (900002L, unrelated))
        .toDF("vec_id", "embedding")

      val got = AnnIndexLayout.semanticDedupDelta(spark, dir, "sem_dd",
        delta, minCosine = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((900001L, 40L)), got.toString)
      assert(!got.exists(_._1 == 900002L), got.toString)

      // replay: file the delta, re-check — identical pairs (own filed
      // copy self-excluded, the unrelated vector still matches nothing)
      AnnIndexLayout.appendDeltaVectors(spark, "sem_dd", delta, buckets = 4)
      val replay = AnnIndexLayout.semanticDedupDelta(spark, dir, "sem_dd",
        delta, minCosine = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(replay == got, s"replay drifted: $replay vs $got")

      // right-to-be-forgotten: purge the corpus partner -> no match
      AnnIndexLayout.purgeVectors(spark, "sem_dd", Seq(40L).toDF("id"))
      val purged = AnnIndexLayout.semanticDedupDelta(spark, dir, "sem_dd",
        delta, minCosine = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!purged.contains((900001L, 40L)), purged.toString)
    } finally dropIndex("sem_dd")
  }
}
