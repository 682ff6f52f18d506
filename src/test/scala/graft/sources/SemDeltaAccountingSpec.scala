package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.queries.SimilarityQueries

/** sem_delta_accounting is the ORACLE-CHECKED form of the ingest
  * surface `AnnIndexLayout.semanticDedupDelta`: the registered query
  * re-derives corpus-frozen geometry per run, the layout serves it
  * from persisted tables — per-label accounting must agree exactly,
  * or the oracle would be pinning semantics the deployment path does
  * not have. */
class SemDeltaAccountingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def dropIndex(prefix: String): Unit = dropPrefix(prefix)

  test("registered query equals the persisted-index accounting rollup") {
    dropIndex("sem_acc")
    // the index a deployment would hold BEFORE today's snapshot: built
    // over the corpus split only (the registered query's own split)
    AnnIndexLayout.build(spark, dir, "sem_acc", buckets = 4,
      where = !SimilarityQueries.SemDeltaPred)
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val delta = emb.filter(SimilarityQueries.SemDeltaPred)
        .select(col("vec_id"), col("embedding"))
      // minCosine below any real cosine: keep ALL top-k pairs so the
      // rollup applies the 0.4 decision itself, like the query does
      val pairs = AnnIndexLayout.semanticDedupDelta(spark, dir, "sem_acc",
        delta, minCosine = -2.0)
      val perQ = pairs.groupBy(col("vec_new").as("q_id"))
        .agg(count(lit(1)).as("n_partners"),
          max(col("cosine")).as("max_cos"),
          max((col("cosine") >= 0.4).cast(LongType)).as("is_dup"))
      val fromIndex = emb.filter(SimilarityQueries.SemDeltaPred)
        .select(col("vec_id").as("q_id"),
          col("label").cast(LongType).as("label"))
        .join(perQ, Seq("q_id"), "left")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_new"),
          coalesce(sum(col("n_partners")), lit(0L)).as("n_pairs"),
          coalesce(sum(col("is_dup")), lit(0L)).as("n_sem_dup"),
          coalesce(floor(max(col("max_cos")) * lit(10000.0)), lit(-1.0))
            .cast(LongType).as("max_cos_bp"))
        .select(col("label"), col("n_new"), col("n_pairs"),
          col("n_sem_dup"),
          (col("n_new") - col("n_sem_dup")).as("n_unique_new"),
          col("max_cos_bp"))
        .orderBy(col("label"))
        .collect().toSeq
      val registered =
        SimilarityQueries.semDeltaAccounting(spark, dir).collect().toSeq
      assert(fromIndex.nonEmpty)
      assert(fromIndex == registered,
        s"index rollup drifted from the registered query:\n" +
          s"index: $fromIndex\nquery: $registered")
    } finally dropIndex("sem_acc")
  }
}
