package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._
import graft.util.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors) — BASELINE.json north star.
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k. The query set is broadcast
  *    against the full corpus — at 100 TB this is the per-partition
  *    scan pattern (each executor scores its partition against the
  *    broadcast queries, partial top-k via the window per query).
  *  - [[lshTopK]]: random-hyperplane LSH. 8 fixed ±1 hyperplanes give a
  *    256-bucket code; queries only score candidates in their own
  *    bucket, so the shuffle key is the bucket code and the pairwise
  *    work drops by ~256x at the cost of recall. Plane literals are
  *    deterministic (md5-derived, [[graft.functions.TextFunctions.planeSign]])
  *    and identical in the DuckDB oracle.
  */
object SimilarityQueries {

  private val Dim = 64
  private val NPlanes = 8
  private val TopK = 10

  private def embs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** Query subset: every 50th vector. */
  private val isQuery: Column = col("vec_id") % 50 === 0

  /** Codegen'd dot/norm (graft.functions.VectorExpressions) — bit-
    * identical to the HOF fold, native loop in whole-stage codegen. */
  private def cosine(a: String, b: String): Column =
    expr(s"graft_dot($a.embedding, $b.embedding)") /
      (col(s"$a.nrm") * col(s"$b.nrm"))

  private def withNorm(e: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(e.sparkSession)
    e.select(col("vec_id"), col("label"), col("embedding"),
      sqrt(expr("graft_norm2(embedding)")).as("nrm"))
  }

  // ---------------------------------------------------------------------
  // ann_cosine_topk: exact brute-force baseline
  // ---------------------------------------------------------------------

  def bruteTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embs(spark, dir))
    val q = e.filter(isQuery)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    broadcast(q).as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("n_id"),
        cosine("q", "c").as("cosine"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= TopK)
      .orderBy(col("q_id"), col("rank"))
  }

  val bruteTopKSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2Sql("embedding")}) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM e q JOIN e c ON q.vec_id != c.vec_id
       |  WHERE q.vec_id % 50 = 0),
       |ranked AS (
       |  SELECT q_id, n_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, n_id, cosine, rank
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // ann_lsh_topk: random-hyperplane bucketed scale path
  // ---------------------------------------------------------------------

  /** Signed projection of the embedding onto fixed plane p. */
  private def proj(p: Int): Column =
    aggregate(
      zip_with(col("embedding"),
        array(planeSigns(p, Dim).map(lit): _*),
        (x, s) => x.cast(DoubleType) * s),
      lit(0.0), (acc, x) => acc + x)

  private def projSql(p: Int, e: String): String = {
    val signs = planeSigns(p, Dim).map(s => if (s > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")
    s"list_sum(list_transform(generate_series(1, $Dim), i -> CAST($e[i] AS DOUBLE) * ($signs)[i]))"
  }

  /** 8-bit bucket code from the projection signs. */
  private val bucketCode: Column =
    (0 until NPlanes).map(p => when(proj(p) > 0.0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)

  private def bucketCodeSql(e: String): String =
    (0 until NPlanes)
      .map(p => s"CASE WHEN ${projSql(p, e)} > 0.0 THEN ${1L << p} ELSE 0 END")
      .mkString("(", " + ", ")")

  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embs(spark, dir)).withColumn("bucket", bucketCode)
    val q = e.filter(isQuery)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    q.as("q").join(e.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("q.bucket").as("bucket"),
        col("c.vec_id").as("n_id"),
        cosine("q", "c").as("cosine"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= TopK)
      .orderBy(col("q_id"), col("rank"))
  }

  val lshTopKSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2Sql("embedding")}) AS nrm,
       |         ${bucketCodeSql("embedding")} AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.bucket AS bucket, c.vec_id AS n_id,
       |         ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
       |  WHERE q.vec_id % 50 = 0),
       |ranked AS (
       |  SELECT q_id, bucket, n_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, bucket, n_id, cosine, rank
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame), String)] = Seq(
    ("ann_cosine_topk", bruteTopK _, bruteTopKSql),
    ("ann_lsh_topk", lshTopK _, lshTopKSql))
}
