package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(0.5f, -0.5f, 0.25f), Seq(-1.0f, 1.0f, 2.0f)))

  test("codegen dot/norm2 are bit-identical to the HOF fold") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val df = vecs.toDF("id", "a", "b")
    val rows = df.select(
      expr("graft_dot(a, b)").as("dot_native"),
      TextFunctions.dot(col("a"), col("b")).as("dot_hof"),
      expr("graft_norm2(a)").as("n2_native"),
      TextFunctions.norm2(col("a")).as("n2_hof")).collect()
    for (r <- rows) {
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("fused pq kernel is bit-identical to the composed slice folds") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(42)
    val data = (0 until 20).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextFloat() * 2f - 1f),
        Seq.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = data.toDF("id", "a", "c")
    for (m <- Seq(4, 8, 16)) {
      val w = 64 / m
      val composed = (0 until m).map { s =>
        val lo = s * w + 1
        expr(s"graft_norm2(slice(a, $lo, $w)) + graft_norm2(slice(c, $lo, $w))" +
          s" - 2.0 * graft_dot(slice(a, $lo, $w), slice(c, $lo, $w))")
      }
      val rows = df.select(
        expr(s"graft_pq_d2s(a, c, $m)").as("fused"),
        array(composed: _*).as("composed")).collect()
      for (r <- rows) {
        val f = r.getSeq[Double](0)
        val cmp = r.getSeq[Double](1)
        assert(f.length == m)
        f.zip(cmp).foreach { case (x, y) =>
          assert(java.lang.Double.doubleToLongBits(x) ==
            java.lang.Double.doubleToLongBits(y), s"m=$m: $x != $y")
        }
      }
    }
  }

  test("fused pq kernel rejects bad subspace counts loudly") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val df = Seq((Seq.fill(64)(1.0f), Seq.fill(64)(2.0f))).toDF("a", "c")
    // m = 0: rejected at analysis time
    val analysisErr = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("graft_pq_d2s(a, c, 0)").collect()
    }
    assert(analysisErr.getMessage.contains("positive"))
    // m = 5 doesn't divide 64: loud runtime failure, never silent
    // tail-dropping (the bit-compat contract covers every element)
    val runtimeErr = intercept[Exception] {
      df.selectExpr("graft_pq_d2s(a, c, 5)").collect()
    }
    assert(runtimeErr.getMessage != null)
    assert(org.apache.commons.lang3.exception.ExceptionUtils
      .getRootCauseMessage(runtimeErr).contains("not divisible"))
  }

  test("GraftExtensions (spark.sql.extensions) registers functions without late binding") {
    // a fresh session's registry is built from extensions only —
    // VectorFunctions.ensureRegistered has never run on it
    val s = spark.newSession()
    import s.implicits._
    val out = Seq(Seq(3.0f, 4.0f)).toDF("v")
      .selectExpr("graft_norm2(v) AS n").collect()
    assert(out.head.getDouble(0) == 25.0)
  }
}
