package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The ANN / embedding-dedup queries score millions of candidate pairs;
  * a `zip_with`+`aggregate` higher-order-function dot product is
  * interpreted per element (lambda dispatch + boxing). These
  * expressions emit a tight primitive loop into whole-stage codegen —
  * same sequential left-to-right double accumulation, so results stay
  * bit-identical to the HOF form and to the DuckDB oracle's
  * `list_sum(list_transform(...))`.
  *
  * Registered on demand via the session FunctionRegistry
  * ([[VectorFunctions.ensureRegistered]]) — the
  * `SparkSessionExtensions.injectFunction` path works identically for
  * sessions built with `.withExtensions`.
  */
object VectorExpressions {

  /** Builder arity guard: the FunctionRegistry hands the builder
    * whatever argument list the query wrote, and `children(i)` /
    * `children.head` would silently DROP extra arguments (a two-arg
    * `graft_psig` call evaluating only the first) — fail resolution
    * instead. Shared by every graft_* builder. */
  private[functions] def exactArgs(name: String, n: Int,
      children: Seq[Expression]): Seq[Expression] = {
    require(children.size == n,
      s"$name expects exactly $n argument(s), got ${children.size}")
    children
  }

  private[functions] def dotBuilder(children: Seq[Expression]): Expression = {
    val c = exactArgs("graft_dot", 2, children)
    DotFF(c(0), c(1))
  }

  private[functions] def norm2Builder(children: Seq[Expression]): Expression =
    Norm2FF(exactArgs("graft_norm2", 1, children).head)

  private[functions] def pqD2sBuilder(children: Seq[Expression]): Expression = {
    val c = exactArgs("graft_pq_d2s", 3, children)
    PqSubD2s(c(0), c(1), c(2))
  }

  /** dot(a, b): Σ a[i]*b[i] over float arrays, accumulated in double
    * in index order (i = 0..min(len)-1). */
  case class DotFF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true; case _ => false
      })) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotFF =
      copy(left = newLeft, right = newRight)
  }

  /** norm2(a): Σ a[i]^2 in double, index order. */
  case class Norm2FF(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_norm2"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument, got ${other.simpleString}")
      }

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        val v = x.getFloat(i).toDouble
        s += v * v
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = (double) $a.getFloat($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Norm2FF =
      copy(child = newChild)
  }

  /** pq_d2s(a, c, m): the fused product-quantization kernel — splits
    * two float vectors into m equal subspaces and returns the m
    * squared L2 distances as array<double>, in ONE pass over the
    * vectors (three running accumulators per subspace) instead of
    * 3 x m slice+fold calls (and their 3 x m slice allocations).
    *
    * Bit-compatibility contract: each element equals
    * `graft_norm2(slice(a,lo,w)) + graft_norm2(slice(c,lo,w))
    *  - 2.0 * graft_dot(slice(a,lo,w), slice(c,lo,w))` exactly —
    * the three accumulators add the same products in the same index
    * order as the separate folds, and the combine `(na + nc) - 2.0*d`
    * is syntactically identical, so DuckDB oracle parity is untouched
    * (asserted in VectorExpressionsSpec). */
  case class PqSubD2s(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_pq_d2s"

    override def checkInputDataTypes(): TypeCheckResult = {
      val vecsOk = Seq(first, second).forall(_.dataType match {
        case ArrayType(FloatType, _) => true; case _ => false
      })
      if (!vecsOk) TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments")
      else if (third.dataType != org.apache.spark.sql.types.IntegerType ||
        !third.foldable) TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int subspace count")
      else third.eval(null) match {
        case m: Int if m >= 1 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName subspace count must be a positive int, got $other")
      }
    }

    /** The bit-compatibility contract covers every element, so a
      * vector length the subspace count doesn't divide is a caller
      * bug — fail loudly instead of silently dropping the tail. */
    private def requireDivides(n: Int, m: Int): Unit =
      if (n % m != 0) throw new IllegalArgumentException(
        s"graft_pq_d2s: vector length $n is not divisible by $m subspaces")

    override protected def nullSafeEval(a: Any, c: Any, m: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = c.asInstanceOf[ArrayData]
      val mm = m.asInstanceOf[Int]
      val n = math.min(x.numElements(), y.numElements())
      requireDivides(n, mm)
      val w = n / mm
      val out = new Array[Double](mm)
      var s = 0
      while (s < mm) {
        val base = s * w
        var na = 0.0; var nc = 0.0; var d = 0.0
        var i = 0
        while (i < w) {
          val va = x.getFloat(base + i).toDouble
          val vc = y.getFloat(base + i).toDouble
          na += va * va; nc += vc * vc; d += va * vc
          i += 1
        }
        out(s) = na + nc - 2.0 * d
        s += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, c, m) => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val n = ctx.freshName("n")
        val w = ctx.freshName("w")
        val base = ctx.freshName("base")
        val na = ctx.freshName("na")
        val nc = ctx.freshName("nc")
        val d = ctx.freshName("d")
        val va = ctx.freshName("va")
        val vc = ctx.freshName("vc")
        val out = ctx.freshName("out")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $c.numElements());
           |if ($n % $m != 0) {
           |  throw new IllegalArgumentException(
           |    "graft_pq_d2s: vector length " + $n + " is not divisible by " + $m + " subspaces");
           |}
           |int $w = $n / $m;
           |double[] $out = new double[$m];
           |for (int $s = 0; $s < $m; $s++) {
           |  int $base = $s * $w;
           |  double $na = 0.0; double $nc = 0.0; double $d = 0.0;
           |  for (int $i = 0; $i < $w; $i++) {
           |    double $va = (double) $a.getFloat($base + $i);
           |    double $vc = (double) $c.getFloat($base + $i);
           |    $na += $va * $va; $nc += $vc * $vc; $d += $va * $vc;
           |  }
           |  $out[$s] = $na + $nc - 2.0 * $d;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): PqSubD2s =
      copy(first = newFirst, second = newSecond, third = newThird)
  }
}

/** `spark.sql.extensions`-style injector: build sessions with
  * `.withExtensions(new GraftExtensions)` (or set the config key to
  * this class name) to get the graft functions at session start —
  * the deploy-time path; [[VectorFunctions.ensureRegistered]] is the
  * late-binding equivalent for sessions we don't construct. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(VectorExpressions.DotFF.getClass.getName, "graft_dot"),
      VectorExpressions.dotBuilder _))
    ext.injectFunction((FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(VectorExpressions.Norm2FF.getClass.getName, "graft_norm2"),
      VectorExpressions.norm2Builder _))
    ext.injectFunction((FunctionIdentifier("graft_pq_d2s"),
      new ExpressionInfo(VectorExpressions.PqSubD2s.getClass.getName, "graft_pq_d2s"),
      VectorExpressions.pqD2sBuilder _))
    ext.injectFunction((FunctionIdentifier("graft_cms_est"),
      new ExpressionInfo(SketchExpressions.CmsEstimate.getClass.getName,
        "graft_cms_est"),
      SketchExpressions.builder _))
    ext.injectFunction((FunctionIdentifier("graft_bloom_mc"),
      new ExpressionInfo(SketchExpressions.BloomMightContain.getClass.getName,
        "graft_bloom_mc"),
      SketchExpressions.bloomBuilder _))
    ext.injectFunction((FunctionIdentifier("graft_psig"),
      new ExpressionInfo(
        PerceptualExpressions.PerceptualSig.getClass.getName, "graft_psig"),
      PerceptualExpressions.builder _))
  }
}

object VectorFunctions {

  /** Idempotently register graft_dot / graft_norm2 in the session's
    * function registry so `expr("graft_dot(a, b)")` resolves. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val dotId = FunctionIdentifier("graft_dot")
    if (!registry.functionExists(dotId)) {
      registry.registerFunction(
        dotId,
        new ExpressionInfo(VectorExpressions.DotFF.getClass.getName, "graft_dot"),
        VectorExpressions.dotBuilder _)
      registry.registerFunction(
        FunctionIdentifier("graft_norm2"),
        new ExpressionInfo(VectorExpressions.Norm2FF.getClass.getName, "graft_norm2"),
        VectorExpressions.norm2Builder _)
      registry.registerFunction(
        FunctionIdentifier("graft_pq_d2s"),
        new ExpressionInfo(VectorExpressions.PqSubD2s.getClass.getName, "graft_pq_d2s"),
        VectorExpressions.pqD2sBuilder _)
    }
  }
}
