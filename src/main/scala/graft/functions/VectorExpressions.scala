package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
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
      (children: Seq[Expression]) =>
        VectorExpressions.DotFF(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(VectorExpressions.Norm2FF.getClass.getName, "graft_norm2"),
      (children: Seq[Expression]) =>
        VectorExpressions.Norm2FF(children.head)))
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
        (children: Seq[Expression]) =>
          VectorExpressions.DotFF(children(0), children(1)))
      registry.registerFunction(
        FunctionIdentifier("graft_norm2"),
        new ExpressionInfo(VectorExpressions.Norm2FF.getClass.getName, "graft_norm2"),
        (children: Seq[Expression]) =>
          VectorExpressions.Norm2FF(children.head))
    }
  }
}
