package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Map-side sketch probes.
  *
  * A count-min sketch is built distributed (Spark's `count_min_sketch`
  * aggregate: each executor sketches its partition, buffers merge
  * associatively), but Spark ships no expression to QUERY one — so the
  * natural audit ("estimate these keys against the sketch") tends to
  * end up as a driver-side loop over collected rows, which stops
  * scaling the moment the audit list does. [[CmsEstimate]] closes that
  * gap: the serialized sketch rides the plan as a foldable binary
  * literal (~100 KB at the audit's eps — the broadcast mechanism for
  * expression operands), is deserialized ONCE per executor into a
  * shared reference object, and each row pays one O(depth) probe
  * inside whole-stage codegen. The audit list can be any size; the
  * driver only ever holds the sketch bytes and the final top-k. */
object SketchExpressions {

  /** graft_cms_est(sketch, key): the sketch's count estimate for a
    * long key. `sketch` must be FOLDABLE (a literal / broadcast
    * scalar): a per-row sketch would deserialize per row, which is
    * never the intended shape — estimating against many sketches is a
    * join against a sketch TABLE, not this expression. */
  case class CmsEstimate(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_cms_est"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType != BinaryType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a binary sketch, got ${left.dataType.simpleString}")
      else if (!left.foldable)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) sketch argument")
      else if (right.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a bigint key, got ${right.dataType.simpleString}")
      else TypeCheckResult.TypeCheckSuccess

    @transient private lazy val cms: CountMinSketch =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(
        left.eval(null).asInstanceOf[Array[Byte]]))

    override protected def nullSafeEval(sk: Any, k: Any): Any =
      cms.estimateCount(k.asInstanceOf[java.lang.Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cmsRef = ctx.addReferenceObj("cms", cms,
        classOf[CountMinSketch].getName)
      nullSafeCodeGen(ctx, ev, (_, k) =>
        s"${ev.value} = $cmsRef.estimateCount((Object) java.lang.Long.valueOf($k));")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CmsEstimate =
      copy(left = newLeft, right = newRight)
  }

  private[functions] def builder(children: Seq[Expression]): Expression =
    CmsEstimate(children(0), children(1))

  /** Idempotently register graft_cms_est in the session's function
    * registry (late-binding path next to
    * [[VectorFunctions.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("graft_cms_est")
    if (!registry.functionExists(id)) {
      registry.registerFunction(id,
        new ExpressionInfo(CmsEstimate.getClass.getName, "graft_cms_est"),
        builder _)
    }
  }
}
