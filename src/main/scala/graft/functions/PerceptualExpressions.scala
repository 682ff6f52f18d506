package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native perceptual-signature kernel.
  *
  * The tile-banded 60-bit signature ([[graft.queries.MultimodalQueries]])
  * is definable as built-in HOFs (transform + 60 filter votes), but
  * higher-order functions evaluate INTERPRETED — lambda dispatch per
  * window per bit made the signature the dominant cost of every
  * perceptual query (~4 s/corpus pass at sf0.1). This expression runs
  * the identical arithmetic as one tight loop (per-window md5 via a
  * thread-local digest, vote counters on the stack) inside whole-stage
  * codegen: bit-identical to the HOF form (MediaNearDupSpec proves
  * equality row-for-row) and to the DuckDB oracle's
  * `list_transform`/`list_filter` twin, ~5× faster.
  *
  * Geometry constants here MUST stay in lockstep with
  * `MultimodalQueries.{PTiles,PTileBits,PWin,PStride}` and the oracle
  * SQL generators — all three express the same definition.
  */
/** Top-level so Scala emits STATIC forwarders (janino-generated code
  * calls `graft.functions.PerceptualSigImpl.psig(...)` directly —
  * nested objects get no forwarders). */
object PerceptualSigImpl {
    val Tiles = 4
    val TileBits = 15
    val Win = 8
    val Stride = 2

    private val md = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    /** First 15 hex digits of md5 as a non-negative long — EXACTLY
      * `conv(substring(md5(s), 1, 15), 16, 10)`: the first 7.5 digest
      * bytes big-endian, i.e. the 8-byte prefix shifted right a
      * nibble. */
    def h60(s: UTF8String): Long = {
      val d = md.get()
      d.reset()
      val dig = d.digest(s.getBytes)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
      v >>> 4
    }

    /** The full signature: per tile, stride-[[Stride]] width-[[Win]]
      * character windows (SQL substring semantics via substringSQL),
      * h60 per window, 15-bit majority vote; tiles concatenated. */
    def psig(text: UTF8String): Long = {
      val L = text.numChars()
      var out = 0L
      var q = 0
      while (q < Tiles) {
        val lo = L.toLong * q / Tiles
        val hi = math.min(L.toLong * (q + 1) / Tiles - 1L, (L - Win).toLong)
        if (L >= Win && hi >= lo) {
          val counts = new Array[Int](TileBits)
          var n = 0
          var i = lo
          while (i <= hi) {
            val w = h60(text.substringSQL(i.toInt + 1, Win))
            var b = 0
            while (b < TileBits) {
              if (((w >> b) & 1L) == 1L) counts(b) += 1
              b += 1
            }
            n += 1
            i += Stride
          }
          var sig = 0L
          var b = 0
          while (b < TileBits) {
            if (2 * counts(b) > n) sig |= (1L << b)
            b += 1
          }
          out += sig << (TileBits * q)
        }
        q += 1
      }
      out
    }
}

object PerceptualExpressions {

  /** graft_psig(text): the 60-bit tile-banded perceptual signature. */
  case class PerceptualSig(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_psig"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      PerceptualSigImpl.psig(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.PerceptualSigImpl.psig($c)")

    override protected def withNewChildInternal(
        newChild: Expression): PerceptualSig = copy(child = newChild)
  }

  private[graft] def builder(children: Seq[Expression]): Expression =
    PerceptualSig(VectorExpressions.exactArgs("graft_psig", 1, children).head)

  /** Idempotently register graft_psig (late-binding path; the
    * [[GraftExtensions]] injector is the deploy-time one). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("graft_psig")
    if (!registry.functionExists(id)) {
      registry.registerFunction(id,
        new ExpressionInfo(PerceptualSig.getClass.getName, "graft_psig"),
        builder _)
    }
  }
}
