package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

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

  /** graft_bloom_mc(sketch, key): membership probe against a Bloom
    * filter — `false` is definite ("key was never inserted"), `true`
    * means "maybe" at the build-time fpp. Same operand contract as
    * [[CmsEstimate]]: the sketch must be a foldable binary literal so
    * it deserializes once per executor, and each row pays one
    * O(numHashes) probe inside whole-stage codegen.
    *
    * This is the map-side half of a semi-join runtime filter: build
    * the bloom over the SMALL side's join keys, probe it in a Filter
    * under the BIG side's scan, and the shuffle only carries rows that
    * might match. Because false negatives are impossible, an exact
    * join above the filter returns exactly the unfiltered result —
    * the bloom is performance-transparent, so bloom-pruned queries
    * keep their exact DuckDB oracle. */
  case class BloomMightContain(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_mc"

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

    @transient private lazy val bloom: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(
        left.eval(null).asInstanceOf[Array[Byte]]))

    override protected def nullSafeEval(sk: Any, k: Any): Any =
      bloom.mightContainLong(k.asInstanceOf[java.lang.Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bloomRef = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, (_, k) =>
        s"${ev.value} = $bloomRef.mightContainLong($k);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomMightContain =
      copy(left = newLeft, right = newRight)
  }

  /** Upper bound on the sketch's sizing key count (~3.8 MB of bits at
    * fpp 3%). Beyond this the filter keeps its budget and the
    * EFFECTIVE fpp degrades gracefully (more rows survive the prune,
    * all still exact after the join) instead of the sketch — which
    * rides plans as a literal and is tree-merged across tasks —
    * growing without bound with the corpus. */
  val MaxBloomItems: Long = 1L << 22

  /** Distributed Bloom build over a single LongType column: each
    * partition fills its own filter (Dataset mapPartitions — one
    * fixed-size sketch per task, no row shuffle), then the bit arrays
    * are OR-merged in an executor-side TREE (treeReduce, not a star
    * collect: at cluster scale `partitions x sketch bytes` to one
    * driver is the bottleneck, the tree moves ~log fan-in per level).
    * Merge is associative/commutative, so the resulting bytes are
    * partitioning-independent — deterministic for a given key set and
    * (expectedItems, fpp). Insert/probe pair is
    * putLong/mightContainLong (same key hashing on both sides by
    * construction; BloomPruneSpec pins zero false negatives).
    * `expectedItems` is clamped to [[MaxBloomItems]]. */
  def buildLongBloom(keys: DataFrame, column: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val sized = math.min(math.max(expectedItems, 1L), MaxBloomItems)
    def toBytes(bf: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val parts = keys.select(column).as[Long].mapPartitions { it =>
      val bf = BloomFilter.create(sized, fpp)
      it.foreach(bf.putLong)
      Iterator(toBytes(bf))
    }
    // RDD treeReduce (rare imperative escape): sketch merging is the
    // textbook case — fixed-size opaque byte blobs, associative OR.
    // Every partition emits a sketch (empty partitions an empty one),
    // so the reduce is only degenerate on a zero-partition input.
    val rdd = parts.rdd
    if (rdd.getNumPartitions == 0) toBytes(BloomFilter.create(sized, fpp))
    else rdd.treeReduce({ (a, b) =>
      val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
      bf.mergeInPlace(
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
      toBytes(bf)
    }, depth = 2)
  }

  private[functions] def builder(children: Seq[Expression]): Expression = {
    val c = VectorExpressions.exactArgs("graft_cms_est", 2, children)
    CmsEstimate(c(0), c(1))
  }

  private[functions] def bloomBuilder(children: Seq[Expression]): Expression = {
    val c = VectorExpressions.exactArgs("graft_bloom_mc", 2, children)
    BloomMightContain(c(0), c(1))
  }

  /** Idempotently register graft_cms_est / graft_bloom_mc in the
    * session's function registry (late-binding path next to
    * [[VectorFunctions.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("graft_cms_est")
    if (!registry.functionExists(id)) {
      registry.registerFunction(id,
        new ExpressionInfo(CmsEstimate.getClass.getName, "graft_cms_est"),
        builder _)
    }
    val bid = FunctionIdentifier("graft_bloom_mc")
    if (!registry.functionExists(bid)) {
      registry.registerFunction(bid,
        new ExpressionInfo(BloomMightContain.getClass.getName, "graft_bloom_mc"),
        bloomBuilder _)
    }
  }
}
