package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSpec
import graft.functions.SketchExpressions

/** dedup_contamination_bloom: a Bloom runtime filter on the train side
  * of the contamination join must be performance-only — the result set
  * is bit-identical to the unpruned query, false negatives are
  * impossible by construction, and the probe sits in a Filter UNDER
  * the join so the shuffle carries only might-match rows. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bloom-pruned contamination equals the unpruned query exactly") {
    val plain = DedupQueries.contamination(spark, dir).collect()
    val bloomed = DedupQueries.contaminationBloom(spark, dir).collect()
    assert(plain.length == bloomed.length)
    assert(plain.map(_.toString).sameElements(bloomed.map(_.toString)))
    assert(plain.nonEmpty) // the fixture must actually exercise the join
  }

  test("buildLongBloom insert/probe pair has zero false negatives") {
    val keys = (0L until 5000L).map(k => k * 2654435761L).toDF("s")
    val bytes = SketchExpressions.buildLongBloom(keys, "s", 5000L, 0.03)
    val bloom = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    (0L until 5000L).foreach { k =>
      assert(bloom.mightContainLong(k * 2654435761L),
        s"false negative for inserted key $k")
    }
  }

  test("merged per-partition bloom equals a sequentially built one") {
    // OR-merge associativity: the distributed build's bytes match a
    // single-threaded reference build, so the sketch is deterministic
    // under any partitioning of the key set
    val keys = (0L until 2000L).map(k => k * 40503L + 7L)
    val distributed = SketchExpressions.buildLongBloom(
      keys.toDF("s").repartition(7), "s", 4096L, 0.05)
    val reference = BloomFilter.create(4096L, 0.05)
    keys.foreach(reference.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    reference.writeTo(bos)
    assert(java.util.Arrays.equals(distributed, bos.toByteArray))
  }

  test("plan: bloom probe filters the train side BELOW the join") {
    // tree-walk (string rendering is ambiguous under AQE's dual
    // Final/Initial plan dump): the probe must live in a Filter that
    // is a DESCENDANT of the pair-join, i.e. it prunes rows before
    // they reach the shuffle/broadcast, not after the join
    val plan = DedupQueries.contaminationBloom(spark, dir)
      .queryExecution.sparkPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a join in:\n$plan")
    val probeUnderJoin = joins.exists(_.children.exists(_.collectFirst {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("graft_bloom_mc") => f
    }.nonEmpty))
    assert(probeUnderJoin,
      s"bloom probe should sit under the join in:\n${plan.toString.take(6000)}")
  }

  test("prune ratio: bloom drops train postings with no eval twin") {
    // quantify what the filter saves on the fixture — not asserted as
    // a bound (corpus-dependent), but it must never INCREASE rows
    val docs = graft.util.Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val shingled = toks.select(col("doc_id"),
      explode(graft.functions.TextFunctions
        .shingleHashesOfToks(col("toks"), 3)).as("s"))
    val bucket = pmod(graft.functions.TextFunctions.h60(col("text")), lit(100L))
    val splits = docs.select(col("doc_id"),
      when(bucket < 80, "train").when(bucket < 90, "valid")
        .otherwise("test").as("split"))
    val tagged = shingled.join(splits, "doc_id").persist()
    val evalKeys = tagged.filter(col("split") =!= "train").select("s")
    val n = math.max(evalKeys.count(), 1024L)
    val bytes = SketchExpressions.buildLongBloom(evalKeys, "s", n, 0.03)
    SketchExpressions.ensureRegistered(spark)
    val train = tagged.filter(col("split") === "train")
    val total = train.count()
    val kept = train.filter(
      call_function("graft_bloom_mc", lit(bytes), col("s"))).count()
    tagged.unpersist(false)
    assert(kept <= total)
    info(f"bloom prune: $kept%d / $total%d train postings kept " +
      f"(${100.0 * kept / math.max(total, 1)}%.1f%%)")
  }
}
