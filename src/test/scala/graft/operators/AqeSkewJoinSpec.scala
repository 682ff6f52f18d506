package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.ProfileQueries

/** AQE skew-join vs the manual [[SaltedJoin]] on the distribution
  * `util_skew_profile` exists to surface: the events table's hottest
  * user_id, amplified until one shuffle partition dominates.
  *
  * What this pins down (the division of labor):
  *  - For a plain sort-merge EQUI-JOIN, modern Spark needs no manual
  *    salting: AQE detects the oversized partition at runtime and
  *    splits it (the executed plan carries the `isSkewJoin=true`
  *    marker), and results are identical to both the plain join and
  *    the salted operator — so the default path for batch joins is
  *    AQE, not salt.
  *  - The manual operator REMAINS required where AQE skew handling
  *    cannot reach: skewed AGGREGATIONS (a reduce must see all rows
  *    of its key — only pre-salting splits that), stream-stream joins
  *    (no adaptive re-planning mid-stream), broadcast-ineligible
  *    engines, and deterministic-layout requirements. SaltedJoin's
  *    scaladoc carries the same contract.
  *
  * Note the third player: a BROADCAST join is skew-immune outright
  * (no shuffle of the fact side), which is why the test pins
  * autoBroadcastJoinThreshold=-1 — without that the dim side
  * broadcasts and the skew question never arises. */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def keyLabelCounts(df: DataFrame): Seq[(Long, String, Long)] =
    df.groupBy(col("user_id"), col("label")).count()
      .select(col("user_id"), col("label"), col("count"))
      .as[(Long, String, Long)].collect().toSeq.sorted

  test("AQE splits the hot partition; results equal plain and salted joins") {
    // the real distribution's hottest key (what util_skew_profile
    // reports as rnk 1), amplified so one partition dominates even at
    // test scale
    val topKey = ProfileQueries.skewProfile(spark, dir)
      .head().getAs[Long]("user_id")
    val ev = graft.util.Tables.load(spark, dir, "events")
      .select(col("user_id"))
    // the amplified rows carry an INCOMPRESSIBLE payload: AQE's skew
    // stats are COMPRESSED map-output bytes, and 70k near-identical
    // rows lz4 to a few KB — under any realistic threshold the
    // partition "isn't skewed". md5 hex is entropy-dense, like real
    // row payloads at scale
    val fact = ev.withColumn("payload", concat(lit("p"), col("user_id")))
      .union(
        ev.filter(col("user_id") === topKey)
          .withColumn("r", explode(sequence(lit(1), lit(800))))
          .withColumn("payload",
            md5(concat(col("user_id"), lit("-"), col("r"), lit("-"),
              monotonically_increasing_id())))
          .drop("r")
          // spread the hot rows across MAP tasks: AQE splits a skewed
          // reduce partition along MAPPER boundaries, so a hot key
          // emitted by a single upstream task is unsplittable and the
          // rule reports it un-skewed — the fourth case where manual
          // salting (which re-keys, not re-reads) still wins
          .repartition(8))
    // dim is materialized to rows first, NOT left as `ev.distinct()`:
    // OptimizeSkewedJoin pattern-matches Sort directly over a shuffle
    // stage on BOTH sides, and a distinct's final HashAggregate
    // between shuffle and join silently defeats the whole rule — the
    // third case (after aggregations and stream joins) where manual
    // salting remains the only lever; see the SaltedJoin scaladoc
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("label", concat(lit("u"), col("user_id")))
      .as[(Long, String)].collect().toSeq
      .toDF("user_id", "label")

    val plain = keyLabelCounts(fact.join(dim, "user_id"))
    assert(plain.nonEmpty)

    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force a shuffled sort-merge join (no broadcast escape hatch)
      // and thresholds small enough that the amplified key's partition
      // counts as skewed at fixture scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val aqe = fact.join(dim, "user_id")
      // execute THIS frame (collect runs the frame's own
      // queryExecution; a count() would build a separate one) so its
      // adaptive plan finalizes, then check AQE actually engaged: the
      // final plan carries the skew marker on the sort-merge join
      assert(aqe.collect().nonEmpty)
      val p = aqe.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"), p)
      assert(keyLabelCounts(aqe) == plain)

      val salted = keyLabelCounts(
        SaltedJoin.inner(fact, dim, "user_id", salts = 8))
      assert(salted == plain)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
