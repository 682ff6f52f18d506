package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_markov_steady: the published iteration depth must already be a
  * fixed point, mass must be conserved up to damping truncation, and a
  * planted symmetric chain must settle at the uniform distribution. */
class MarkovSteadySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("published depth is a fixed point; mass conserved within truncation") {
    def dist(iters: Int): Map[String, Long] =
      EventsQueries.markovSteadyIters(spark, dir, iters).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("pi_pico"))
        .toMap
    val at12 = dist(12)
    val at11 = dist(11)
    assert(at12 == at11, s"not converged: $at11 vs $at12")
    val mass = at12.values.sum
    // teleport base + integer truncation each lose < k units per state
    // per round at pico scale; 0.1% is a generous ceiling
    assert(math.abs(mass - 1000000000000L) < 1000000000L, mass)
    assert(at12.values.forall(_ > 0L), at12)
  }

  test("planted symmetric two-state chain settles at the uniform point") {
    // one user alternating A B A B ... : P(A->B) = P(B->A) = 1, the
    // stationary distribution is (1/2, 1/2) with or without teleport
    val rows = (0 until 40).map { i =>
      (7L, i.toLong, new Timestamp(1700000000000L + i * 60000L),
        if (i % 2 == 0) "A" else "B")
    }
    val d = tmpDir("graft-markov")
    writeFixture(d, "events",
      rows.toDF("user_id", "event_id", "ts", "event_type"))
    val out = EventsQueries.markovSteady(spark, d.toString).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("pi_pico"))
      .toMap
    assert(out.keySet == Set("A", "B"), out)
    // 40 alternating events = 20 A→B but only 19 B→A transitions, so
    // integer truncation differs by a few pico units between states
    assert(math.abs(out("A") - out("B")) < 100L, out)
    assert(math.abs(out("A") - 500000000000L) < 1000000L, out)
  }

  test("over-gate relational fallback equals the driver iteration") {
    import org.apache.spark.sql.functions._
    // the same transition frame the query builds, fed to both paths
    val seq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val trans = graft.util.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        graft.util.Tables.epochUs(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(seq))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("n_trans"))
    val fromDriver = EventsQueries.markovSteadyIters(spark, dir, 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val fromFallback = EventsQueries.markovSteadyDistributed(trans, 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fromFallback == fromDriver,
      s"fallback diverged:\n$fromFallback\nvs\n$fromDriver")
  }
}
