package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed layout guards: joins and aggregations on the bucket key
  * must compile WITHOUT an exchange (the shuffle was paid at write
  * time), and results must match the unbucketed plan. */
class BucketedTablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("equi-join on the bucket key compiles with no exchange") {
    val ev = graft.util.Tables.load(spark, dir, "events")
    BucketedTables.writeBucketed(
      ev.select("event_id", "user_id", "value"), "ev_bucketed_a", "user_id", 8)
    BucketedTables.writeBucketed(
      ev.select("user_id", "event_type"), "ev_bucketed_b", "user_id", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: with broadcast allowed the planner
      // (correctly) prefers a BroadcastExchange for this tiny side,
      // which hides the property under test — bucket co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = BucketedTables.read(spark, "ev_bucketed_a")
      val b = BucketedTables.read(spark, "ev_bucketed_b")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val joined = a.join(b, "user_id")
      val p = joined.queryExecution.executedPlan.toString
      // ShuffleExchangeExec prints as "Exchange hashpartitioning(...)"
      // in plan strings (never "ShuffleExchange")
      assert(!p.contains("Exchange hashpartitioning"), p)
      // same result as the shuffled plan over the raw table
      val expected = ev.select("event_id", "user_id", "value")
        .join(ev.groupBy("user_id").agg(count(lit(1)).as("n")), "user_id")
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")
    }
  }

  test("aggregation on the bucket key compiles with no exchange") {
    val ev = graft.util.Tables.load(spark, dir, "events")
    BucketedTables.writeBucketed(
      ev.select("user_id", "value"), "ev_bucketed_c", "user_id", 8)
    try {
      val agg = BucketedTables.read(spark, "ev_bucketed_c")
        .groupBy("user_id").agg(sum("value").as("s"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      assert(agg.count() == ev.select("user_id").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS ev_bucketed_c")
  }
}
