package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The dashboard time-filter surface (SURVEY F5 — Grafana
  * `$__timeFrom/To` on every panel): optional `[from, to)` bounds on
  * each `ev_*` panel. Three properties:
  *
  *  - defaults (`None`) are a no-op — byte-identical to the
  *    registered oracle-checked form,
  *  - hour-aligned bounds equal filtering the unbounded rollup output
  *    (the reference's view-then-filter refresh semantics),
  *  - the bound is a plain `ts` predicate applied before the first
  *    aggregate, and on the micro-precision testdata layout it reaches
  *    the parquet scan as PushedFilters (row-group stats skip whole
  *    chunks outside the dashboard range — the scan-level analog of
  *    the partition pruning PlanSpec's PartitionedEvents guard covers
  *    on engine-written layouts).
  */
class PanelBoundsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val f = "2024-01-05"
  private val t = "2024-01-12"
  private def us(day: String): Long =
    java.sql.Timestamp.valueOf(day + " 00:00:00").getTime * 1000L

  test("default bounds are a no-op on every parameterized panel") {
    val bounded = EventsQueries.hourlyMetrics(spark, dir, None, None)
    val registered = graft.SparkEntry.queries("ev_hourly_metrics")(spark, dir)
    assert(bounded.collect().toSeq == registered.collect().toSeq)
  }

  test("hour-aligned bounds equal filtering the unbounded rollup") {
    val bounded = EventsQueries.hourlyMetrics(spark, dir, Some(f), Some(t))
      .collect().toSeq
    val filtered = EventsQueries.hourlyMetrics(spark, dir)
      .filter(col("hour_us") >= us(f) && col("hour_us") < us(t))
      .collect().toSeq
    assert(bounded.nonEmpty)
    assert(bounded == filtered)
  }

  test("day-aligned bounds equal filtering the unbounded daily summary") {
    val bounded = EventsQueries.dailySummary(spark, dir, Some(f), Some(t))
      .collect().toSeq
    val filtered = EventsQueries.dailySummary(spark, dir)
      .filter(col("day") >= f && col("day") < t)
      .collect().toSeq
    assert(bounded.nonEmpty)
    assert(bounded == filtered)
  }

  test("malformed bounds fail fast instead of silently emptying the panel") {
    // lit(bad).cast(timestamp) is null and `ts >= null` drops every
    // row — a typo'd dashboard range must error, not render empty
    val e = intercept[IllegalArgumentException] {
      EventsQueries.hourlyMetrics(spark, dir, Some("2024-13-99"), None)
    }
    assert(e.getMessage.contains("2024-13-99"), e.getMessage)
    intercept[IllegalArgumentException] {
      EventsQueries.dailySummary(spark, dir, None, Some("not-a-time"))
    }
    // ISO 'T' separator and plain dates both parse
    assert(EventsQueries.hourlyMetrics(spark, dir,
      Some("2024-01-05T06:00:00"), Some(t)).collect().nonEmpty)
    // the guard must accept everything the cast accepts: Grafana's
    // $__timeFrom emits zone-suffixed UTC ISO-8601, and Spark's cast
    // parses 'Z', explicit offsets, and non-padded date fields
    val utc = EventsQueries.hourlyMetrics(spark, dir,
      Some(f + "T00:00:00Z"), Some(t + "T00:00:00Z")).collect().toSeq
    assert(utc.nonEmpty)
    assert(utc == EventsQueries.hourlyMetrics(spark, dir, Some(f), Some(t))
      .collect().toSeq)
    assert(EventsQueries.hourlyMetrics(spark, dir,
      Some("2024-1-5"), None).collect().nonEmpty)
  }

  test("bounds evaluate as a row filter before the first aggregate") {
    val p = EventsQueries.peakLoad(spark, dir, Some(f), Some(t))
      .queryExecution.executedPlan.toString
    // the predicate must sit under the partial aggregate (a Filter in
    // the same codegen stage as the scan), never above a shuffle
    val filterPos = p.indexOf(" Filter ")
    val aggPos = p.lastIndexOf("HashAggregate")
    assert(filterPos >= 0 && aggPos >= 0 && filterPos > aggPos, p)
    assert(p.contains("2024-01-05"), p)
  }

  test("bounds reach the events scan as pushed filters (micros layout)") {
    // Catalyst rewrites `cast(ts as timestamp) >= lit` below the
    // loader's NTZ normalization (UTC session: the cast is
    // order-preserving), so the dashboard range lands in the parquet
    // scan where row-group stats can skip data — the property that
    // keeps a narrow dashboard window cheap on a 100 TB event log.
    // Asserted against a micros-layout fixture WRITTEN BY THIS TEST
    // (Spark's default parquet timestamp type), not the shared
    // testdata: older generator builds ship TIMESTAMP(NANOS) events,
    // where the loader's rebuild legitimately blocks pushdown — the
    // assertion must pin code behavior, not the generator's build.
    val fixDir = tmpDir("graft-panel-push")
    writeFixture(fixDir, "events",
      graft.util.Tables.load(spark, dir, "events"))
    val p = EventsQueries.peakLoad(spark, fixDir.toString, Some(f), Some(t))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,2024-01-05"), p)
    assert(p.contains("LessThan(ts,2024-01-12"), p)
  }
}
