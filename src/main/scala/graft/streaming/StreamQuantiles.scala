package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming value quantiles — the ingest-time twin of the batch
  * `ev_value_quantiles` audit: per event-time window and event type,
  * p50/p95 of `value` from a BOUNDED mergeable sketch
  * (`approx_percentile`, the Greenwald-Khanna summary), as a windowed
  * watermarked aggregation — the SLO table an on-call reads while the
  * stream runs, hours before the exact batch audit can.
  *
  * Why approximate here when the batch twin is exact: exact
  * percentile buffers EVERY value per group — unbounded streaming
  * state; the GK summary is O(1/ε) per (window, type) group and
  * merges associatively, which is exactly the partial→state merge
  * contract Structured Streaming requires. The ε-rank guarantee
  * (|rank(returned) − target rank| ≤ ε·n, accuracy = 1/ε) holds under
  * any merge tree, so the streamed numbers carry the same bound as a
  * batch approx run — StreamQuantilesSpec checks every streamed
  * quantile against the exact batch rank bound, and `ev_value_quantiles`
  * remains the exact audit the sketch is graded against.
  *
  * Scale: state per group is the fixed sketch, output one row per
  * (hour, type); watermark bounds retained windows exactly like the
  * hourly-metrics pipeline (EventsPipeline §2.8 semantics). */
object StreamQuantiles {

  /** 1h-tumbling windowed p50/p95 per event type over an event stream
    * carrying (ts TIMESTAMP, event_type STRING, value DOUBLE).
    * `accuracy` is the GK 1/ε knob (10000 → rank error ≤ n/10000). */
  def hourly(events: DataFrame, accuracy: Int = 10000,
      watermark: String = "24 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        expr(s"approx_percentile(value, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(value, 0.95, $accuracy)").as("p95"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("p50"), col("p95"))
}
