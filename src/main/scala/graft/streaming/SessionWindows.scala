package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessions via Spark's BUILT-IN `session_window` — the
  * declarative third formulation next to the relational lag/cumsum
  * query (`EventsQueries.sessionization`, DuckDB-oracled) and the
  * typed custom-state fold (`operators.Sessionize`). Prefer this one
  * when the per-session output is plain aggregates: Catalyst plans the
  * gap-merge natively (`UpdatingSessionsExec` + merging state store on
  * the streaming side), so there is no user state-management code to
  * get wrong, and batch/streaming share one expression.
  *
  * Semantics note shared by all three forms: a session's `end` here is
  * `last event + gap` (the window's close), where the relational query
  * emits `end_us = last event`; SessionWindowsSpec pins the exact
  * correspondence. State at scale is bounded by the watermark exactly
  * like the tumbling-window rollup in [[EventsPipeline]].
  */
object SessionWindows {

  val Gap = "30 minutes"

  private def sessions(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), session_window(col("ts"), Gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Batch: one aggregate, no windows over the corpus — the gap-merge
    * happens inside the sort-based session aggregation per user
    * partition. */
  def batchSessions(ev: DataFrame): DataFrame = sessions(ev)

  /** Streaming: event-time watermark bounds the merging session state;
    * Append emits each session once its close passes the watermark. */
  def streamingSessions(ev: DataFrame, watermark: String = "1 hour"): DataFrame =
    sessions(ev.withWatermark("ts", watermark))
}
