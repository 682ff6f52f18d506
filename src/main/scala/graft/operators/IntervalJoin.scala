package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** One-sided event-time interval join: pair each left row with the
  * right rows of the same key whose time falls in
  * `[l_time, l_time + horizon)` — "errors in the N minutes after the
  * purchase" enrichment.
  *
  * The predicate is exactly the equality + two-sided-time-bound shape
  * Structured Streaming accepts for watermarked stream-stream joins,
  * so the same builder serves both modes: batch (oracle-checked via
  * `ev_stream_interval_join`) and streaming (StreamJoinSpec asserts
  * the streamed result equals this batch plan on the same rows).
  *
  * Scale: in batch Catalyst plans the equality as the join key (sort-
  * merge or AQE-broadcast) with the time bounds as residual filters —
  * no nested loop. In streaming the time bound is what lets the state
  * store evict: right-side state older than `watermark - horizon` is
  * dropped, so state is bounded by rate x horizon, not the stream.
  */
object IntervalJoin {

  /** Key/time columns are referenced side-explicitly, so same-named
    * inputs still resolve; keep the remaining columns disjoint so the
    * joined output is unambiguous. */
  def following(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      horizon: Column): DataFrame =
    left.join(right,
      left(leftKey) === right(rightKey) &&
        right(rightTime) >= left(leftTime) &&
        right(rightTime) < left(leftTime) + horizon)
}
