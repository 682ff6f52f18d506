package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg

/** Streaming frequent-items — the ingest-time twin of the batch
  * `txt_heavy_hitters` pipeline (graft.queries.TextQueries): the same
  * Misra-Gries `Aggregator` run as a streaming GLOBAL aggregation, so
  * the state store holds exactly ONE bounded O(m) buffer no matter how
  * many rows or distinct keys the stream carries.
  *
  * Guarantee carries over unchanged: Structured Streaming reduces each
  * micro-batch into partial buffers and merges them into the stored
  * state — precisely the arbitrary-merge-tree contract the
  * mergeable-summaries bound covers (MisraGriesSpec) — so at every
  * output, any key whose TOTAL stream frequency exceeds N/(m+1)
  * is present in the candidate array: zero false negatives,
  * continuously. False positives are expected (the sketch only decides
  * who is worth counting); the exact verify is the batch query's
  * second pass, or a `foreachBatch` count over the candidate set.
  *
  * Scale: per-executor partial aggregation is O(m) memory; the state
  * store carries one m-entry map; the per-batch output is one row.
  * This is the shape that survives a 100 TB/day token stream — a
  * streaming GROUP BY token would hold the full key domain in state. */
object StreamHeavyHitters {

  /** Candidate heavy keys of the stream so far (complete/update-mode
    * global aggregation; one output row holding the candidate array,
    * sorted for determinism). */
  def candidates(stream: DataFrame, keyCol: String, m: Int): DataFrame = {
    val mg = udaf(MisraGriesAgg(m), Encoders.STRING)
    stream.select(col(keyCol).cast("string").as("k"))
      .agg(mg(col("k")).as("candidates"))
  }
}
