package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join: for each left row, attach the
  * payload of the most recent right row with the same key and
  * `right.time <= left.time` (inclusive, like DuckDB `ASOF LEFT JOIN
  * ... ON l.k = r.k AND l.t >= r.t`).
  *
  * The reference has no as-of operator (its only join shapes are
  * equi/semi, SURVEY.md §2.5); this is a north-star extension for
  * time-series enrichment (e.g. "price in effect at event time").
  *
  * Scale design: no join at all — both sides are unioned, shuffled
  * ONCE on the key, and swept with a single ordered window pass per
  * key (`last(payload, ignoreNulls)` over rows-unbounded-preceding).
  * A naive range join explodes to |L|x|R| per key before filtering;
  * this stays O(|L|+|R|) rows with one shuffle, and is exactly the
  * sort-merge sweep a native as-of implementation performs. Skew is
  * bounded by per-key row counts (the same bound the final sort of a
  * native as-of join has).
  *
  * Tie semantics: right rows at the exact left timestamp ARE visible
  * (right sorts before left at equal `time`). Among multiple right
  * rows with identical (key, time) the winner is unspecified — same
  * as SQL ASOF.
  *
  * Caveat: a right payload that is entirely NULL in every attached
  * column is indistinguishable from "no match" (ignoreNulls skips
  * the whole-struct null marker rows only when the struct itself is
  * null; per-field nulls inside a matched payload are preserved).
  */
object AsofJoin {

  /** @param left  rows to enrich (keeps ALL its columns)
    * @param right rows providing the payload; every column except
    *              `key`/`time` is attached (null when no prior row).
    *              Payload column names must not collide with left's.
    */
  def backward(left: DataFrame, right: DataFrame,
               key: String, time: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = right.columns.toSeq.filterNot(c => c == key || c == time)
    val lNorm = left.select(
      col(key).as("__k"), col(time).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"))
    val rNorm = right.select(
      col(key).as("__k"), col(time).as("__t"), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__r"))
    // one shuffle on __k; ordered linear sweep within each key
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }
}
