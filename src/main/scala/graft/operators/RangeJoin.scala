package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed band range join: pairs of rows with equal `key` whose
  * numeric ordinates lie within `tol` of each other
  * (`|l.time - r.time| <= tol`).
  *
  * The reference has no range join (SURVEY.md §2.5); this is the
  * north-star extension for proximity joins (events within N minutes,
  * readings within a tolerance, positions within a distance band).
  *
  * Scale design: a naive theta join `l.k = r.k AND abs(l.t - r.t) <= tol`
  * degenerates to a per-key cross product (Spark plans it as a
  * broadcast/shuffle nested loop within key groups). Instead both
  * sides are hashed into `tol`-wide time buckets; the left side is
  * replicated to its bucket and both neighbors ({b-1, b, b+1}), the
  * join is a plain equi-join on (key, bucket) — one hash shuffle each
  * side — and the exact band predicate filters the candidates. Any
  * true pair is at most one bucket apart, so recall is exact; cost is
  * 3x|L| + |R| shuffled rows plus genuine near-pairs, never |L|x|R|.
  * This is the bucketed "band join" strategy native engines use for
  * interval joins.
  */
object RangeJoin {

  /** @param left  rows with `key` and long-typed ordinate `time`
    * @param right rows with the same two column names; all other
    *              column names must be disjoint from left's
    * @param tol   inclusive band half-width (same unit as `time`)
    */
  def withinTolerance(left: DataFrame, right: DataFrame,
                      key: String, time: String, tol: Long): DataFrame = {
    require(tol > 0, "tolerance must be positive")
    val lt = col(s"__lt")
    val rt = col(time)
    // integral bucket arithmetic (`div`), NOT double division: beyond
    // 2^53 (e.g. nanosecond epochs) a double quotient can round across
    // a bucket boundary. Ordinates are assumed non-negative (div
    // truncates toward zero).
    val lb = expr(s"__lt div $tol")
    val lRep = left
      .withColumnRenamed(time, "__lt")
      .withColumn("__b", explode(array(lb - 1L, lb, lb + 1L)))
    val rB = right.withColumn("__b", expr(s"`$time` div $tol"))
    lRep.join(rB, Seq(key, "__b"))
      .filter(abs(lt - rt) <= tol)
      .drop("__b")
      .withColumnRenamed("__lt", s"${time}_left")
  }
}
