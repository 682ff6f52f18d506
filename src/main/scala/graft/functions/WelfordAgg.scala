package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** (count, running mean, sum of squared deviations from the mean) */
case class WelfordBuf(n: Long, mean: Double, m2: Double)

/** Welford/Chan streaming mean + variance as a typed `Aggregator` —
  * the §2.9 UDAF tier demonstrated on the statistic where it matters:
  * naive sum-of-squares cancels catastrophically when |mean| >> stddev,
  * while Welford's update and Chan's pairwise merge stay stable. The
  * merge is exactly the partial-aggregation contract Spark needs:
  * partitions reduce independently and combine in any order without
  * loss (KMeansSpec-style associativity is asserted in the spec).
  *
  * Usage: `udaf(WelfordAgg)` for DataFrame/SQL, or `.agg(WelfordAgg
  * .toColumn)` on a typed Dataset[Double].
  *
  * NOT oracle-checked by design: variance folds are order-dependent in
  * the last ulps, so cross-engine hashing would be flaky — the spec
  * bounds the error against Spark's built-in avg/var_samp instead
  * (the same reasoning that keeps the sketch queries rows-only). */
object WelfordAgg extends Aggregator[Double, WelfordBuf, (Double, Double)] {
  type Buf = WelfordBuf
  private def Buf(n: Long, mean: Double, m2: Double): WelfordBuf =
    WelfordBuf(n, mean, m2)

  override def zero: Buf = Buf(0L, 0.0, 0.0)

  override def reduce(b: Buf, x: Double): Buf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    Buf(n, mean, b.m2 + d * (x - mean))
  }

  /** Chan et al. pairwise combine — associative up to rounding. */
  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      Buf(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  /** (mean, sample variance); (NaN, NaN) on empty, (mean, NaN) on n=1
    * — matching avg/var_samp null semantics is the caller's concern. */
  override def finish(b: Buf): (Double, Double) =
    if (b.n == 0) (Double.NaN, Double.NaN)
    else if (b.n == 1) (b.mean, Double.NaN)
    else (b.mean, b.m2 / (b.n - 1))

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
}
