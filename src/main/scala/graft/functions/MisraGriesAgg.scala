package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded counter table: at most `m` live (key, count) pairs. */
case class MgBuf(counts: Map[String, Long])

/** Misra–Gries frequent-items summary as a typed `Aggregator` — the
  * deterministic counterpart of the CMS sketch (SketchExpressions):
  * zero false NEGATIVES by construction. With capacity `m`, every key
  * whose true frequency exceeds N/(m+1) is guaranteed to survive the
  * summary, so a cheap bounded-state first pass can nominate the
  * candidate set for an exact second pass that touches only candidate
  * rows (see TextQueries.heavyHitters).
  *
  * Scale design (100 TB): the buffer never exceeds `m` entries no
  * matter how many rows or distinct keys flow through a partition, so
  * the candidate pass is a partial aggregation with O(m) state per
  * task and a single m-row merge at the driver side of the final agg —
  * no shuffle of the key domain at all. The merge implements the
  * summary combination of Agarwal et al. (SIGMOD'12 "Mergeable
  * Summaries"): add counts keywise, then subtract the (m+1)-th largest
  * count from everything and drop non-positive entries. That keeps the
  * total undercount ≤ N/(m+1) under ANY merge tree, which is exactly
  * Spark's partial-aggregation contract (partitions reduce
  * independently, combine in any order).
  *
  * Reference anchor: the reference's dashboards rank "top channels /
  * top event types" with full GROUP BYs (e.g.
  * monitoring/grafana/dashboards/business-metrics.json panels); this
  * is the bounded-state route to the same answers when the key domain
  * itself is too large to shuffle.
  */
case class MisraGriesAgg(m: Int) extends Aggregator[String, MgBuf, Seq[String]] {
  require(m >= 1, s"capacity must be positive, got $m")

  override def zero: MgBuf = MgBuf(Map.empty)

  override def reduce(b: MgBuf, key: String): MgBuf = {
    val c = b.counts
    c.get(key) match {
      case Some(n) => MgBuf(c.updated(key, n + 1L))
      case None if c.size < m => MgBuf(c.updated(key, 1L))
      case None =>
        // table full: decrement every counter (the incoming key's +1
        // and one decrement cancel), dropping zeros. Each decrement
        // "spends" m+1 occurrences, hence the N/(m+1) error bound.
        MgBuf(c.collect { case (k, n) if n > 1L => k -> (n - 1L) })
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (a.counts.isEmpty) b
    else if (b.counts.isEmpty) a
    else {
      val summed = b.counts.foldLeft(a.counts) { case (acc, (k, n)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + n)
      }
      if (summed.size <= m) MgBuf(summed)
      else {
        // subtract the (m+1)-th largest count from all entries; at
        // most m survive and every entry's undercount grows by at
        // most that subtrahend (mergeable-summaries bound).
        val cut = summed.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(m)
        MgBuf(summed.collect { case (k, n) if n > cut => k -> (n - cut) })
      }
    }
  }

  /** Surviving candidate keys, sorted for determinism. The counts are
    * lower bounds (true − N/(m+1) ≤ est ≤ true) and deliberately NOT
    * returned: callers re-count candidates exactly (a join that only
    * shuffles candidate rows) instead of publishing approximations. */
  override def finish(b: MgBuf): Seq[String] = b.counts.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
