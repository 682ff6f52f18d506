package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Threshold alerting over the ANN index's GEOMETRY staleness — the
  * [[IndexStalenessMonitor]] contract applied to
  * [[graft.sources.AnnIndexLayout.stalenessMetrics]]: the text index
  * knows when its frozen vocabulary has rotted (OOV mass / avgdl
  * shift); this is the same page for the vector index's frozen coarse
  * centroids + PQ codebook, whose decay mode is silent recall loss
  * rather than an error.
  *
  * Two LEVEL thresholds from the audit's own analysis: cell-occupancy
  * skew (total-variation distance of current vs build-time occupancy
  * shares — deltas piling into cells the build never favored) and
  * quantization-error rise (the frozen codebook reconstructing recent
  * vectors worse than it reconstructed the build sample). Levels, not
  * rates: each audit tick fully describes the state, so the rule is
  * breach-sustained-for-`sustainMs`, cleared the moment a tick
  * measures below both thresholds — a rebuild recaptures the
  * reference tables and the next audit clears the alert.
  * [[record]] is clock-explicit so specs drive crafted timelines;
  * [[check]] runs the real audit and records it — call it from the
  * maintenance cadence (after each delta batch), exactly where a
  * metrics scrape would sit.
  */
class AnnStalenessMonitor(
    occSkewPpm: Long = 200000L,
    qerrRisePpm: Long = 250000L,
    sustainMs: Long = 0L) {

  /** One alert state change: raised (firing=true) or cleared. */
  final case class Transition(atMs: Long, firing: Boolean,
      occPpm: Long, qerrPpm: Long)

  private var breachSinceMs: Option[Long] = None
  private var history = Vector.empty[Transition]
  @volatile private var isFiring = false

  def firing: Boolean = isFiring

  def transitions: Seq[Transition] = synchronized(history)

  /** Record one audit observation and re-evaluate the rule. */
  def record(atMs: Long, occPpm: Long, qerrPpm: Long): Unit =
    synchronized {
      val breach = occPpm > occSkewPpm || qerrPpm > qerrRisePpm
      breachSinceMs =
        if (breach) breachSinceMs.orElse(Some(atMs)) else None
      val nowFiring = breachSinceMs.exists(s => atMs - s >= sustainMs)
      if (nowFiring != isFiring)
        history :+= Transition(atMs, nowFiring, occPpm, qerrPpm)
      isFiring = nowFiring
    }

  /** Run the geometry audit for `prefix` with `recentVecs` as the
    * freshness probe, record it at `atMs`, and return the measured
    * (occ_skew_ppm, qerr_rise_ppm). */
  def check(spark: SparkSession, prefix: String, recentVecs: DataFrame,
      atMs: Long): (Long, Long) = {
    val row = graft.sources.AnnIndexLayout
      .stalenessMetrics(spark, prefix, recentVecs).head()
    val occ = row.getAs[Long]("occ_skew_ppm")
    val qerr = row.getAs[Long]("qerr_rise_ppm")
    record(atMs, occ, qerr)
    (occ, qerr)
  }
}
