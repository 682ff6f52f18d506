package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Threshold alerting over streaming progress — the engine-side analog
  * of the reference's Prometheus rule `HighEventFailureRate`
  * (monitoring/prometheus/alerts.yml:5-12: alert when failed events
  * exceed 5/min, sustained for 1 minute). The reference exports
  * counters and lets Prometheus evaluate the rule; here the same
  * evaluation rides the engine's own progress events, so the alert
  * works anywhere the stream runs — no scrape loop required.
  *
  * Wiring: `spark.streams.addListener(monitor)` next to
  * [[EventsPipeline.start]]. Each progress event carries the
  * `graft_ingest` observed metrics (valid/invalid per micro-batch, see
  * EventsPipeline); the monitor keeps a sliding `windowMs` of invalid
  * counts, computes the per-minute failure rate, and flips `firing`
  * once the rate stays above `failuresPerMinute` for `sustainMs`.
  * State is O(samples in window) — independent of stream volume.
  *
  * [[record]] is public and clock-explicit so specs (and batch
  * backfills) can drive crafted timelines deterministically; the
  * listener callback just extracts (timestamp, invalid_events) and
  * delegates.
  */
class AlertMonitor(
    failuresPerMinute: Double = 5.0,
    sustainMs: Long = 60000L,
    windowMs: Long = 60000L) extends StreamingQueryListener {

  /** One alert state change: raised (firing=true) or cleared. */
  final case class Transition(atMs: Long, firing: Boolean, ratePerMin: Double)

  private val samples = scala.collection.mutable.ArrayDeque.empty[(Long, Long)]
  private var breachSinceMs: Option[Long] = None
  private var history = Vector.empty[Transition]
  private var invalidTotal = 0L
  @volatile private var isFiring = false

  /** Is the alert currently raised? */
  def firing: Boolean = isFiring

  /** Raised/cleared transitions in arrival order. */
  def transitions: Seq[Transition] = synchronized(history)

  /** Total invalid events observed since attach (the raw counter the
    * reference exports as events_failed_total). */
  def totalInvalid: Long = synchronized(invalidTotal)

  /** Record one (sample time, invalid count) observation and
    * re-evaluate the rule. */
  def record(atMs: Long, invalid: Long): Unit = synchronized {
    invalidTotal += invalid
    samples.append((atMs, invalid))
    while (samples.nonEmpty && samples.head._1 <= atMs - windowMs)
      samples.removeHead()
    val ratePerMin =
      samples.iterator.map(_._2).sum * 60000.0 / windowMs.toDouble
    breachSinceMs =
      if (ratePerMin > failuresPerMinute) breachSinceMs.orElse(Some(atMs))
      else None
    val nowFiring = breachSinceMs.exists(s => atMs - s >= sustainMs)
    if (nowFiring != isFiring) history :+= Transition(atMs, nowFiring, ratePerMin)
    isFiring = nowFiring
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val om = event.progress.observedMetrics
    if (om.containsKey("graft_ingest")) {
      val atMs = java.time.Instant.parse(event.progress.timestamp).toEpochMilli
      record(atMs, om.get("graft_ingest").getAs[Long]("invalid_events"))
    }
  }
}
