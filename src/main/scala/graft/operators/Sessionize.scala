package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the typed custom-state operator surface
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`).
  *
  * The reference carries explicit `session_id`s, so it never needs
  * time-gap sessions (SURVEY.md §2.8); this is part of the extension
  * surface: derive sessions from activity gaps (30 min) per customer.
  *
  * Batch and streaming share the same fold; streaming closes sessions
  * via event-time timeout once the watermark passes `last + gap`
  * (state is bounded by the watermark, exactly like the reference's
  * 24h in-memory pruning). Events are processed in event-time order
  * within each batch; cross-batch out-of-order input inside the
  * watermark merges into the open session (late events that would
  * split an already-closed session are a documented approximation —
  * exact retro-splitting needs per-event state buffering).
  */
object Sessionize {

  val GapMs: Long = 30 * 60 * 1000L
  val GapUs: Long = GapMs * 1000L

  /** Timestamp -> epoch micros (java.sql.Timestamp.getTime is millis;
    * the fractional part lives in getNanos). */
  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def toTs(usv: Long): Timestamp = {
    val t = new Timestamp(usv / 1000000L * 1000L)
    t.setNanos(((usv % 1000000L) * 1000L).toInt)
    t
  }

  final case class SessionEvent(
      customerId: String, eventTime: Timestamp, eventType: String)

  final case class OpenSession(startUs: Long, lastUs: Long, nEvents: Int)

  final case class Session(
      customerId: String,
      sessionStart: Timestamp,
      sessionEnd: Timestamp,
      nEvents: Int,
      durationSec: Long)

  private def close(key: String, s: OpenSession): Session =
    Session(key, toTs(s.startUs), toTs(s.lastUs),
      s.nEvents, (s.lastUs - s.startUs) / 1000000L)

  /** Fold sorted events into sessions; returns (closed, open-tail).
    * Cross-batch late events (earlier than the open session) either
    * extend it backwards (within gap of its start) or emit immediately
    * as their own closed session — history can't be reopened. */
  private def fold(key: String, sorted: Seq[SessionEvent],
      open: Option[OpenSession]): (Seq[Session], Option[OpenSession]) =
    sorted.foldLeft((Vector.empty[Session], open)) {
      case ((closed, cur), e) =>
        val t = us(e.eventTime)
        cur match {
          case Some(s) if t >= s.startUs - GapUs && t <= s.lastUs + GapUs =>
            (closed, Some(s.copy(startUs = math.min(s.startUs, t),
              lastUs = math.max(s.lastUs, t), nEvents = s.nEvents + 1)))
          case Some(s) if t > s.lastUs + GapUs =>
            (closed :+ close(key, s), Some(OpenSession(t, t, 1)))
          case Some(s) => // late singleton, > gap before the open session
            (closed :+ close(key, OpenSession(t, t, 1)), Some(s))
          case None =>
            (closed, Some(OpenSession(t, t, 1)))
        }
    }

  /** Batch sessionization: per-customer sort + gap fold. */
  def batchSessions(events: Dataset[SessionEvent]): Dataset[Session] = {
    implicit val enc = Encoders.product[Session]
    events.groupByKey(_.customerId)(Encoders.STRING)
      .flatMapGroups { (key, it) =>
        val sorted = it.toSeq.sortBy(e => (us(e.eventTime), e.eventType))
        val (closed, open) = fold(key, sorted, None)
        (closed ++ open.map(close(key, _))).iterator
      }
  }

  /** Streaming sessionization with event-time timeout. Apply to a
    * watermarked Dataset[SessionEvent]; emits a session once the
    * watermark passes its end + gap. Use with OutputMode.Append. */
  def streamingSessions(events: Dataset[SessionEvent]): Dataset[Session] = {
    implicit val enc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    events.groupByKey(_.customerId)(Encoders.STRING)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = close(key, state.get)
            state.remove()
            Iterator(out)
          } else {
            val sorted = it.toSeq.sortBy(e => (us(e.eventTime), e.eventType))
            val (closed, open) = fold(key, sorted, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                // clamped: a pre-watermark timeout timestamp throws and
                // kills the query (stale session tail after other keys
                // advanced the watermark); watermark+1 closes it next
                // batch instead
                state.setTimeoutTimestamp(
                  math.max(s.lastUs / 1000L + GapMs,
                    state.getCurrentWatermarkMs() + 1))
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
