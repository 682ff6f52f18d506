package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Last-touch conversion attribution as a typed custom-state operator —
  * the streaming twin of the relational
  * [[graft.queries.EventsQueries.attribution]] (`ev_attribution`),
  * which is the oracle-checked batch formulation.
  *
  * Per user, every purchase is credited to the most recent preceding
  * touch (view/click) within [[LookbackUs]], or to "none". The state
  * is ONE (type, timestamp) pair per user — never an event buffer —
  * so per-key state is O(1) regardless of stream length, the property
  * that makes the operator viable over an unbounded event stream.
  *
  * Batch and streaming share the same fold. Streaming processes each
  * micro-batch in event-time order and carries the last touch across
  * batches; an event-time timeout expires keys idle longer than the
  * lookback (their stored touch could no longer credit anything).
  * Cross-batch out-of-order events inside the watermark can observe a
  * stale touch exactly as in the reference's at-least-once consumer —
  * the same documented approximation as [[Sessionize]] /
  * [[PatternMatch]].
  */
object Attribution {

  /** Attribution lookback — matches ev_attribution's 72 h. */
  val LookbackUs: Long = 72L * 3600L * 1000000L

  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  final case class AttribEvent(
      userId: Long, eventId: Long, eventTime: Timestamp,
      eventType: String, value: Double)

  /** Last stored touch per user. */
  final case class Touch(touchType: String, touchUs: Long)

  final case class Credit(
      userId: Long, purchaseId: Long, purchaseUs: Long,
      channel: String, value: Double)

  private val Touches = Set("view", "click")

  /** One fold over a user's time-ordered events, threading the last
    * touch; emits a credit per purchase. */
  private def fold(key: Long, sorted: Seq[AttribEvent],
      start: Option[Touch]): (Vector[Credit], Option[Touch]) =
    sorted.foldLeft((Vector.empty[Credit], start)) {
      case ((out, touch), e) =>
        if (Touches(e.eventType))
          (out, Some(Touch(e.eventType, us(e.eventTime))))
        else if (e.eventType == "purchase") {
          val t = us(e.eventTime)
          val channel = touch match {
            case Some(Touch(tt, tu)) if tu >= t - LookbackUs => tt
            case _ => "none"
          }
          (out :+ Credit(key, e.eventId, t, channel, e.value), touch)
        } else (out, touch)
    }

  /** Batch crediting: per-key event-time sort + fold. */
  def batchCredits(events: Dataset[AttribEvent]): Dataset[Credit] = {
    implicit val enc = Encoders.product[Credit]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroups { (key, it) =>
        val sorted = it.toSeq.sortBy(e => (us(e.eventTime), e.eventId))
        fold(key, sorted, None)._1.iterator
      }
  }

  /** Streaming crediting with O(1) per-key state. Apply to a
    * watermarked Dataset[AttribEvent]; use with OutputMode.Append. */
  def streamingCredits(events: Dataset[AttribEvent]): Dataset[Credit] = {
    implicit val enc = Encoders.product[Credit]
    implicit val stateEnc = Encoders.product[Touch]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[Touch, Credit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[AttribEvent], state: GroupState[Touch]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past the lookback: touch can't credit
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (us(e.eventTime), e.eventId))
            val (out, touch) = fold(key, sorted, state.getOption)
            touch match {
              case Some(t) =>
                state.update(t)
                // clamped to the watermark: setTimeoutTimestamp THROWS
                // on a pre-watermark timestamp. Usually the pending
                // timeout fires (and removes the state) in the batch
                // where the watermark passes it, but a key that
                // receives data in exactly that batch takes the data
                // path with its stale touch — the clamp re-arms at
                // watermark+1 instead of killing the whole query
                state.setTimeoutTimestamp(
                  math.max(t.touchUs / 1000L + LookbackUs / 1000L,
                    state.getCurrentWatermarkMs() + 1))
              case None => () // no touch seen yet: nothing to expire
            }
            out.iterator
          }
      }
  }
}
