package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ordered event-pattern matching (CEP / MATCH_RECOGNIZE surface) as a
  * typed custom-state operator — the streaming twin of the relational
  * [[graft.queries.EventsQueries.funnelSequences]] (`ev_funnel_sequences`),
  * which is the oracle-checked batch formulation.
  *
  * Detects CONSECUTIVE chains of event types per key (default
  * view -> click -> purchase) with a constant-size automaton: the
  * state is just the current matched-prefix length and the last event
  * time, never a buffer of events — per-key state is O(1) regardless
  * of stream length, the property that makes this viable over 100 TB
  * of events. For self-overlap-free patterns (all steps distinct) the
  * restart-on-mismatch automaton counts exactly the same chains as the
  * batch query's sliding windows.
  *
  * Batch and streaming share the same fold. Streaming processes each
  * micro-batch in event-time order and uses an event-time timeout only
  * to expire IDLE keys past the watermark (state hygiene, not
  * correctness); cross-batch out-of-order events inside the watermark
  * break chain adjacency exactly as they would in the reference's
  * at-least-once consumer — the same documented approximation as
  * [[Sessionize]].
  */
object PatternMatch {

  /** Default funnel; any self-overlap-free sequence works. */
  val DefaultPattern: Seq[String] = Seq("view", "click", "purchase")

  /** Idle-key state expiry (streaming only). */
  val IdleTimeoutMs: Long = 24 * 3600 * 1000L

  private def us(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  final case class PatternEvent(
      userId: Long, eventId: Long, eventTime: Timestamp, eventType: String)

  final case class Progress(matched: Int, lastUs: Long)

  final case class ChainMatch(userId: Long, endUs: Long, endEventId: Long)

  /** One automaton step: extend the matched prefix, restart on the
    * pattern head, or reset. Returns (newProgress, completed). */
  private def step(pattern: IndexedSeq[String], matched: Int,
      e: PatternEvent): (Int, Boolean) = {
    val next =
      if (e.eventType == pattern(matched)) matched + 1
      else if (e.eventType == pattern(0)) 1
      else 0
    if (next == pattern.length) (0, true) else (next, false)
  }

  private def fold(pattern: IndexedSeq[String], key: Long,
      sorted: Seq[PatternEvent], start: Int): (Vector[ChainMatch], Int) =
    sorted.foldLeft((Vector.empty[ChainMatch], start)) {
      case ((out, matched), e) =>
        val (next, completed) = step(pattern, matched, e)
        if (completed) (out :+ ChainMatch(key, us(e.eventTime), e.eventId), next)
        else (out, next)
    }

  /** Batch matching: per-key event-time sort + automaton fold. */
  def batchMatches(events: Dataset[PatternEvent],
      pattern: Seq[String] = DefaultPattern): Dataset[ChainMatch] = {
    val pat = pattern.toIndexedSeq
    implicit val enc = Encoders.product[ChainMatch]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroups { (key, it) =>
        val sorted = it.toSeq.sortBy(e => (us(e.eventTime), e.eventId))
        fold(pat, key, sorted, 0)._1.iterator
      }
  }

  /** Streaming matching with O(1) per-key state. Apply to a
    * watermarked Dataset[PatternEvent]; use with OutputMode.Append. */
  def streamingMatches(events: Dataset[PatternEvent],
      pattern: Seq[String] = DefaultPattern): Dataset[ChainMatch] = {
    val pat = pattern.toIndexedSeq
    implicit val enc = Encoders.product[ChainMatch]
    implicit val stateEnc = Encoders.product[Progress]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[Progress, ChainMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[PatternEvent], state: GroupState[Progress]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: a partial prefix this stale
            Iterator.empty // cannot complete a CONSECUTIVE chain anyway
          } else {
            val sorted = it.toSeq.sortBy(e => (us(e.eventTime), e.eventId))
            val prev = state.getOption.getOrElse(Progress(0, 0L))
            val (out, matched) = fold(pat, key, sorted, prev.matched)
            val lastUs = sorted.lastOption.map(e => us(e.eventTime))
              .getOrElse(prev.lastUs)
            state.update(Progress(matched, lastUs))
            // clamped: a pre-watermark timeout timestamp throws and
            // kills the query (stale lastUs after other keys advanced
            // the watermark); watermark+1 fires next batch instead
            state.setTimeoutTimestamp(
              math.max(lastUs / 1000L + IdleTimeoutMs,
                state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
