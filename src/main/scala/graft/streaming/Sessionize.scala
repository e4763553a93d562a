package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: custom per-key state with
  * `flatMapGroupsWithState` (the KeyValueGroupedDataset state API the
  * batch `w4_sessionize` query mirrors).
  *
  * Semantics match the batch twin: a gap > `gapMs` between consecutive
  * events of a user closes the session. State is ONE open session per
  * user (bounded); event-time timeout flushes sessions whose close is
  * certain once the watermark passes lastTs + gap — so late events
  * within the watermark still extend their session, and state never
  * outlives the watermark horizon (the 100 TB requirement: state
  * proportional to ACTIVE keys, not history).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, total_value: Double)

  implicit private val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit private val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit private val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  private def toSession(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.lastTs), s.n, s.total)

  private def step(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val closed = toSession(userId, state.get)
      state.remove()
      return Iterator(closed)
    }
    val out = ArrayBuffer.empty[Session]
    var cur = state.getOption
    events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastTs <= gapMs =>
          cur = Some(s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1,
            total = s.total + e.value))
        case Some(s) =>
          out += toSession(userId, s)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastTs + gapMs)
    }
    out.iterator
  }

  /** events(user_id, ts, value) stream → closed sessions stream.
    * @param watermarkDelay how late events may arrive and still extend
    *   their session (also bounds state lifetime).
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val gapMs = gapMinutes * 60L * 1000L
    events.selectExpr("user_id", "ts", "value")
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(gapMs))
  }
}
