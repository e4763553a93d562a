package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Sessionization on Spark 4's `transformWithState` arbitrary-state
  * API (the successor to flatMapGroupsWithState): typed ValueState,
  * explicit event-time timers, state TTL support. Same gap semantics
  * as [[Sessionize]] — one open session per key, closed on gap or on
  * the timer once the watermark passes lastTs + gap.
  */
object SessionizeV2 {
  import Sessionize.{Event, Session, SessionState}

  implicit private val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit private val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    private def toSession(userId: Long, s: SessionState): Session =
      Session(userId, new Timestamp(s.start), new Timestamp(s.lastTs), s.n, s.total)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[Session] = {
      val out = ArrayBuffer.empty[Session]
      val prior = Option(session.get())
      val cur = Sessionize.foldBatch(gapMs, key,
        rows.toSeq.sortBy(e => (e.ts.getTime, e.value)), prior, out)
      cur.foreach { s =>
        session.update(s)
        // one live timer per key: delete the previous expiry before
        // registering the new one — re-registering every batch without
        // cleanup accumulates a stale timer per extension, each firing
        // later just to be discarded by the expiry guard
        prior.filter(p => p.lastTs != s.lastTs)
          .foreach(p => getHandle.deleteTimer(p.lastTs + gapMs))
        getHandle.registerTimer(s.lastTs + gapMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      val s = session.get()
      if (s != null && expiredTimerInfo.getExpiryTimeInMs() >= s.lastTs + gapMs) {
        session.clear()
        Iterator(toSession(key, s))
      } else Iterator.empty
    }
  }

  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       watermarkDelay: String = "10 minutes"): Dataset[Session] =
    events.selectExpr("user_id", "ts", "value")
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60L * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
}
