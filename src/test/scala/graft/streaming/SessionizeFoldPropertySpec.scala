package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the sessionizer's incremental fold: three rounds
  * of subtle bugs lived in this code (naive late-event guard, stale
  * singleton splitting, stale-run bridging, millis truncation), so the
  * semantics are now pinned algebraically, not just by examples.
  *
  * Core property: for ANY event multiset and ANY time-partitioned
  * micro-batch split (batch i+1's events all ≥ batch i's — the
  * file-source arrival order the streaming parity row drives),
  * folding batch-by-batch with carried state and closing the final
  * open session yields EXACTLY the batch consecutive-gap
  * sessionization of the full event list. Pure-JVM (no Spark jobs),
  * so hundreds of cases are cheap.
  *
  * Out of scope by design (documented in [[Sessionize]]): an event
  * arriving AFTER its session was already closed by a later in-batch
  * event cannot re-open it — that is the watermark contract, not a
  * fold bug; the in-span/stale paths are exercised separately below.
  */
class SessionizeFoldPropertySpec extends AnyFunSuite {
  import Sessionize.{Event, Session, SessionState}

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private def ev(tUs: Long, v: Double): Event =
    Event(1L, Sessionize.toTimestamp(tUs), v)

  /** Reference batch sessionization: consecutive-gap rule over the
    * sorted event list (what w4_sessionize / the DuckDB oracle do).
    */
  private def batchSessions(gapUs: Long, events: Seq[Event]): Seq[(Long, Long, Long, Double)] = {
    val sorted = events.sortBy(e => (Sessionize.micros(e.ts), e.value))
    val out = ArrayBuffer.empty[(Long, Long, Long, Double)]
    var cur: Option[(Long, Long, Long, Double)] = None
    sorted.foreach { e =>
      val t = Sessionize.micros(e.ts)
      cur match {
        case Some((s, last, n, tot)) if t - last <= gapUs =>
          cur = Some((s, t, n + 1, tot + e.value))
        case Some(closed) =>
          out += closed
          cur = Some((t, t, 1L, e.value))
        case None =>
          cur = Some((t, t, 1L, e.value))
      }
    }
    cur.foreach(out += _)
    out.toSeq
  }

  /** Incremental: fold each batch (sorted, as the stream's step does)
    * with carried open-session state; close the final state.
    */
  private def incrementalSessions(gapUs: Long,
      batches: Seq[Seq[Event]]): Seq[(Long, Long, Long, Double)] = {
    val out = ArrayBuffer.empty[Session]
    var cur: Option[SessionState] = None
    batches.foreach { b =>
      cur = Sessionize.foldBatch(gapUs, 1L,
        b.sortBy(e => (Sessionize.micros(e.ts), e.value)), cur, out)
    }
    cur.foreach(s => out += Sessionize.toSession(1L, s))
    out.toSeq
      .map(s => (Sessionize.micros(s.session_start),
        Sessionize.micros(s.session_end), s.n_events, s.total_value))
      .sortBy(x => (x._1, x._2))
  }

  // small time domain so gap boundaries, ties, and splits mid-session
  // all occur frequently; values index-derived so double sums add in
  // the same order on both sides (bitwise-comparable totals)
  private val caseGen: Gen[(Long, Seq[Long], Seq[Int])] = for {
    gap <- Gen.choose(1L, 8L)
    times <- Gen.nonEmptyListOf(Gen.choose(0L, 60L))
    nSplits <- Gen.choose(0, 4)
    splits <- Gen.listOfN(nSplits, Gen.choose(0, 61))
  } yield (gap, times, splits)

  test("property: time-partitioned incremental fold == batch sessionization") {
    check(Prop.forAll(caseGen) { case (gap, times, splits) =>
      val events = times.sorted.zipWithIndex.map { case (t, i) => ev(t, (i % 7) + 1.0) }
      // contiguous time split: cut points partition the sorted list
      val cuts = splits.map(_.toLong).sorted
      val batches = (Seq(Long.MinValue) ++ cuts :+ Long.MaxValue)
        .sliding(2).map { case Seq(lo, hi) =>
          events.filter(e => Sessionize.micros(e.ts) > lo && Sessionize.micros(e.ts) <= hi)
        }.toSeq.filter(_.nonEmpty)
      val inc = incrementalSessions(gap, batches)
      val ref = batchSessions(gap, events).sortBy(x => (x._1, x._2))
      val ok = inc == ref
      if (!ok) println(s"gap=$gap times=$times cuts=$cuts\n inc=$inc\n ref=$ref")
      ok
    })
  }

  test("property: a single batch with ANY internal order folds like batch semantics") {
    // foldBatch sorts internally via the caller; here events of one
    // batch arrive in one go, so stale/bridge paths never fire and the
    // result must equal the reference exactly
    check(Prop.forAll(Gen.choose(1L, 8L), Gen.nonEmptyListOf(Gen.choose(0L, 40L))) {
      (gap, times) =>
        val events = times.zipWithIndex.map { case (t, i) => ev(t, (i % 5) + 1.0) }
        // both sides sort by (ts, value): identical fold order even
        // though the raw arrival order here is random
        incrementalSessions(gap, Seq(events)) ==
          batchSessions(gap, events).sortBy(x => (x._1, x._2))
    })
  }

  test("property: micros/toTimestamp roundtrip is exact") {
    check(Prop.forAll(Gen.choose(0L, 4102444800000000L)) { us =>
      Sessionize.micros(Sessionize.toTimestamp(us)) == us
    })
  }

  test("property: ascending stale runs SPLIT ACROSS batches merge as batch semantics") {
    // an anchor far in the future opens the session in batch 1; late
    // events (all more than a gap before it) arrive ascending, split
    // across arbitrary contiguous batches — the carried stale
    // accumulator (DuoState semantics) must reproduce the batch
    // sessionization of the late events, plus the anchor session
    check(Prop.forAll(caseGen) { case (gap, times, splits) =>
      val anchorT = 1000L // > 60 + 8: never reachable from the late run
      val late = times.sorted.zipWithIndex.map { case (t, i) => ev(t, (i % 7) + 1.0) }
      val cuts = splits.map(_.toLong).sorted
      val lateBatches = (Seq(Long.MinValue) ++ cuts :+ Long.MaxValue)
        .sliding(2).map { case Seq(lo, hi) =>
          late.filter(e => Sessionize.micros(e.ts) > lo && Sessionize.micros(e.ts) <= hi)
        }.toSeq.filter(_.nonEmpty)
      val out = ArrayBuffer.empty[Session]
      var cur: Option[SessionState] = Some(SessionState(anchorT, anchorT, 1, 0.0))
      var stale: Option[SessionState] = None
      lateBatches.foreach { b =>
        val (c, st) = Sessionize.foldBatchCarry(gap, 1L, b, cur, stale, out)
        cur = c; stale = st
      }
      // drain: flush the carried stale run, then the anchor session
      stale.foreach(st => out += Sessionize.toSession(1L, st))
      cur.foreach(c => out += Sessionize.toSession(1L, c))
      val got = out.map(s => (Sessionize.micros(s.session_start),
        Sessionize.micros(s.session_end), s.n_events, s.total_value))
        .sortBy(x => (x._1, x._2))
      val ref = (batchSessions(gap, late) :+ ((anchorT, anchorT, 1L, 0.0)))
        .sortBy(x => (x._1, x._2))
      val ok = got == ref
      if (!ok) println(s"gap=$gap late=$times cuts=$cuts\n got=$got\n ref=$ref")
      ok
    })
  }

  test("property: stale events within a batch merge/close exactly as batch semantics") {
    // open state far in the future; every batch event is stale relative
    // to it — the stale accumulator alone must reproduce the batch
    // sessionization of those events (the r8 singleton-splitting bug)
    check(Prop.forAll(Gen.choose(1L, 8L), Gen.nonEmptyListOf(Gen.choose(0L, 40L))) {
      (gap, times) =>
        val events = times.sorted.zipWithIndex.map { case (t, i) => ev(t, (i % 5) + 1.0) }
        val out = ArrayBuffer.empty[Session]
        val far = 1000L // > 40 + 8: never merges
        val cur = Sessionize.foldBatch(gap, 1L, events,
          Some(SessionState(far, far, 1, 0.0)), out)
        val got = out.map(s => (Sessionize.micros(s.session_start),
          Sessionize.micros(s.session_end), s.n_events, s.total_value))
          .sortBy(x => (x._1, x._2))
        val ref = batchSessions(gap, events).sortBy(x => (x._1, x._2))
        got == ref && cur.contains(SessionState(far, far, 1, 0.0))
    })
  }
}
