package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.DedupOps

/** Streaming NEAR-duplicate detection — the continuous twin of the
  * batch [[graft.operators.DedupOps.simHashPairs]]: documents arrive
  * as a stream, each new document is checked against the recent
  * corpus and a `(id_a, id_b, hamming)` pair row is emitted the
  * moment its near-duplicate lands.
  *
  * Design (the only shape whose state survives 100 TB/day):
  *  - per doc: one codegen'd SimHash64 signature, exploded into 4
  *    pigeonhole bands of 16 bits (Hamming ≤ 3 ⇒ at least one band
  *    matches exactly — same guarantee as the batch op);
  *  - state is keyed by `(band, band_val)` BUCKET, not by doc: a new
  *    doc only ever compares against members of its own 4 buckets —
  *    the streaming analogue of the banded self-join, candidates
  *    O(bucket occupancy), never O(corpus);
  *  - each bucket holds `(doc_id, sig, ts)` members inside the
  *    watermark horizon (24 B/member); members behind the watermark
  *    are evicted on access, and idle buckets are reaped by
  *    event-time timeout — state is proportional to the horizon's
  *    traffic, not to history;
  *  - a pair colliding in several bands is emitted once per matching
  *    band (all in the SAME micro-batch, when the newer doc arrives):
  *    at-least-once per pair. Compact to exactly-once downstream with
  *    a per-batch `dropDuplicates("id_a","id_b")` in `foreachBatch` —
  *    cheap because emissions are batch-local.
  *
  * Cross-run novelty against the full historical corpus remains the
  * batch job ([[graft.operators.DedupOps.incrementalNgramPairs]]);
  * the stream covers the re-delivery/burst horizon, exactly like
  * [[CurationStream.novelDocs]] for exact duplicates.
  */
object NearDupStream {

  case class BandRow(bucket: Long, doc_id: Long, sig: Long, ts: Timestamp)
  case class BucketState(members: List[(Long, Long, Long)]) // (doc_id, sig, tsMs)
  case class Pair(id_a: Long, id_b: Long, hamming: Int, ts: Timestamp)

  implicit private val rowEnc: Encoder[BandRow] = Encoders.product[BandRow]
  implicit private val stEnc: Encoder[BucketState] = Encoders.product[BucketState]
  implicit private val pairEnc: Encoder[Pair] = Encoders.product[Pair]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  private val IdleSlackMs = 60000L

  private def step(maxHamming: Int)(
      bucket: Long, rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[Pair] = {
    val wm = state.getCurrentWatermarkMs()
    if (state.hasTimedOut) {
      val live = state.getOption.map(_.members.filter(_._3 >= wm)).getOrElse(Nil)
      if (live.isEmpty) state.remove()
      else {
        state.update(BucketState(live))
        state.setTimeoutTimestamp(math.max(live.map(_._3).max, wm) + IdleSlackMs)
      }
      return Iterator.empty
    }
    var members = state.getOption.map(_.members.filter(_._3 >= wm)).getOrElse(Nil)
    val out = ArrayBuffer.empty[Pair]
    // deterministic arrival order within the micro-batch
    rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
      members.foreach { case (id, sig, _) =>
        if (id != r.doc_id) {
          val h = java.lang.Long.bitCount(sig ^ r.sig)
          if (h <= maxHamming)
            out += Pair(math.min(id, r.doc_id), math.max(id, r.doc_id), h, r.ts)
        }
      }
      members = (r.doc_id, r.sig, r.ts.getTime) :: members
    }
    state.update(BucketState(members))
    state.setTimeoutTimestamp(math.max(members.map(_._3).max, wm) + IdleSlackMs)
    out.iterator
  }

  /** Near-dup pair stream over `(idCol, textCol, tsCol)` documents.
    * `delay` is the event-time watermark (the re-delivery horizon a
    * member stays comparable for); `maxHamming` the SimHash radius.
    */
  def nearDupPairs(stream: DataFrame, idCol: String, textCol: String,
                   tsCol: String, delay: String,
                   maxHamming: Int = 3): Dataset[Pair] = {
    require(maxHamming <= 3, "4x16 pigeonhole bands guarantee recall only to Hamming 3")
    // the state row carries the id as a non-nullable long: a non-numeric
    // id column would cast to null and kill the query with an encoder
    // NPE on the first micro-batch — reject it at build time instead
    require(Seq("bigint", "int", "smallint", "tinyint")
      .contains(stream.schema(idCol).dataType.simpleString),
      s"nearDupPairs: $idCol must be an integral id column " +
        s"(got ${stream.schema(idCol).dataType.simpleString}); hash or " +
        "dense-rank non-numeric ids first")
    val sigs = stream
      .withColumn("__sig", DedupOps.simHash(col(textCol)))
      .withWatermark(tsCol, delay)
    val bandArr = array((0 until 4).map(b =>
      shiftright(col("__sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val banded = sigs
      .select(col(idCol).cast("long").as("doc_id"), col("__sig").as("sig"),
        col(tsCol).as("ts"), posexplode(bandArr))
      // bucket = band index (2 bits) ++ 16 band bits — one long key
      .select((col("pos").cast("long") * 65536L + col("col")).as("bucket"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandRow]
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(maxHamming))
  }
}
