package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state — the attribution
  * pattern: each conversion event joins the same user's candidate
  * events within a preceding time window. Both sides are watermarked,
  * and the time-range condition lets Spark evict join state once the
  * watermark passes the window — state stays proportional to the
  * window, not the stream (the stream-stream analog of the batch
  * as-of join).
  */
object StreamJoins {

  /** Inner attribution join: (cause, effect) pairs where the cause
    * event of the same user happened in [effect.ts - window, effect.ts].
    *
    * @param causes  streaming df: user_id, ts, value (+...)
    * @param effects streaming df: user_id, ts, value (+...)
    */
  def attributionJoin(causes: DataFrame, effects: DataFrame,
                      windowMinutes: Int,
                      watermarkDelay: String = "10 minutes"): DataFrame =
    attribution(causes, effects, windowMinutes, watermarkDelay, "inner")

  private def attribution(causes: DataFrame, effects: DataFrame,
                          windowMinutes: Int, watermarkDelay: String,
                          joinType: String): DataFrame = {
    val c = causes.selectExpr("user_id AS c_user", "ts AS c_ts", "value AS c_value")
      .withWatermark("c_ts", watermarkDelay)
    val e = effects.selectExpr("user_id AS e_user", "ts AS e_ts", "value AS e_value")
      .withWatermark("e_ts", watermarkDelay)
    c.join(e,
      col("c_user") === col("e_user") &&
        col("c_ts") <= col("e_ts") &&
        col("c_ts") >= col("e_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(col("c_user").as("user_id"), col("c_ts"), col("e_ts"),
        col("c_value"), col("e_value"))
  }

  /** LEFT OUTER attribution join: like [[attributionJoin]], but causes
    * that never see an in-window effect are still emitted (effect side
    * null) — the "which clicks converted, which didn't" question asked
    * as one streaming query.
    *
    * Semantics to know: an unmatched cause row can only be emitted once
    * the WATERMARK has passed its join window (before that, a matching
    * effect could still arrive), so outer rows trail the inner ones by
    * the watermark delay + window — correctness over latency, and the
    * reason both sides' watermarks are mandatory here while the inner
    * variant could in principle run without state eviction.
    */
  def attributionJoinLeftOuter(causes: DataFrame, effects: DataFrame,
                               windowMinutes: Int,
                               watermarkDelay: String = "10 minutes"): DataFrame =
    attribution(causes, effects, windowMinutes, watermarkDelay, "left_outer")

  /** Stream-STATIC dimension enrichment — the streaming twin of the
    * batch broadcast lookup join (J1/J2): every micro-batch left-joins
    * the static dimension, unmatched keys keep their rows with null
    * dim columns (facts are never dropped by late dim arrival).
    *
    * Stateless by construction: a stream-static join keeps NO join
    * state across batches (the static side is re-planned per batch),
    * so there is no watermark requirement and no state growth — at
    * scale the only cost is the dim broadcast, exactly as in batch.
    * Duplicate dim keys are collapsed first (keep-any within key),
    * mirroring [[graft.operators.RelationalOps.enrich]]'s no-fan-out
    * guarantee.
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
                       key: String): DataFrame =
    graft.operators.RelationalOps.enrich(stream, dim, key)
}
