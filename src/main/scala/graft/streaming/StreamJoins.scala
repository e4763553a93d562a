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
                      watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = causes.selectExpr("user_id AS c_user", "ts AS c_ts", "value AS c_value")
      .withWatermark("c_ts", watermarkDelay)
    val e = effects.selectExpr("user_id AS e_user", "ts AS e_ts", "value AS e_value")
      .withWatermark("e_ts", watermarkDelay)
    c.join(e,
      col("c_user") === col("e_user") &&
        col("c_ts") <= col("e_ts") &&
        col("c_ts") >= col("e_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("c_user").as("user_id"), col("c_ts"), col("e_ts"),
        col("c_value"), col("e_value"))
  }
}
