package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream joins (SURVEY.md §2.8 extension; batch twin is the
  * oracle-checked `e10_temporal_self_join`).
  *
  * A time-interval stream-stream join needs three things to be runnable
  * unbounded: watermarks on BOTH inputs, an equi-key (the shuffle key), and
  * a two-sided event-time range predicate. Spark derives the join-state
  * retention from watermark + range — each side's buffered rows are evicted
  * once they can no longer match any future row, so state is bounded at
  * 100 TB/day rates. Without the range bound the state would grow forever.
  */
object StreamJoins {

  /** Each purchase matched to the same user's clicks in the `lookback`
    * interval before it. Inner interval join; columns expected:
    * purchases(user_id, p_ts, ...), clicks(c_uid, c_ts, ...).
    */
  def clicksBeforePurchase(
      purchases: DataFrame,
      clicks: DataFrame,
      lookback: String = "1 HOUR",
      watermark: String = "10 minutes"
  ): DataFrame = {
    val p = purchases.withWatermark("p_ts", watermark)
    val c = clicks.withWatermark("c_ts", watermark)
    p.join(
      c,
      expr(s"user_id = c_uid AND c_ts > p_ts - INTERVAL $lookback AND c_ts < p_ts")
    )
  }
}
