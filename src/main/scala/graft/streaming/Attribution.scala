package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the continuous form of x15's
  * attribution: purchases joined to the views that preceded them within
  * one hour, as both streams arrive.
  *
  * Scale/state model: an unbounded stream-stream join would buffer both
  * sides forever; the two watermarks plus the time-range predicate give
  * Spark an eviction rule — a buffered view can be dropped once the
  * purchase watermark passes (view time + 1 hour), so state holds only
  * the last ~hour of each stream per key, independent of total history.
  * The view watermark is the looser one (2h) so late views still match
  * purchases that are within their own 1h lateness bound. */
object Attribution {

  val JoinWindow = "1 hour"

  def attribution(feed: DataFrame): DataFrame = {
    val purchases = feed.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = feed.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
      expr(s"p_user = v_user AND v_ts BETWEEN p_ts - INTERVAL $JoinWindow AND p_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("p_ts"),
        col("view_id"), col("v_ts"))
  }
}
