package graft.streaming

import graft.analytics.Trend
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** x139's Holt linear-trend smoother as CONTINUOUS ingestion — the
  * forecasting family's incremental member (the KmvFeed/CmsFeed posture:
  * bounded per-key state, batch cost independent of history).
  *
  * Holt state is the PERFECT streaming statistic: the entire history
  * collapses into (level, trend) — two longs per key — and advancing one
  * day reads nothing but the previous state and the day's count. The
  * recursion is strictly sequential per day, so the feed's contract is
  * DAY-COMPLETE batches (the WeeklyFeed grain discipline): a batch may
  * carry any number of NEW complete days for any mix of keys; days at or
  * before a key's high-water `last_day` are IGNORED (replays and late
  * partial days cannot corrupt the state — re-applying an old batch is a
  * no-op, spec-pinned). The contract is also OBSERVABLE, not just
  * documented: every ignored (event_type, day) row increments the
  * state's cumulative `n_ignored` counter, so a late-arriving correction
  * to an already-folded day — which the fold must absorb as a no-op —
  * leaves a visible signal instead of silently diverging from the batch
  * oracle. A monitoring layer alerts on `n_ignored` growth under
  * exactly-once delivery (replays legitimately inflate it; divergence
  * without replays means the day-complete contract was violated). Fresh keys seed exactly as x139 does (l₁ = y₁·S,
  * b₁ = 0), and folding the same days in any batch split reproduces the
  * batch query's state bit-for-bit because each step is the identical
  * scaled-integer update ([[Trend.holtForecast]]'s α = β = 1/2 dyadic
  * arithmetic — exact, no float path).
  *
  * Scale shape: per batch, one hash agg of the batch to the daily grain,
  * one key-keyed join against the |keys|-row store, and a per-key fold
  * over that key's NEW days only — state is 5 small columns per key
  * FOREVER, never the event history.
  */
object HoltFeed {

  private val S = Trend.HoltScale

  private val step =
    s"""(acc, x) -> named_struct(
       |  'l', (x.y * $S + acc.l + acc.b) div 2,
       |  'b', (((x.y * $S + acc.l + acc.b) div 2) - acc.l + acc.b) div 2)"""
      .stripMargin

  /** Merge one micro-batch of events into a
    * (event_type, last_day, l, b, n_days, n_ignored) state table.
    *
    * State-schema migration: `n_ignored` was added after the first
    * shipped state layout, so a state table persisted by the 5-column
    * version is upgraded on read (counter seeded at 0 — ignored days
    * before the upgrade were never counted and cannot be recovered)
    * instead of failing analysis on the first post-upgrade batch. */
  def applyBatch(store0: DataFrame, batch: DataFrame): DataFrame = {
    val store = if (store0.columns.contains("n_ignored")) store0
                else store0.withColumn("n_ignored", lit(0L))
    val daily = batch
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    daily.join(store, Seq("event_type"), "full_outer")
      .groupBy(col("event_type"))
      .agg(
        // only days past the key's high-water fold; null `when` arms are
        // skipped by collect_list, so store-only rows contribute nothing
        sort_array(collect_list(when(
          col("last_day").isNull || col("day") > col("last_day"),
          struct(col("day"), col("y"))))).as("ax"),
        // days the high-water guard dropped THIS batch (contract
        // observability — null-comparison arms fall to the 0 branch)
        sum(when(col("day").isNotNull && col("day") <= col("last_day"), 1L)
          .otherwise(0L)).as("ign"),
        first(col("l"), ignoreNulls = true).as("l0"),
        first(col("b"), ignoreNulls = true).as("b0"),
        first(col("last_day"), ignoreNulls = true).as("ld0"),
        first(col("n_days"), ignoreNulls = true).as("nd0"),
        first(col("n_ignored"), ignoreNulls = true).as("ni0"))
      .select(col("event_type"),
        expr("""CASE WHEN size(ax) = 0 THEN ld0
               |ELSE element_at(ax, -1).day END""".stripMargin).as("last_day"),
        expr(
          s"""CASE
             |  WHEN size(ax) = 0 THEN named_struct('l', l0, 'b', b0)
             |  WHEN l0 IS NULL THEN aggregate(
             |    slice(ax, 2, CAST(size(ax) - 1 AS INT)),
             |    named_struct('l', element_at(ax, 1).y * CAST($S AS BIGINT),
             |                 'b', CAST(0 AS BIGINT)),
             |    $step)
             |  ELSE aggregate(ax, named_struct('l', l0, 'b', b0), $step)
             |END""".stripMargin).as("st"),
        (coalesce(col("nd0"), lit(0L)) + size(col("ax"))).cast("long")
          .as("n_days"),
        (coalesce(col("ni0"), lit(0L)) + col("ign")).cast("long")
          .as("n_ignored"))
      .select(col("event_type"), col("last_day"),
        col("st.l").as("l"), col("st.b").as("b"), col("n_days"),
        col("n_ignored"))
  }

  /** The forecast view over a state table — column-identical to
    * [[Trend.holtForecast]]'s output so incremental == batch is a direct
    * frame comparison. */
  def forecasts(store: DataFrame): DataFrame =
    store.select(col("event_type"), col("n_days"),
      col("l").as("level_scaled"), col("b").as("trend_scaled"),
      (col("l") + col("b") * Trend.HoltHorizon).as("forecast_scaled"),
      (col("l").cast("double") / S).as("level"),
      (col("b").cast("double") / S).as("trend"),
      ((col("l") + col("b") * Trend.HoltHorizon).cast("double") / S)
        .as("forecast"))
}
