package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** x67: calendar-spine gap filling — the reporting primitive the
  * reference's weekly pipeline implicitly assumes (a week with no rows
  * must show as ZERO in a weekly report, not silently vanish; cf.
  * weekly-report.py's per-week aggregates, which only ever see weeks
  * that have data). A generated (series, calendar-unit) spine LEFT
  * JOINs the aggregated facts and zero-fills the gaps, so downstream
  * deltas/LAGs (w1) read a dense axis.
  *
  * Week index is Cohort's pure integer epoch arithmetic (`us div
  * week-micros`) — no calendar/timezone truncation semantics to align
  * between engines.
  *
  * Scale shape: the 100 TB side (events) is touched by exactly ONE
  * keyed aggregation; the spine is |types| × |weeks| — calendar-bounded
  * metadata (a 1-row min/max scalar cross-joined into a generated
  * sequence), never data-sized. The gap-fill join runs entirely in the
  * bounded post-aggregate space.
  */
object Spine {

  /** Microseconds per week (shared constant with Cohort's week index). */
  private val WeekUs = 604800000000L

  private def gapfillOracle: String =
    s"""WITH w AS MATERIALIZED (
       |  SELECT event_type, epoch_us(ts) // $WeekUs AS week FROM events),
       |b AS MATERIALIZED (SELECT MIN(week) AS lo, MAX(week) AS hi FROM w),
       |spine AS (
       |  SELECT t.event_type, s.week
       |  FROM (SELECT DISTINCT event_type FROM w) t
       |  CROSS JOIN (SELECT unnest(generate_series(
       |    (SELECT lo FROM b), (SELECT hi FROM b))) AS week) s),
       |c AS (
       |  SELECT event_type, week, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM w GROUP BY event_type, week)
       |SELECT sp.event_type, sp.week, COALESCE(c.n, 0) AS n_events
       |FROM spine sp LEFT JOIN c USING (event_type, week)
       |ORDER BY sp.event_type, sp.week""".stripMargin

  /** x67: dense per-type weekly event counts over a generated calendar
    * spine — absent (type, week) combinations emit an explicit zero. */
  val gapfillWeekly = Q.withOracle(
    "x67_gapfill_weekly",
    "x67: calendar-spine gap-filled weekly counts per event type (zero rows explicit)",
    gapfillOracle) { (s, dir) =>
    val w = Tables.events(s, dir)
      .select(col("event_type"), expr(s"unix_micros(ts) div $WeekUs").as("week"))
    val counts = w.groupBy(col("event_type"), col("week"))
      .agg(count(lit(1)).cast("long").as("n"))
    val bounds = w.agg(min(col("week")).as("lo"), max(col("week")).as("hi"))
    val spine = w.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds)) // 1-row calendar-bounds scalar
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("week"))
    spine.join(counts, Seq("event_type", "week"), "left")
      .select(col("event_type"), col("week"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy(col("event_type"), col("week"))
  }

  val all: Seq[Q] = Seq(gapfillWeekly)
}
