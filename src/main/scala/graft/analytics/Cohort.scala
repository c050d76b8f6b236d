package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cohort retention — the product-analytics companion to x57's funnel:
  * bucket every user by the week they FIRST appeared (their cohort) and
  * count, for each later week offset, how many of that cohort were active
  * again. The naive relational form joins the raw event log back to a
  * per-user first-seen table — a second full scan plus an event-grain
  * shuffle join. The scalable form never touches event grain twice: ONE
  * user-keyed aggregation collapses each user to (first week, distinct
  * active-week set) — per-user state is bounded by the CALENDAR (weeks in
  * corpus lifetime, a few thousand at any scale), not by event count — and
  * the tiny exploded (cohort, offset) table aggregates in a second, much
  * smaller shuffle. 100 TB of events → |users| rows → |weeks|² rows.
  *
  * Determinism: the week index is pure integer arithmetic on epoch
  * micros (`us div WeekUs`) — no calendar/timezone truncation semantics
  * to align across engines — and every output is an exact integer count.
  */
object Cohort {

  /** Microseconds per week; week index = epoch_us div WeekUs (epoch is
    * positive for all testdata so floor-vs-truncate cannot diverge). */
  private val WeekUs = 604800000000L

  private val retentionOracle: String =
    s"""WITH act AS MATERIALIZED (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS week
       |  FROM events),
       |coh AS MATERIALIZED (
       |  SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id)
       |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       |  CAST(COUNT(*) AS BIGINT) AS n_users
       |FROM act a JOIN coh c USING (user_id)
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** x58: weekly cohort retention grid — one user-keyed aggregation
    * (collect_set of week indexes, calendar-bounded state), then a
    * (cohort, offset) count over the exploded per-user week sets. */
  val retention = Q.withOracle(
    "x58_cohort_retention",
    "x58: weekly cohort retention (first-seen week x offset user counts)",
    retentionOracle) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div ${WeekUs}L").as("week"))
    ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"),
        collect_set(col("week")).as("weeks"))
      .select(col("cohort_week"), explode(col("weeks")).as("week"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val all: Seq[Q] = Seq(retention)
}
