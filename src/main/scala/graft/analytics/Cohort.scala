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

  /** x168: cohort LTV curve — x58's revenue companion and the other
    * half of every growth dashboard: for each acquisition cohort
    * (a customer's FIRST order month) and months-since-acquisition age,
    * the cumulative revenue per acquired customer ("how much has the
    * 1995-03 cohort earned us per head by month 6?"). Month index is
    * pure integer arithmetic (year·12 + month − 1) — no truncation
    * semantics to align — sums are exact pennies, the cumulative scan
    * is a cohort-partitioned integer window on the bounded
    * (cohort × age) grid, and LTV is one final division by the cohort
    * head-count.
    *
    * Scale shape: one customer-keyed min (first month), one
    * (customer, month) penny agg, one join UP to the bounded grid —
    * 100 TB of orders → |customers| rows → |months|² rows; the window
    * never sees order grain. */
  val cohortLtv = Q.withOracle(
    "x168_cohort_ltv",
    "x168: monthly cohort LTV curve (cumulative pennies per acquired customer)",
    """WITH om AS MATERIALIZED (
      |  SELECT o_custkey AS c,
      |    EXTRACT(year FROM o_orderdate) * 12
      |      + EXTRACT(month FROM o_orderdate) - 1 AS m,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS p
      |  FROM orders GROUP BY 1, 2),
      |fc AS MATERIALIZED (
      |  SELECT c, CAST(MIN(m) AS BIGINT) AS cohort FROM om GROUP BY 1),
      |sz AS MATERIALIZED (
      |  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n0 FROM fc GROUP BY 1),
      |grid AS MATERIALIZED (
      |  SELECT fc.cohort, CAST(om.m - fc.cohort AS BIGINT) AS age,
      |    CAST(SUM(om.p) AS BIGINT) AS rev,
      |    CAST(COUNT(DISTINCT om.c) AS BIGINT) AS n_active
      |  FROM om JOIN fc ON fc.c = om.c GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort, age, rev, n_active,
      |    CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age) AS BIGINT)
      |      AS cum_rev
      |  FROM grid)
      |SELECT cum.cohort, cum.age, cum.rev, cum.n_active, cum.cum_rev,
      |  sz.n0 AS cohort_size,
      |  CAST(cum.cum_rev AS DOUBLE) / sz.n0 AS ltv_pennies
      |FROM cum JOIN sz ON sz.cohort = cum.cohort
      |ORDER BY cum.cohort, cum.age""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val om = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("c"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long")
        .as("p"))
    val fc = om.groupBy(col("c")).agg(min(col("m")).cast("long").as("cohort"))
    val sz = fc.groupBy(col("cohort")).agg(count(lit(1)).cast("long").as("n0"))
    val grid = om.join(fc, "c")
      .groupBy(col("cohort"), (col("m") - col("cohort")).cast("long").as("age"))
      .agg(sum(col("p")).cast("long").as("rev"),
        countDistinct(col("c")).cast("long").as("n_active"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
    grid.withColumn("cum_rev", sum(col("rev")).over(w).cast("long"))
      .join(broadcast(sz), "cohort")
      .select(col("cohort"), col("age"), col("rev"), col("n_active"),
        col("cum_rev"), col("n0").as("cohort_size"),
        (col("cum_rev").cast("double") / col("n0")).as("ltv_pennies"))
      .orderBy(col("cohort"), col("age"))
  }

  val all: Seq[Q] = Seq(retention, cohortLtv)
}
