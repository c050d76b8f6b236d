package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Survival analysis — the Kaplan–Meier estimator, run as time-to-event.
  *
  * "What fraction of users go t days before their first error?" is a
  * censored-duration question: a user who never errored is NOT evidence
  * of zero failures — we just stopped observing them — and counting them
  * either way biases the curve. Kaplan–Meier (1958) handles it exactly:
  * multiply per-time-step conditional survival (n_t − d_t)/n_t over the
  * observed event times, with censored users (no error before their last
  * observed event) leaving the risk set without contributing a death.
  *
  * Reference anchor: the reference's weekly report tracks week-over-week
  * facility participation (weekly-report.py:269-403); K–M is the
  * censoring-correct form of that attrition/failure question.
  *
  * Exactness across engines: the estimator is a SEQUENTIAL product, and
  * float products are order-fragile — so survival is carried as a
  * scaled-integer fold, S_k = (S_{k−1}·(n_k − d_k)) div n_k starting at
  * 10^9, every step exact integer arithmetic with truncating division
  * (`div`/`//` agree on nonnegatives). The reported double is one final
  * division of two exact integers — correctly rounded identically in
  * both engines. The DuckDB oracle replays the chain as a WITH RECURSIVE
  * walk over the row-numbered axis (list_reduce is evaluation-order-
  * unsafe — see the x83 note in analytics/Anomaly.scala). Headroom:
  * S·n < 2^63 needs n < 9.2e9 users — beyond any population.
  *
  * Scale shape (100 TB): the only full-data pass is the per-user
  * first/last hash agg (user-keyed, map-side combined). Everything after
  * runs on the lifetime AXIS — bounded by the observation calendar
  * (≤ |days| rows), not by data size — so the window, the collect_list,
  * and the O(|axis|²) prefix folds are constant-cost at any input scale.
  * The fold itself runs executor-side via the `aggregate` higher-order
  * function over the collected axis array: no driver collect, no UDF,
  * whole-stage-codegen'd.
  */
object Survival {

  /** The terminal event whose first occurrence per user is a "death";
    * users with none are censored at their last observed event. */
  private val FailEvent = "error"

  /** Survival fixed-point scale: 10^9 (resolution 1e-9). */
  private val Scale = 1000000000L

  /** x136: Kaplan–Meier survival of days-to-first-$FailEvent per user
    * (clock starts at the user's first event of any type); users who
    * never hit one are right-censored at their last observed event. */
  val kmSurvival = Q.withOracle(
    "x136_km_survival",
    s"x136: Kaplan-Meier days-to-first-$FailEvent survival curve (right-censored, 1e-9 fixed point)",
    s"""WITH RECURSIVE per_user AS (
       |  SELECT user_id, MIN(CAST(ts AS DATE)) AS fd, MAX(CAST(ts AS DATE)) AS ld,
       |    MIN(CASE WHEN event_type = '$FailEvent' THEN CAST(ts AS DATE) END) AS fe
       |  FROM events GROUP BY 1),
       |lab AS (
       |  SELECT date_diff('day', fd, COALESCE(fe, ld)) AS t,
       |    CASE WHEN fe IS NULL THEN 1 ELSE 0 END AS cens
       |  FROM per_user),
       |axis AS MATERIALIZED (
       |  SELECT t, CAST(SUM(1 - cens) AS BIGINT) AS deaths,
       |    CAST(SUM(cens) AS BIGINT) AS censored,
       |    CAST(COUNT(*) AS BIGINT) AS cnt,
       |    CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS k
       |  FROM lab GROUP BY t),
       |ax2 AS MATERIALIZED (
       |  SELECT t, deaths, censored, k,
       |    CAST(SUM(cnt) OVER (ORDER BY t DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
       |  FROM axis),
       |km AS (
       |  SELECT k, t, n_risk, deaths, censored,
       |    (CAST($Scale AS BIGINT) * (n_risk - deaths)) // n_risk AS s
       |  FROM ax2 WHERE k = 1
       |  UNION ALL
       |  SELECT a.k, a.t, a.n_risk, a.deaths, a.censored,
       |    (km.s * (a.n_risk - a.deaths)) // a.n_risk
       |  FROM km JOIN ax2 a ON a.k = km.k + 1)
       |SELECT CAST(t AS BIGINT) AS t_days, n_risk, deaths, censored,
       |  CAST(s AS BIGINT) AS surv_scaled,
       |  CAST(s AS DOUBLE) / $Scale AS survival
       |FROM km ORDER BY t_days""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"),
        min(when(col("event_type") === FailEvent, to_date(col("ts")))).as("fe"))
    val lab = perUser
      .select(datediff(coalesce(col("fe"), col("ld")), col("fd")).cast("long")
          .as("t"),
        when(col("fe").isNull, 1L).otherwise(0L).as("cens"))
    val axis = lab.groupBy(col("t"))
      .agg(sum(lit(1L) - col("cens")).cast("long").as("deaths"),
        sum(col("cens")).cast("long").as("censored"),
        count(lit(1)).as("cnt"))
    // the risk-set window and the fold both run on the calendar-bounded
    // axis (≤ |days| rows) — the unpartitioned window is deliberate
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ax2 = axis
      .withColumn("n_risk", sum(col("cnt")).over(wDesc).cast("long"))
      .select(col("t"), col("n_risk"), col("deaths"), col("censored"))
    ax2.agg(sort_array(collect_list(struct(
        col("t"), col("n_risk"), col("deaths"), col("censored")))).as("ax"))
      .select(explode(expr(
        s"""transform(ax, (x, i) -> named_struct(
           |  't_days', x.t, 'n_risk', x.n_risk, 'deaths', x.deaths,
           |  'censored', x.censored,
           |  'surv_scaled', aggregate(slice(ax, 1, i + 1),
           |    CAST($Scale AS BIGINT),
           |    (s, y) -> (s * (y.n_risk - y.deaths)) div y.n_risk)))"""
          .stripMargin)).as("r"))
      .select(col("r.t_days"), col("r.n_risk"), col("r.deaths"),
        col("r.censored"), col("r.surv_scaled"),
        (col("r.surv_scaled").cast("double") / Scale).as("survival"))
      .orderBy(col("t_days"))
  }

  val all: Seq[Q] = Seq(kmSurvival)
}
