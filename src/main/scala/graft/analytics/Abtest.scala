package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Experimentation analytics — CUPED (Controlled-experiment Using
  * Pre-Experiment Data, Deng et al., WSDM 2013), the variance-reduction
  * adjustment every large experimentation platform applies before
  * reading an A/B test: regress each user's in-experiment metric on
  * their PRE-experiment metric and difference arms on the residual,
  *
  *   cuped_effect = raw_effect − θ·(mean_pre_T − mean_pre_C),
  *   θ = Cov(pre, post) / Var(pre)   (pooled),
  *
  * which shrinks the estimator's variance by the squared correlation ρ²
  * while leaving it unbiased (assignment is independent of pre-period
  * behavior). Run here as an A/A split — a deterministic md5 bucket of
  * user_id (the x17 split mechanism), with the corpus midpoint date
  * separating pre from post — so the raw effect is pure noise and the
  * reported ρ² IS the measured variance reduction the adjustment buys.
  *
  * Oracle-exactness: per-user period sums are exact integer pennies;
  * the pooled moments Σx², Σxy, Σy² are DECIMAL(18,0)×DECIMAL(18,0)
  * products (the x95 wide-product pattern — DuckDB rejects wider forms);
  * θ, ρ² and the effects are then the x78 discipline — exact sums cast
  * ONCE to double, identical scalar IEEE expression trees both engines,
  * zero-variance guarded to NULL.
  *
  * Scale shape (100 TB): one 1-row bounds scalar broadcast into the
  * scan, ONE user-keyed hash agg (the per-user period sums — map-side
  * combined), then a single all-to-one agg of 10 exact moments (constant
  * state). No window, no join, no second pass over the events.
  */
object Abtest {

  /** md5 buckets assigned to the treatment arm (8/16 = 50/50 split). */
  private val TreatBuckets = Seq("0", "1", "2", "3", "4", "5", "6", "7")

  /** x138: CUPED-adjusted A/B readout over an A/A md5 split of users —
    * per-arm counts and exact penny sums, pooled θ, raw and CUPED
    * effects, and ρ² (the variance reduction achieved). */
  val cupedAb = Q.withOracle(
    "x138_cuped_ab",
    "x138: CUPED-adjusted A/B effect on an A/A md5 user split (pre = first half of the corpus calendar)",
    s"""WITH bounds AS (
       |  SELECT MIN(CAST(ts AS DATE)) AS lo,
       |    MAX(CAST(ts AS DATE)) AS hi FROM events),
       |mid AS (
       |  SELECT lo + CAST(date_diff('day', lo, hi) // 2 AS INTEGER) AS md
       |  FROM bounds),
       |u AS (
       |  SELECT user_id,
       |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
       |      IN (${TreatBuckets.map(b => s"'$b'").mkString(", ")})
       |      THEN 1 ELSE 0 END AS t,
       |    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) <= md
       |      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END), 0)
       |      AS BIGINT) AS pre,
       |    CAST(COALESCE(SUM(CASE WHEN CAST(ts AS DATE) > md
       |      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END), 0)
       |      AS BIGINT) AS post
       |  FROM events CROSS JOIN mid GROUP BY 1, 2),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(t) AS BIGINT) AS n_treat,
       |    CAST(SUM(1 - t) AS BIGINT) AS n_ctrl,
       |    CAST(SUM(CASE WHEN t = 1 THEN pre ELSE 0 END) AS BIGINT) AS pre_treat,
       |    CAST(SUM(CASE WHEN t = 0 THEN pre ELSE 0 END) AS BIGINT) AS pre_ctrl,
       |    CAST(SUM(CASE WHEN t = 1 THEN post ELSE 0 END) AS BIGINT) AS post_treat,
       |    CAST(SUM(CASE WHEN t = 0 THEN post ELSE 0 END) AS BIGINT) AS post_ctrl,
       |    CAST(SUM(pre) AS DOUBLE) AS sx, CAST(SUM(post) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(pre AS DECIMAL(18,0)) * CAST(pre AS DECIMAL(18,0)))
       |      AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(pre AS DECIMAL(18,0)) * CAST(post AS DECIMAL(18,0)))
       |      AS DOUBLE) AS sxy,
       |    CAST(SUM(CAST(post AS DECIMAL(18,0)) * CAST(post AS DECIMAL(18,0)))
       |      AS DOUBLE) AS syy
       |  FROM u)
       |SELECT n_treat, n_ctrl, pre_treat, pre_ctrl, post_treat, post_ctrl,
       |  CASE WHEN n * sxx - sx * sx <> 0.0
       |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS theta,
       |  CASE WHEN n_treat > 0 AND n_ctrl > 0
       |    THEN CAST(post_treat AS DOUBLE) / n_treat
       |       - CAST(post_ctrl AS DOUBLE) / n_ctrl END AS raw_effect,
       |  CASE WHEN n * sxx - sx * sx <> 0.0 AND n_treat > 0 AND n_ctrl > 0
       |    THEN (CAST(post_treat AS DOUBLE) / n_treat
       |        - CAST(post_ctrl AS DOUBLE) / n_ctrl)
       |      - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
       |        * (CAST(pre_treat AS DOUBLE) / n_treat
       |         - CAST(pre_ctrl AS DOUBLE) / n_ctrl) END AS cuped_effect,
       |  CASE WHEN n * sxx - sx * sx <> 0.0 AND n * syy - sy * sy <> 0.0
       |    THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
       |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS rho2
       |FROM m""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val bounds = ev.agg(min(to_date(col("ts"))).as("lo"),
      max(to_date(col("ts"))).as("hi"))
    val mid = bounds.select(expr("date_add(lo, CAST(datediff(hi, lo) DIV 2 AS INT))").as("md"))
    val pennies = (col("value").cast("decimal(12,2)") * 100).cast("long")
    val u = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"),
        when(substring(md5(col("user_id").cast("string")), 1, 1)
          .isin(TreatBuckets: _*), 1L).otherwise(0L).as("t"))
      .agg(coalesce(sum(when(to_date(col("ts")) <= col("md"), pennies)), lit(0L))
          .cast("long").as("pre"),
        coalesce(sum(when(to_date(col("ts")) > col("md"), pennies)), lit(0L))
          .cast("long").as("post"))
    val m = u.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("t")).cast("long").as("n_treat"),
      sum(lit(1L) - col("t")).cast("long").as("n_ctrl"),
      sum(when(col("t") === 1, col("pre")).otherwise(0L)).cast("long").as("pre_treat"),
      sum(when(col("t") === 0, col("pre")).otherwise(0L)).cast("long").as("pre_ctrl"),
      sum(when(col("t") === 1, col("post")).otherwise(0L)).cast("long").as("post_treat"),
      sum(when(col("t") === 0, col("post")).otherwise(0L)).cast("long").as("post_ctrl"),
      sum(col("pre")).cast("double").as("sx"),
      sum(col("post")).cast("double").as("sy"),
      sum(col("pre").cast("decimal(18,0)") * col("pre").cast("decimal(18,0)"))
        .cast("double").as("sxx"),
      sum(col("pre").cast("decimal(18,0)") * col("post").cast("decimal(18,0)"))
        .cast("double").as("sxy"),
      sum(col("post").cast("decimal(18,0)") * col("post").cast("decimal(18,0)"))
        .cast("double").as("syy"))
    val den   = col("n") * col("sxx") - col("sx") * col("sx")
    val num   = col("n") * col("sxy") - col("sx") * col("sy")
    val denY  = col("n") * col("syy") - col("sy") * col("sy")
    val armsOk = col("n_treat") > 0 && col("n_ctrl") > 0
    val raw = col("post_treat").cast("double") / col("n_treat") -
      col("post_ctrl").cast("double") / col("n_ctrl")
    val preDiff = col("pre_treat").cast("double") / col("n_treat") -
      col("pre_ctrl").cast("double") / col("n_ctrl")
    m.select(col("n_treat"), col("n_ctrl"),
      col("pre_treat"), col("pre_ctrl"), col("post_treat"), col("post_ctrl"),
      when(den =!= 0.0, num / den).as("theta"),
      when(armsOk, raw).as("raw_effect"),
      when(den =!= 0.0 && armsOk, raw - (num / den) * preDiff).as("cuped_effect"),
      when(den =!= 0.0 && denY =!= 0.0, (num * num) / (den * denY)).as("rho2"))
  }

  val all: Seq[Q] = Seq(cupedAb)
}
