package graft.analytics

import graft.{Q, Tables}
import graft.Parity.week
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retail-style comparative analytics: the per-group MODE (the most
  * common categorical value — the one basic aggregate SQL never made
  * first-class) and same-store "comparable sales" (period-over-period
  * growth restricted to entities present in BOTH periods, so mix shift
  * can't masquerade as growth).
  *
  * Scale shapes: the mode is a two-level aggregation — a (group, value)
  * count with map-side combine (the ONLY full-data shuffle; the
  * category-pair grid it emits is dim-bounded), then a deterministic
  * (count desc, value asc) pick over the grid. Comp sales is one
  * (week, customer) hash agg followed by a self-equi-join on
  * (customer, adjacent week) — both sides pre-aggregated, so the join
  * carries one row per active customer-week, never raw orders. */
object Retail {

  /** x128: modal order priority per market segment with its share —
    * deterministic tiebreak (higher count, then lexicographic value). */
  val mode = Q.withOracle(
    "x128_mode_priority",
    "x128: per-segment modal order priority (two-level count, deterministic tiebreak)",
    """WITH g AS (
      |  SELECT c_mktsegment AS mktsegment, o_orderpriority AS prio,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |t AS (SELECT mktsegment, CAST(SUM(cnt) AS BIGINT) AS total FROM g GROUP BY 1),
      |r AS (
      |  SELECT mktsegment, prio, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY mktsegment
      |      ORDER BY cnt DESC, prio) AS rn
      |  FROM g)
      |SELECT r.mktsegment, prio AS mode_priority, cnt,
      |  CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share
      |FROM r JOIN t ON r.mktsegment = t.mktsegment
      |WHERE rn = 1 ORDER BY r.mktsegment""".stripMargin) { (s, dir) =>
    val g = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderpriority").as("prio"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("mktsegment"), col("prio"))
      .agg(count(lit(1)).as("cnt"))
    val t = g.groupBy(col("mktsegment")).agg(sum(col("cnt")).cast("long").as("total"))
    g.withColumn("rn", row_number().over(
        Window.partitionBy(col("mktsegment")).orderBy(col("cnt").desc, col("prio"))))
      .filter(col("rn") === 1)
      .join(broadcast(t), Seq("mktsegment"))
      .select(col("mktsegment"), col("prio").as("mode_priority"), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double")).as("share"))
      .orderBy(col("mktsegment"))
  }

  /** x129: comparable ("same-store") weekly sales — revenue growth
    * computed ONLY over customers who ordered in both the week and the
    * week before, so the metric measures behavior change, not customer
    * mix. Exact pennies; growth is one double division. */
  val compSales = Q.withOracle(
    "x129_comp_sales",
    "x129: same-customer week-over-week comparable sales (mix-shift-free growth)",
    """WITH cw AS (
      |  SELECT o_custkey AS ck, CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS rev
      |  FROM orders GROUP BY 1, 2)
      |SELECT c.wk,
      |  CAST(COUNT(*) AS BIGINT) AS comp_customers,
      |  CAST(SUM(c.rev) AS BIGINT) AS rev_cents,
      |  CAST(SUM(p.rev) AS BIGINT) AS prev_rev_cents,
      |  CAST(SUM(c.rev) - SUM(p.rev) AS DOUBLE) / CAST(SUM(p.rev) AS DOUBLE)
      |    AS growth
      |FROM cw c JOIN cw p ON c.ck = p.ck AND p.wk = c.wk - 7
      |GROUP BY 1 ORDER BY c.wk""".stripMargin) { (s, dir) =>
    val cw = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("ck"), week(col("o_orderdate")).as("wk"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long")
        .as("rev"))
    val cur = cw.select(col("ck"), col("wk"), col("rev"))
    val prev = cw.select(col("ck"), date_add(col("wk"), 7).as("wk"),
      col("rev").as("prev"))
    cur.join(prev, Seq("ck", "wk"))
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("comp_customers"),
        sum(col("rev")).cast("long").as("rev_cents"),
        sum(col("prev")).cast("long").as("prev_rev_cents"))
      .select(col("wk"), col("comp_customers"), col("rev_cents"),
        col("prev_rev_cents"),
        ((col("rev_cents") - col("prev_rev_cents")).cast("double")
          / col("prev_rev_cents").cast("double")).as("growth"))
      .orderBy(col("wk"))
  }

  val all: Seq[Q] = Seq(mode, compSales)
}
