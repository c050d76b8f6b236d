package graft.analytics

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic queries — Spark-native re-expressions of the reference's 8
  * Streamlit report queries (`weekly-report.py:269-403`, SURVEY.md §2.4-2.6)
  * on the driver testdata. `lineitem`/`orders` play `weekly_report`,
  * `customer→nation→region` plays `hospital→location`.
  *
  * Scale notes (100 TB): every aggregation here is a partial+final hash
  * aggregate on the grouping key (map-side combine before shuffle); scalar
  * "max week" subqueries are computed once and broadcast, never collected
  * into a driver loop; the only `Window.orderBy` without partitioning (W1)
  * runs on the already-aggregated week axis (≤ thousands of rows) exactly
  * as SURVEY.md §7.3.7 prescribes.
  */
object Reports {
  import Parity._

  private val CutoffDay = "1998-09-02"

  /** Flagship: TPC-H-Q1-shaped pricing summary (A2 multi-sum, A5 exact
    * arithmetic, P5 date filter). Ref: weekly-report.py:297-306 shape. */
  val q1 = Q.withOracle(
    "q1_pricing_summary",
    "A2/A5/P5: grouped multi-aggregate with exact decimal sums",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sql.dsum("l_quantity")} AS sum_qty,
       |  ${sql.dsum("l_extendedprice")} AS sum_base_price,
       |  ${sql.revenueSum("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  CAST(SUM(${sql.dec("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE ${sql.day("l_shipdate")} <= DATE '$CutoffDay'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(day(col("l_shipdate")) <= lit(java.sql.Date.valueOf(CutoffDay)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A1: COUNT(DISTINCT) per group — "hospitals reporting per week".
    * Ref: weekly-report.py:274-277. */
  val a1 = Q.withOracle(
    "a1_weekly_reporters",
    "A1: exact count-distinct per week",
    s"""SELECT ${sql.week("o_orderdate")} AS wk,
       |  COUNT(DISTINCT o_custkey) AS n_customers
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(week(col("o_orderdate")).as("wk"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("wk"))
  }

  /** W1+A8: LAG over ordered weeks with COALESCE(…, 0) — week-over-week
    * delta. Ref: weekly-report.py:281-282. Single-partition window is
    * deliberate: it runs on the aggregated week axis (~350 rows). */
  val w1 = Q.withOracle(
    "w1_weekly_delta",
    "W1/A8: lag over ordered weeks, coalesce to 0",
    s"""WITH weekly AS (
       |  SELECT ${sql.week("o_orderdate")} AS wk,
       |    COUNT(DISTINCT o_custkey) AS n_customers
       |  FROM orders GROUP BY 1)
       |SELECT wk, n_customers,
       |  n_customers - COALESCE(LAG(n_customers) OVER (ORDER BY wk), 0) AS delta
       |FROM weekly ORDER BY wk""".stripMargin) { (s, dir) =>
    val weekly = Tables.orders(s, dir)
      .groupBy(week(col("o_orderdate")).as("wk"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"))
    weekly
      .withColumn("delta",
        col("n_customers") - coalesce(lag(col("n_customers"), 1).over(Window.orderBy(col("wk"))), lit(0)))
      .orderBy(col("wk"))
  }

  /** A2: multi-column SUM per week — "beds used per week".
    * Ref: weekly-report.py:336-341. */
  val a2 = Q.withOracle(
    "a2_weekly_sums",
    "A2: multi-column grouped sums per week",
    s"""SELECT ${sql.week("l_shipdate")} AS wk,
       |  ${sql.dsum("l_quantity")} AS sum_qty,
       |  ${sql.dsum("l_extendedprice")} AS sum_price,
       |  ${sql.revenueSum("l_extendedprice", "l_discount")} AS sum_revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(week(col("l_shipdate")).as("wk"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("wk"))
  }

  /** A3: SUM of a row-level expression with NULL propagation — a NULL in
    * either addend drops the whole row's contribution, which differs from
    * SUM(a)+SUM(b); both forms emitted to pin the divergence.
    * Ref: weekly-report.py:313-315 (SUM(a + b)). */
  val a3 = Q.withOracle(
    "a3_sum_null_propagation",
    "A3: sum(a+b) NULL-propagation vs sum(a)+sum(b)",
    s"""SELECT l_returnflag,
       |  CAST(SUM(CASE WHEN l_discount = 0 THEN NULL ELSE ${sql.dec("l_extendedprice")} END
       |           + ${sql.dec("l_tax")}) AS DOUBLE) AS sum_ab,
       |  CAST(SUM(CASE WHEN l_discount = 0 THEN NULL ELSE ${sql.dec("l_extendedprice")} END) AS DOUBLE)
       |    + CAST(SUM(${sql.dec("l_tax")}) AS DOUBLE) AS sum_a_plus_sum_b
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val a = when(col("l_discount") === 0, lit(null)).otherwise(dec(col("l_extendedprice")))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(a + dec(col("l_tax"))).cast("double").as("sum_ab"),
        (sum(a).cast("double") + sum(dec(col("l_tax"))).cast("double")).as("sum_a_plus_sum_b"))
      .orderBy(col("l_returnflag"))
  }

  /** A4+A5: ratio-of-sums with zero guard and 1-decimal rounding —
    * "percent utilization". Ref: weekly-report.py:313-316, 389-395. */
  val a4 = Q.withOracle(
    "a4_weekly_discount_pct",
    "A4/A5: 100*sum(x)/nullif(sum(y),0), round 1",
    s"""SELECT ${sql.week("l_shipdate")} AS wk,
       |  ROUND(${sql.revenueSum("l_extendedprice", "l_discount")} * 100.0
       |    / NULLIF(${sql.dsum("l_extendedprice")}, 0), 1) AS pct_after_discount
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val num = revenueSum(col("l_extendedprice"), col("l_discount"))
    val den = dsum(col("l_extendedprice"))
    Tables.lineitem(s, dir)
      .groupBy(week(col("l_shipdate")).as("wk"))
      .agg(round(num * lit(100.0) / when(den === 0, lit(null)).otherwise(den), 1)
        .as("pct_after_discount"))
      .orderBy(col("wk"))
  }

  /** A6: MAX per group — last order date per customer.
    * Ref: weekly-report.py:374. */
  val a6 = Q.withOracle(
    "a6_last_order_per_customer",
    "A6: max(date) per key",
    s"""SELECT o_custkey, MAX(${sql.day("o_orderdate")}) AS last_order
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(day(col("o_orderdate"))).as("last_order"))
      .orderBy(col("o_custkey"))
  }

  /** A7: scalar MAX subquery as a filter value, computed once and
    * broadcast — never collected row-by-row. Ref: weekly-report.py:327-329. */
  val a7 = Q.withOracle(
    "a7_latest_week_volume",
    "A7: aggregate at the week selected by a scalar max subquery",
    s"""SELECT ${sql.week("l_shipdate")} AS wk, ${sql.dsum("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |WHERE ${sql.week("l_shipdate")} =
       |  (SELECT MAX(${sql.week("l_shipdate")}) FROM lineitem
       |   WHERE ${sql.day("l_shipdate")} <= DATE '$CutoffDay')
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val maxWk = li
      .filter(day(col("l_shipdate")) <= lit(java.sql.Date.valueOf(CutoffDay)))
      .agg(max(week(col("l_shipdate"))).as("max_wk"))
    li.withColumn("wk", week(col("l_shipdate")))
      .join(broadcast(maxWk), col("wk") === col("max_wk"))
      .groupBy(col("wk"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
      .orderBy(col("wk"))
  }

  /** A9+J4+T4: HAVING an aggregate vs a scalar — "hospitals whose last
    * report predates the latest week". Customers with zero orders yield
    * MAX=NULL, and NULL < x filters them out — reproduced exactly.
    * Ref: weekly-report.py:376-383. */
  val a9 = Q.withOracle(
    "a9_stale_customers",
    "A9/J4/T4: HAVING max(agg) < scalar subquery, NULL groups dropped",
    s"""SELECT c.c_custkey, c.c_name, MAX(${sql.day("o_orderdate")}) AS last_order
       |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       |GROUP BY 1, 2
       |HAVING MAX(${sql.day("o_orderdate")}) <
       |  (SELECT MAX(${sql.day("o_orderdate")}) FROM orders) - 90
       |ORDER BY c_name, c_custkey LIMIT 10""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val latest = o.agg(max(day(col("o_orderdate"))).as("latest_day"))
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(max(day(col("o_orderdate"))).as("last_order"))
      .crossJoin(broadcast(latest))
      .filter(col("last_order") < date_sub(col("latest_day"), 90))
      .select(col("c_custkey"), col("c_name"), col("last_order"))
      .orderBy(col("c_name"), col("c_custkey"))
      .limit(10)
  }

  /** A10: GROUP BY multiple keys — (week, segment) grid.
    * Ref: weekly-report.py:400. */
  val a10 = Q.withOracle(
    "a10_week_segment_grid",
    "A10: two-key grouped aggregate grid",
    s"""SELECT ${sql.week("o_orderdate")} AS wk, c_mktsegment,
       |  ${sql.dsum("o_totalprice")} AS sum_price, COUNT(*) AS n_orders
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    // customer scales with SF — no broadcast hint; AQE decides at runtime.
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(week(col("o_orderdate")).as("wk"), col("c_mktsegment"))
      .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n_orders"))
      .orderBy(col("wk"), col("c_mktsegment"))
  }

  /** A11: DISTINCT. Ref: weekly-report.py:290-294. */
  val a11 = Q.withOracle(
    "a11_distinct_flag_status",
    "A11: distinct over two columns",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** W2: DISTINCT ON — latest row per key with deterministic tie-break.
    * The one reference operator with no single DataFrame function
    * (weekly-report.py:320-325): row_number over (key, ts DESC, id DESC). */
  val w2 = Q.withOracle(
    "w2_latest_order_per_customer",
    "W2: DISTINCT ON via row_number, deterministic tie-break",
    s"""SELECT o_custkey, o_orderkey, ${sql.day("o_orderdate")} AS order_day,
       |  CAST(${sql.dec("o_totalprice")} AS DOUBLE) AS totalprice
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
       |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
       |WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        day(col("o_orderdate")).as("order_day"),
        dec(col("o_totalprice")).cast("double").as("totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** W4: rank-family window functions — percent_rank + cume_dist of each
    * customer's balance within its nation. The composite (balance, key)
    * ordering makes ranks tie-free, so both fractions are single IEEE
    * divisions of identical integers on either engine. One key-partitioned
    * window: a single shuffle on the nation key at any scale. */
  val w4 = Q.withOracle(
    "w4_percent_rank",
    "W4: percent_rank / cume_dist per nation by balance",
    """SELECT c_custkey, c_nationkey,
      |  PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy(col("c_custkey"))
  }

  /** T1: ORDER BY … DESC LIMIT 1 with deterministic tie-break.
    * Ref: weekly-report.py:285-286. */
  val t1 = Q.withOracle(
    "t1_most_recent_order",
    "T1: order-by desc limit 1",
    s"""SELECT o_orderkey, ${sql.day("o_orderdate")} AS order_day
       |FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .select(col("o_orderkey"), day(col("o_orderdate")).as("order_day"))
      .limit(1)
  }

  /** T2: top-k distinct dates (TakeOrderedAndProject plan).
    * Ref: weekly-report.py:290-295. */
  val t2 = Q.withOracle(
    "t2_top5_weeks",
    "T2: distinct order-by-desc limit 5",
    s"""SELECT DISTINCT ${sql.week("l_shipdate")} AS wk FROM lineitem
       |ORDER BY wk DESC LIMIT 5""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(week(col("l_shipdate")).as("wk"))
      .distinct()
      .orderBy(col("wk").desc)
      .limit(5)
  }

  /** T3: bottom-k by aggregate — "10 states with fewest open beds".
    * Ref: weekly-report.py:365-367. */
  val t3 = Q.withOracle(
    "t3_bottom10_nations_by_balance",
    "T3: bottom-k on a grouped aggregate",
    s"""SELECT n_nationkey, n_name, ${sql.dsum("c_acctbal")} AS total_balance
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY 1, 2 ORDER BY total_balance ASC, n_nationkey LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("total_balance"))
      .orderBy(col("total_balance").asc, col("n_nationkey"))
      .limit(10)
  }

  /** T5+J3: top-k by metric over the full dim chain — "top 10 states by
    * utilization". Ref: weekly-report.py:218, 346-352. */
  val t5 = Q.withOracle(
    "t5_top10_nations_by_revenue",
    "T5/J3: top-k over fact⋈fact⋈dim⋈dim chain",
    s"""SELECT n_name, ${sql.revenueSum("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY 1 ORDER BY revenue DESC, n_name LIMIT 10""".stripMargin) { (s, dir) =>
    // pre-aggregate the fact to order grain before the fact-fact join:
    // decimal sums are exactly associative, so sum-of-presums equals the
    // flat sum and the oracle is unchanged — while the join input shrinks
    // ~4x (lines → orders). At 100 TB this is the shuffle that matters.
    // The per-order level keeps a LONG buffer (exact 1e-4 units — an order
    // has ≤7 lines, no overflow risk); the 25-group final level sums
    // decimal for unbounded headroom. Same rational value either way.
    val liAgg = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum((revenue(col("l_extendedprice"), col("l_discount")) * 10000)
        .cast("long")).as("rev_o4"))
    liAgg
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      // customer scales with SF — no broadcast hint (AQE decides); only
      // the bounded nation dim keeps one.
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("rev_o4").cast("decimal(38,0)")) / 10000).cast("double")
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
      .limit(10)
  }

  /** O1: multi-key global sort with limit. Ref: weekly-report.py:306 etc. */
  val o1 = Q.withOracle(
    "o1_multikey_sort",
    "O1: multi-key order-by with mixed directions",
    """SELECT l_orderkey, l_linenumber, l_returnflag, CAST(l_quantity AS DOUBLE) AS qty
      |FROM lineitem
      |ORDER BY l_returnflag ASC, qty DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity").cast("double").as("qty"))
      .orderBy(col("l_returnflag").asc, col("qty").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(100)
  }

  /** A1's 100 TB variant: approx_count_distinct (HLL++) — sketch-mergeable
    * across partitions, constant memory per group where exact
    * count-distinct shuffles every key. Rows-only driver check; the spec
    * pins relative error against the exact count. */
  val a1approx = Q(
    "a1b_weekly_reporters_approx",
    "A1 scale variant: HLL++ approximate count-distinct per week")(
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(week(col("o_orderdate")).as("wk"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("n_customers_approx"))
        .orderBy(col("wk")))

  /** a17: exact interpolated percentiles per group. Cross-engine
    * bit-parity holds here WITHOUT the decimal trick because
    * l_quantity is integer-valued and the percentile fractions are
    * dyadic (0.25/0.5/0.75): every term of the interpolation
    * `lo + (hi-lo)·g` is an exact dyadic rational, so no rounding
    * occurs in either engine. Spark's `percentile` is the exact
    * (sort-based) aggregate; `approx_percentile` (KLL-free t-digest-
    * style sketch) is the 100 TB path when inputs aren't dyadic-safe —
    * same trade as a1 vs a1b. */
  val a17 = Q.withOracle(
    "a17_percentiles",
    "A17: exact p25/p50/p75 per group (dyadic-exact interpolation)",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.50) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.50)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
      .orderBy(col("l_returnflag"))
  }

  /** a18: collect-to-list with deterministic order, surfaced as a
    * joined string — `collect_set` alone is partition-order-dependent,
    * which at cluster scale means a different answer every run; sorting
    * before joining makes the aggregate order-independent. */
  val a18 = Q.withOracle(
    "a18_collect_sorted",
    "A18: per-week sorted distinct status list as a string",
    """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      |FROM orders GROUP BY 1 ORDER BY wk""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(week(col("o_orderdate")).as("wk"))
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus")))).as("statuses"))
      .orderBy(col("wk"))
  }

  /** a21: deterministic per-group MODE — the most frequent order
    * priority per market segment. Built as count-then-rank rather than a
    * native `mode()` aggregate because mode's TIE behavior is
    * engine-arbitrary (Spark and DuckDB may pick different members of a
    * tied class); ranking by (count desc, value asc) pins one answer on
    * both engines and adds nothing at scale — the ranked input is the
    * already-aggregated (group, value) table, tiny relative to the
    * corpus it summarizes. */
  val a21 = Q.withOracle(
    "a21_mode_priority",
    "A21: most frequent order priority per segment (deterministic mode)",
    """WITH cnt AS (
      |  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |    ORDER BY n DESC, o_orderpriority) AS rn
      |  FROM cnt)
      |SELECT c_mktsegment, o_orderpriority AS mode_priority, n AS n_orders
      |FROM ranked WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val cnt = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("n").desc, col("o_orderpriority"))
    cnt.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"),
        col("n").as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val all: Seq[Q] = Seq(q1, a1, a1approx, w1, a2, a3, a4, a6, a7, a9, a10, a11, w2,
    w4, t1, t2, t3, t5, o1, a17, a18, a21)
}
