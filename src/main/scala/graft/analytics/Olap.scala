package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multi-level OLAP aggregation — ROLLUP and CUBE grouping sets, the
  * classic "report with subtotals and margins" shape behind the
  * reference's per-facility/per-week report matrix (weekly-report.py
  * pivots one level at a time; a warehouse engine computes the whole
  * hierarchy in one pass).
  *
  * Both queries are a single Expand(k sets) + one hash aggregate: Spark
  * rewrites rollup/cube into an Expand node that replays each input row
  * once per grouping set with the non-grouped columns nulled, then one
  * ordinary partial+final hash agg over (grouping-set id, keys). That is
  * the textbook distributed grouping-sets plan — map-side combine still
  * applies per set, no extra shuffle vs a plain groupBy, and output is
  * contractually bounded by the key-domain product (31 rows for the
  * region→nation rollup, ≤ 4·|prio|·|status| for the cube).
  *
  * Oracle-exactness: revenue is exact penny longs (sum the
  * decimal(12,2), scale by 100, cast — the Parity pattern); the grouping
  * level is GROUPING() flags, identical integers in both engines; rolled
  * names are COALESCEd to a sentinel below any data value so ordering
  * can't straddle engines' NULL-sort conventions.
  */
object Olap {

  /** Sentinel for a rolled-up (aggregated-away) dimension value — sorts
    * before every uppercase data value in both engines' binary collation,
    * and cannot collide with real region/nation/priority names. */
  private val All = "(all)"

  /** x115: ROLLUP over the region → nation customer-revenue hierarchy —
    * leaf rows per (region, nation), subtotals per region, grand total,
    * each tagged with its grouping level (0 = leaf, 1 = region subtotal,
    * 3 = grand total). Dims are broadcast; the fact table is scanned
    * once. */
  val rollupRevenue = Q.withOracle(
    "x115_rollup_revenue",
    "x115: region->nation revenue ROLLUP with subtotal levels (one Expand + hash agg)",
    s"""SELECT
       |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS lvl,
       |  COALESCE(r_name, '$All') AS region,
       |  COALESCE(n_name, '$All') AS nation,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
       |    AS revenue_cents,
       |  CAST(COUNT(*) AS BIGINT) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY lvl, region, nation""".stripMargin) { (s, dir) =>
    val dims = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        (grouping(col("r_name")) * 2 + grouping(col("n_name"))).cast("long").as("lvl"),
        (sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long")
          .as("revenue_cents"),
        count(lit(1)).as("n_orders"))
      .select(col("lvl"),
        coalesce(col("r_name"), lit(All)).as("region"),
        coalesce(col("n_name"), lit(All)).as("nation"),
        col("revenue_cents"), col("n_orders"))
      .orderBy(col("lvl"), col("region"), col("nation"))
  }

  /** x116: CUBE over (order priority × order status) — all four grouping
    * sets (leaf, per-priority, per-status, grand total) in one pass, with
    * revenue and average-order-value margins. */
  val cubeOrders = Q.withOracle(
    "x116_cube_orders",
    "x116: order priority x status CUBE margins (all four grouping sets, one pass)",
    s"""SELECT
       |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
       |    AS lvl,
       |  COALESCE(o_orderpriority, '$All') AS priority,
       |  COALESCE(o_orderstatus, '$All') AS status,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
       |    AS revenue_cents,
       |  CAST(COUNT(*) AS BIGINT) AS n_orders
       |FROM orders
       |GROUP BY CUBE (o_orderpriority, o_orderstatus)
       |ORDER BY lvl, priority, status""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderstatus"), col("o_totalprice"))
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        (grouping(col("o_orderpriority")) * 2 + grouping(col("o_orderstatus")))
          .cast("long").as("lvl"),
        (sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long")
          .as("revenue_cents"),
        count(lit(1)).as("n_orders"))
      .select(col("lvl"),
        coalesce(col("o_orderpriority"), lit(All)).as("priority"),
        coalesce(col("o_orderstatus"), lit(All)).as("status"),
        col("revenue_cents"), col("n_orders"))
      .orderBy(col("lvl"), col("priority"), col("status"))
  }

  /** x122: contribution analysis — each nation's share of its region's
    * revenue and each region's share of the total, the "percent of
    * parent" drill-down every rollup report is read for. One fact-table
    * hash agg to the nation grain (the ONLY full-data shuffle; dims
    * broadcast), then the parent/total denominators are window sums
    * over the dim-sized aggregate — never a second pass over facts.
    * Shares are single double divisions of exact penny longs (identical
    * in both engines); revenue stays exact. */
  val contribution = Q.withOracle(
    "x122_contribution_shares",
    "x122: nation-of-region and region-of-total revenue shares (windowed over the agg grain)",
    """WITH leaf AS (
      |  SELECT r_name AS region, n_name AS nation,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
      |      AS revenue_cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT region, nation, revenue_cents,
      |    CAST(SUM(revenue_cents) OVER (PARTITION BY region) AS BIGINT) AS region_cents,
      |    CAST(SUM(revenue_cents) OVER () AS BIGINT) AS total_cents
      |  FROM leaf)
      |SELECT region, nation, revenue_cents,
      |  CAST(revenue_cents AS DOUBLE) / CAST(region_cents AS DOUBLE) AS share_of_region,
      |  CAST(region_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS region_share_of_total
      |FROM w ORDER BY region, nation""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val dims = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val leaf = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long")
        .as("revenue_cents"))
    leaf
      .withColumn("region_cents",
        sum(col("revenue_cents")).over(Window.partitionBy(col("region"))).cast("long"))
      .withColumn("total_cents",
        sum(col("revenue_cents")).over(Window.partitionBy()).cast("long"))
      .select(col("region"), col("nation"), col("revenue_cents"),
        (col("revenue_cents").cast("double") / col("region_cents").cast("double"))
          .as("share_of_region"),
        (col("region_cents").cast("double") / col("total_cents").cast("double"))
          .as("region_share_of_total"))
      .orderBy(col("region"), col("nation"))
  }

  val all: Seq[Q] = Seq(rollupRevenue, cubeOrders, contribution)
}
