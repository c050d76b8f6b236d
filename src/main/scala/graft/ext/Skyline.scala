package graft.ext

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) operator — the multi-criteria "best offers"
  * query: rows not dominated on (minimize price, maximize quantity,
  * maximize discount). A mainstream OLAP operator family (Börzsönyi et
  * al., ICDE'01) that Spark has no native node for; re-expressed here as
  * a grid-pruned two-phase plan instead of the classic quadratic
  * block-nested loop.
  *
  * Plan shape: every skyline tuple must be the MIN-price tuple of its
  * (quantity, discount) grid cell — any same-cell tuple with a strictly
  * higher price is dominated by the cell winner. So phase 1 is ONE
  * hash-aggregation (map-side combine, shuffle of ≤ |qty|×|disc| cells ≈
  * 550 rows), and phase 2 runs the pairwise dominance test only among
  * cell winners: a broadcast anti-join over two ≤550-row sides (a bounded
  * BroadcastNestedLoopJoin, allow-listed in PlanAuditSpec). The 100 TB
  * input is touched exactly once, with no window, no global sort, and no
  * quadratic work on anything proportional to the data; continuous extra
  * dimensions quantize into the grid the same way (the grid-partitioned
  * skyline of the literature).
  */
object Skyline {

  /** x80: Pareto-optimal (quantity ↑, discount ↑, price ↓) offers over
    * lineitem — output is the non-dominated set of distinct
    * (qty, disc, min-price) cell winners, one row per surviving cell. */
  val paretoOffers = Q.withOracle(
    "x80_skyline_offers",
    "x80: grid-pruned 3D skyline (max qty, max discount, min price)",
    """WITH cells AS (
      |  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
      |    CAST(CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE) AS disc,
      |    MIN(l_extendedprice) AS price
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT c.qty, c.disc, c.price
      |FROM cells c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM cells d
      |  WHERE d.qty >= c.qty AND d.disc >= c.disc AND d.price <= c.price
      |    AND (d.qty > c.qty OR d.disc > c.disc OR d.price < c.price))
      |ORDER BY c.qty, c.disc""".stripMargin) { (s, dir) =>
    val cells = Tables.lineitem(s, dir)
      .groupBy(floor(col("l_quantity")).cast("long").as("qty"),
        Parity.dec(col("l_discount")).cast("double").as("disc"))
      .agg(min(col("l_extendedprice")).as("price"))
    val dom = broadcast(cells.select(
      col("qty").as("dqty"), col("disc").as("ddisc"), col("price").as("dprice")))
    cells.join(dom,
        col("dqty") >= col("qty") && col("ddisc") >= col("disc") &&
          col("dprice") <= col("price") &&
          (col("dqty") > col("qty") || col("ddisc") > col("disc") ||
            col("dprice") < col("price")),
        "left_anti")
      .orderBy(col("qty"), col("disc"))
  }

  val all: Seq[Q] = Seq(paretoOffers)
}
