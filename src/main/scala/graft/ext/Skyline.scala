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

  /** Bits for the price-bucket key of the x80b segmented sweep — the
    * only orderBy-without-partition window runs over the ≈ priceRange /
    * 2^10 bucket-totals rows, never the tuple table (the x23 prefix-scan
    * discipline applied to a prefix MAX). */
  private val SweepBucketBits = 10

  /** x80b: 2D skyline over CONTINUOUS dimensions (minimize price,
    * maximize ship recency) — the grid prune of x80 needs a
    * low-cardinality dimension to cell on; when both dimensions are
    * continuous the classic answer is the sort-sweep: aggregate to
    * distinct prices (max ship date per price), then a tuple survives
    * iff its date strictly exceeds the running max over all cheaper
    * prices. Re-expressed scale-first: the running max is a TWO-LEVEL
    * segmented scan (per-bucket window + one tiny bucket-offset window)
    * — identical result to `MAX() OVER (ORDER BY price)` without ever
    * sorting the distinct-price table in one partition. */
  val sweepSkyline2d = Q.withOracle(
    "x80b_skyline_sweep",
    "x80b: 2D continuous skyline (min price, max ship date) via segmented sweep",
    """WITH pm AS (
      |  SELECT l_extendedprice AS price,
      |    MAX(epoch_us(l_shipdate)) AS last_ship_us
      |  FROM lineitem GROUP BY 1),
      |sweep AS (
      |  SELECT price, last_ship_us,
      |    MAX(last_ship_us) OVER (ORDER BY price
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
      |  FROM pm)
      |SELECT price, last_ship_us
      |FROM sweep WHERE prior IS NULL OR last_ship_us > prior
      |ORDER BY price""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val pm = Tables.lineitem(s, dir)
      .groupBy(col("l_extendedprice").as("price"))
      .agg(max(unix_micros(col("l_shipdate"))).as("last_ship_us"))
      .withColumn("bkt", shiftright(floor(col("price")).cast("long"), SweepBucketBits))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // prefix max of PRIOR buckets — a window over the bucket-totals
    // table only (bounded by the price range, not the data)
    val bucketOffsets = pm.groupBy(col("bkt")).agg(max(col("last_ship_us")).as("bm"))
      .withColumn("off", max(col("bm")).over(Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bkt"), col("off"))
    val Neg = Long.MinValue
    pm.withColumn("pin", max(col("last_ship_us")).over(wIn))
      .join(broadcast(bucketOffsets), "bkt")
      .withColumn("prior",
        greatest(coalesce(col("pin"), lit(Neg)), coalesce(col("off"), lit(Neg))))
      .filter(col("prior") === Neg || col("last_ship_us") > col("prior"))
      .select(col("price"), col("last_ship_us"))
      .orderBy(col("price"))
  }

  val all: Seq[Q] = Seq(paretoOffers, sweepSkyline2d)
}
