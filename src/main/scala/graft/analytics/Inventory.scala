package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Inventory / order-book analytics over reflected prefix sums.
  *
  * A warehouse stock level is a running sum that CANNOT go negative: a
  * shipment that exceeds on-hand stock ships what's there and the excess
  * is lost demand. Naively that is a sequential per-key fold (each step
  * clamps at zero — not an associative aggregate), the shape that kills
  * distributed execution. The engine instead uses the Skorokhod
  * reflection identity: for the one-sided barrier at 0,
  *
  *   reflected_t = P_t − min(0, min_{s≤t} P_s)
  *
  * where P is the UNCLAMPED prefix sum — i.e. the clamped walk is the
  * free walk minus its running low-water mark. That turns the fold into
  * two stacked window scans (cumulative sum, then running min of it),
  * both associative, both partition-parallel per part — the same
  * "sequential-looking op, windowed exactly" discipline as x92/x125.
  * The regulator term −min(0, min P) is itself the business metric:
  * cumulative units of demand that arrived when the shelf was empty
  * (lost sales).
  *
  * Reference anchor: the reference pipelines track weekly bed/supply
  * levels (weekly-report.py:269-403); a clamped stock reconstruction is
  * the event-sourced form of the same ledger.
  *
  * Oracle-exactness: quantities are integral doubles → FLOOR → BIGINT;
  * every window/agg value is an exact long; the per-part order
  * (shipdate, orderkey, linenumber) is a total order, so both engines
  * scan identical sequences. No floats anywhere.
  *
  * Scale shape (100 TB): ONE part-keyed shuffle; both windows share the
  * (part, shipdate, orderkey, linenumber) sort so Spark plans them in
  * one sort pass; then a part-keyed hash agg and a bounded top-20. Parts
  * are the partition key — millions of independent timelines, no global
  * window, no skew (TPC-H part fan-out is uniform; a hot part would be
  * one timeline, the data's real sequential content).
  */
object Inventory {

  /** x137: reflected (floor-at-zero) stock reconstruction per part —
    * returns ('R') restock, other flags draw down; reports the
    * top-20 parts by lost demand with their end/peak stock levels. */
  val reflectedStock = Q.withOracle(
    "x137_reflected_stock",
    "x137: clamped-at-zero stock walk per part via the Skorokhod reflection identity (two windows, no fold)",
    """WITH mv AS (
      |  SELECT l_partkey AS part,
      |    CASE WHEN l_returnflag = 'R' THEN CAST(FLOOR(l_quantity) AS BIGINT)
      |         ELSE -CAST(FLOOR(l_quantity) AS BIGINT) END AS d,
      |    CAST(l_shipdate AS DATE) AS sd, l_orderkey AS ok, l_linenumber AS ln
      |  FROM lineitem),
      |c AS (
      |  SELECT part, d, sd, ok, ln,
      |    SUM(d) OVER (PARTITION BY part ORDER BY sd, ok, ln
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM mv),
      |r AS (
      |  SELECT part, d, cum,
      |    cum - LEAST(CAST(0 AS BIGINT), MIN(cum) OVER (
      |      PARTITION BY part ORDER BY sd, ok, ln
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS refl
      |  FROM c)
      |SELECT part, CAST(COUNT(*) AS BIGINT) AS n_moves,
      |  CAST(SUM(d) AS BIGINT) AS net_units,
      |  CAST(-LEAST(CAST(0 AS BIGINT), MIN(cum)) AS BIGINT) AS lost_units,
      |  CAST(SUM(d) - LEAST(CAST(0 AS BIGINT), MIN(cum)) AS BIGINT) AS end_stock,
      |  CAST(MAX(refl) AS BIGINT) AS peak_stock
      |FROM r GROUP BY part
      |ORDER BY lost_units DESC, part LIMIT 20""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val qty = floor(col("l_quantity")).cast("long")
    val mv = Tables.lineitem(s, dir).select(
      col("l_partkey").as("part"),
      when(col("l_returnflag") === "R", qty).otherwise(-qty).as("d"),
      to_date(col("l_shipdate")).as("sd"),
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val w = Window.partitionBy(col("part")).orderBy(col("sd"), col("ok"), col("ln"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = mv
      .withColumn("cum", sum(col("d")).over(w))
      .withColumn("refl", col("cum") - least(lit(0L), min(col("cum")).over(w)))
    r.groupBy(col("part"))
      .agg(count(lit(1)).cast("long").as("n_moves"),
        sum(col("d")).cast("long").as("net_units"),
        (-least(lit(0L), min(col("cum")))).cast("long").as("lost_units"),
        (sum(col("d")) - least(lit(0L), min(col("cum")))).cast("long").as("end_stock"),
        max(col("refl")).cast("long").as("peak_stock"))
      .orderBy(col("lost_units").desc, col("part")).limit(20)
  }

  val all: Seq[Q] = Seq(reflectedStock)
}
