package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segmented-scan exact global rank — the scale-safe replacement for a
  * corpus-wide `Window.orderBy(...)` (which Spark plans as a
  * SINGLE-PARTITION window: every row funnels through one reducer for a
  * global sort, the one shape that cannot survive a 100× scale-up).
  *
  * The trick (x92/x95 discipline, first applied to x111's range planner):
  * pick a segment key that is a MONOTONE non-decreasing function of the
  * leading sort column. Then
  *
  *   global_rank(row) = (# rows in strictly-earlier segments) + within-segment rank
  *
  * The within-segment `row_number` runs partitioned (parallel, each
  * executor sorts only one segment's rows); the per-segment counts form a
  * |segments|-row table whose running-sum offsets are computed with an
  * unpartitioned window over that BOUNDED table and broadcast back. The
  * only full-data shuffle is the segment hash partition.
  *
  * Exact-NTILE semantics then fall out of the exact rank by SQL's own
  * formula (first `n mod k` buckets carry ⌈n/k⌉ rows, the rest ⌊n/k⌋) —
  * derived, not approximated, so oracles written with plain `NTILE(k)
  * OVER (ORDER BY ...)` replay bit-identically. */
object SegmentedRank {

  /** Adds `r` (1-based exact global rank over `orderCols`) and `n` (total
    * row count, same value on every row) to `df`.
    *
    * `segCol` MUST be monotone non-decreasing in the leading order column
    * (equal order keys ⇒ equal segments); `orderCols` must be a total
    * order (include a tiebreaker key) for the rank to be deterministic. */
  def withGlobalRank(df: DataFrame, segCol: Column, orderCols: Seq[Column]): DataFrame = {
    val seg = df.withColumn("__seg", segCol)
    val wIn = Window.partitionBy(col("__seg")).orderBy(orderCols: _*)
    val offW = Window.orderBy(col("__seg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the offsets/total table is |segments|-sized — a broadcast scalar
    val offsets = seg.groupBy(col("__seg")).agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(sum(col("__bn")).over(offW), lit(0L)))
      .withColumn("n", sum(col("__bn")).over(Window.partitionBy()))
      .select(col("__seg"), col("__off"), col("n"))
    seg.withColumn("__ir", row_number().over(wIn))
      .join(broadcast(offsets), "__seg")
      .withColumn("r", col("__off") + col("__ir"))
      .drop("__seg", "__off", "__ir")
  }

  /** SQL NTILE(k) derived from the exact rank columns `r` and `n` that
    * [[withGlobalRank]] adds. Integer `div` throughout (Column has no
    * integer division; the SQL fragment keeps both engines' floor
    * semantics identical on these positive operands). */
  def ntileExpr(k: Int): Column = expr(
    s"""CASE WHEN r <= (n % $k) * ((n div $k) + 1)
       |  THEN (r - 1) div ((n div $k) + 1) + 1
       |  ELSE (n % $k)
       |    + (r - (n % $k) * ((n div $k) + 1) - 1)
       |        div greatest(n div $k, 1L) + 1
       |END""".stripMargin)
}
