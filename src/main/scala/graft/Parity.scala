package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `SparkEntry.oracleSql` text on the same tables. Floating-point SUMs are
  * order-dependent, and Spark's parallel partial aggregation visits rows in
  * a different order than DuckDB's sequential scan — so a naive
  * `sum(double)` can differ in the last ulp and fail a hash compare.
  *
  * Fix: do exact arithmetic. Cast doubles to DECIMAL(12,2) (the source
  * values carry ≤2 decimals), aggregate in decimal (exact, associative,
  * order-independent), and cast the final decimal back to DOUBLE. Both
  * engines then produce bit-identical doubles. Derived ratios/averages are
  * computed from those exact sums with a single double division, which is
  * deterministic given identical inputs.
  *
  * This is also the 100TB-correct pattern: decimal aggregation makes
  * results reproducible across cluster sizes and AQE re-plans, where
  * double-sum results would drift run to run.
  */
object Parity {
  val Money = "decimal(12,2)"

  /** Exact 2-decimal view of a double column. */
  def dec(c: Column): Column = c.cast(Money)

  /** Long-pennies aggregation: `sum(decimal(12,2))` widens the buffer to
    * decimal(22,2), which exceeds the 18-digit long-backed representation —
    * HashAggregateExec then keeps heavyweight Decimal buffers and skips the
    * vectorized fast hash map. Summing exact integer pennies in a plain
    * LONG buffer is ~2× faster end-to-end (measured on a2 at sf0.1:
    * 1.03-1.9s decimal vs 0.69s pennies) and remains bit-identical: the
    * pennies are derived from the decimal cast itself (exact ×10^scale,
    * exact long), the exact integer total is widened back through decimal,
    * and the final double is the correctly-rounded image of the same
    * rational DuckDB computes. ANSI mode makes long-sum overflow loud, and
    * the headroom is wide: with ≤10^7-penny row values a single GROUP would
    * need ~10^11 rows to overflow — far beyond any 100 TB group. */
  private def pennySum(c: Column, scale: Int): Column = {
    val unit = math.pow(10, scale).toLong
    (sum((c * unit).cast("long")).cast("decimal(38,0)") / unit).cast("double")
  }

  /** Order-independent sum of a ≤2-decimal double column, as double. */
  def dsum(c: Column): Column = pennySum(dec(c), 2)

  /** Order-independent sum of an already-decimal SCALE-2 expression, as
    * double. (For the scale-4 revenue product use [[revenueSum]].) */
  def dsumExact(c: Column): Column = pennySum(c, 2)

  /** `l_extendedprice * (1 - l_discount)` in exact decimal arithmetic. */
  def revenue(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(Money) - dec(discount))

  /** Order-independent `SUM(price * (1 - discount))`, as double — the
    * scale-4 penny path for the revenue product. */
  def revenueSum(price: Column, discount: Column): Column =
    pennySum(revenue(price, discount), 4)

  /** Monday-start week as DATE (matches DuckDB `date_trunc('week', ts)`,
    * which returns DATE directly; Spark returns a timestamp → cast). */
  def week(c: Column): Column = to_date(date_trunc("week", c))

  /** Calendar day as DATE. */
  def day(c: Column): Column = to_date(c)

  /** TRY_CAST-to-int equivalent that stays inside codegen under ANSI mode:
    * digits-only strings cast, everything else (including '') → NULL. */
  def tryInt(c: Column): Column = when(c.rlike("^[0-9]+$"), c.cast("int"))

  /** SQL fragments for the DuckDB oracle, kept next to their Spark
    * equivalents so the two stay in sync. */
  object sql {
    def dec(col: String): String = s"CAST($col AS DECIMAL(12,2))"
    def dsum(col: String): String = s"CAST(SUM(${dec(col)}) AS DOUBLE)"
    def revenueSum(price: String, discount: String): String =
      s"CAST(SUM(${dec(price)} * (CAST(1 AS DECIMAL(12,2)) - ${dec(discount)})) AS DOUBLE)"
    def week(col: String): String = s"CAST(date_trunc('week', $col) AS DATE)"
    def day(col: String): String = s"CAST($col AS DATE)"
  }
}
