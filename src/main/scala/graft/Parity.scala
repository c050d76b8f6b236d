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

  /** Order-independent sum of a ≤2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent sum of an already-decimal expression, as double. */
  def dsumExact(c: Column): Column = sum(c).cast("double")

  /** `l_extendedprice * (1 - l_discount)` in exact decimal arithmetic. */
  def revenue(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(Money) - dec(discount))

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
