package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark DataFrame pipeline plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Queries without an oracle get the driver's weaker rows-only check —
  * those carry their own ScalaTest assertions instead.
  *
  * Every query result must be deterministically ordered (explicit total
  * ORDER BY in both forms) and use identical output column names in both
  * forms — the driver sorts columns by name and hashes values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def apply(name: String, doc: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, doc)
  def withOracle(name: String, doc: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle), doc)
}
