package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Tables play the roles of the reference's 4-table star schema
  * (SURVEY.md §7.1): `lineitem`/`events` ≈ `weekly_report` fact,
  * `customer→nation→region` ≈ `hospital→location` dim chain, `orders` ≈
  * `hospital_quality` SCD, `documents`/`embeddings` for the scale
  * extensions. All reads are plain parquet scans so Catalyst gets full
  * pushdown/pruning; never cache here (each query decides its own reuse).
  *
  * Schema-drift hardening: the driver regenerates the parquet between
  * rounds and has already shipped the same instant under three encodings —
  * TIMESTAMP(NANOS) (arrives as long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`), µs TIMESTAMP_NTZ, and µs
  * TIMESTAMP_LTZ. Every temporal column is therefore normalized to a
  * declared session-TZ `TimestampType` on load (the session TZ is pinned
  * UTC by every entrypoint, so NTZ→LTZ is an exact relabel, and the DuckDB
  * oracle reads the same parquet natively). Incompatible drift fails loud
  * with the table and column name instead of surfacing later as an
  * AnalysisException deep inside a query plan.
  */
object Tables {

  /** Temporal columns we promise downstream code; everything else passes
    * through untouched (queries tolerate numeric widening natively).
    */
  private val temporalCols: Map[String, Seq[String]] = Map(
    "events"   -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders"   -> Seq("o_orderdate")
  )

  /** Normalize one declared-temporal column to session-TZ TimestampType.
    * Integer division for the nanos-as-long case — a double round-trip
    * would lose precision above 2^53 nanos (already today in ns).
    */
  private def toTimestamp(table: String, name: String, dt: DataType): Option[Column] =
    dt match {
      case _: TimestampType    => None // already the declared type
      case _: TimestampNTZType => Some(col(name).cast(TimestampType))
      case _: LongType         => Some(timestamp_micros(expr(s"$name div 1000")))
      case _: DateType         => Some(col(name).cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"testdata drift: $table.$name arrived as $other; expected a " +
            "timestamp encoding (TIMESTAMP, TIMESTAMP_NTZ, DATE, or nanos-as-long)")
    }

  private def normalize(table: String, df: DataFrame): DataFrame =
    temporalCols.get(table).fold(df) { cols =>
      cols.foldLeft(df) { (acc, c) =>
        require(acc.columns.contains(c), s"testdata drift: $table lost column $c")
        toTimestamp(table, c, acc.schema(c).dataType)
          .fold(acc)(norm => acc.withColumn(c, norm))
      }
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(name, spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(s: SparkSession, dir: String): DataFrame   = table(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = table(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = table(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = table(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = table(s, dir, "region")
  def events(s: SparkSession, dir: String): DataFrame     = table(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
