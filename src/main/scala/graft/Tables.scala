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

  /** Temporal columns we promise downstream code as session-TZ
    * TimestampType (normalized on load — the one compatible drift class
    * that needs an actual cast, because functions like `unix_micros`
    * reject NTZ at analysis time). */
  private val temporalCols: Map[String, Seq[String]] = Map(
    "events"   -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders"   -> Seq("o_orderdate")
  )

  /** Type CLASSES the non-temporal columns must stay inside — checked,
    * not cast: queries and the DuckDB oracle read the same parquet, so
    * within-class drift (int32↔int64, float↔double) flows through both
    * engines identically, while cross-class drift (a key arriving as
    * string, an embedding arriving scalar) should name itself at load
    * time instead of surfacing as an AnalysisException mid-plan. */
  private sealed trait Expect
  private case object Integral extends Expect
  private case object Fractional extends Expect
  private case object Str extends Expect
  private case object FracArray extends Expect

  private val contracts: Map[String, Seq[(String, Expect)]] = Map(
    "events" -> Seq("event_id" -> Integral, "user_id" -> Integral,
      "event_type" -> Str, "value" -> Fractional),
    "lineitem" -> Seq("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_linestatus" -> Str),
    "orders" -> Seq("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Str, "o_totalprice" -> Fractional,
      "o_orderpriority" -> Str),
    "customer" -> Seq("c_custkey" -> Integral, "c_name" -> Str,
      "c_nationkey" -> Integral, "c_acctbal" -> Fractional,
      "c_mktsegment" -> Str),
    "supplier" -> Seq("s_suppkey" -> Integral, "s_name" -> Str,
      "s_nationkey" -> Integral, "s_acctbal" -> Fractional),
    "part" -> Seq("p_partkey" -> Integral, "p_name" -> Str,
      "p_brand" -> Str, "p_type" -> Str, "p_size" -> Integral,
      "p_retailprice" -> Fractional),
    "nation" -> Seq("n_nationkey" -> Integral, "n_name" -> Str,
      "n_regionkey" -> Integral),
    "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Str),
    "documents" -> Seq("doc_id" -> Integral, "text" -> Str,
      "lang" -> Str, "source" -> Str, "n_chars" -> Integral),
    "embeddings" -> Seq("vec_id" -> Integral, "embedding" -> FracArray,
      "label" -> Integral)
  )

  private def inClass(dt: DataType, e: Expect): Boolean = (e, dt) match {
    case (Integral, _: ByteType | _: ShortType | _: IntegerType | _: LongType) => true
    case (Fractional, _: FloatType | _: DoubleType | _: DecimalType) => true
    case (Str, _: StringType) => true
    case (FracArray, ArrayType(el, _)) => inClass(el, Fractional)
    case _ => false
  }

  /** Type-checks declared columns that are PRESENT (specs drive loaders
    * over minimal synthetic frames; a genuinely missing column already
    * fails loudly at analysis with the column name). */
  private def checkContract(table: String, df: DataFrame): DataFrame = {
    contracts.get(table).foreach { cols =>
      cols.foreach { case (c, e) =>
        if (df.columns.contains(c)) {
          val dt = df.schema(c).dataType
          if (!inClass(dt, e)) throw new IllegalStateException(
            s"testdata drift: $table.$c arrived as $dt; expected the $e class")
        }
      }
    }
    df
  }

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
    checkContract(name, normalize(name, spark.read.parquet(s"$dir/$name.parquet")))

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
