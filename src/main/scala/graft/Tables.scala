package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Tables play the roles of the reference's 4-table star schema
  * (SURVEY.md §7.1): `lineitem`/`events` ≈ `weekly_report` fact,
  * `customer→nation→region` ≈ `hospital→location` dim chain, `orders` ≈
  * `hospital_quality` SCD, `documents`/`embeddings` for the scale
  * extensions. All reads are plain parquet scans so Catalyst gets full
  * pushdown/pruning; never cache here (each query decides its own reuse).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame   = table(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = table(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = table(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = table(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = table(s, dir, "region")
  /** events.parquet stores TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long,
    * rescaled here to a proper timestamp. Integer division — a double
    * round-trip would lose precision above 2^53 nanos (~epoch 2255 in µs,
    * but already today in ns). */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
