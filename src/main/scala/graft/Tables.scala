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
  def events(s: SparkSession, dir: String): DataFrame     = table(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
