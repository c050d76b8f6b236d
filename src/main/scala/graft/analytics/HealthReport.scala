package graft.analytics

import graft.Parity
import graft.ingest.HhsLoad
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 8 Streamlit report queries (`weekly-report.py:269-403`)
  * over the ingested healthcare store (the output of HhsLoad/QualityLoad)
  * — the piece that lets a reference user switch wholesale: same tables,
  * same numbers, Spark plans instead of Postgres SQL strings.
  *
  * All aggregation uses the decimal-exact pattern (Parity), all
  * "latest week" scalars are computed once and broadcast, and the one
  * unpartitioned window (Q1's WoW delta) runs on the tiny week axis.
  */
final class HealthReport(spark: SparkSession, storeDir: String, asOf: java.sql.Date) {
  import Parity._

  /** Missing table → empty table with the DDL schema, mirroring the
    * reference where CREATE TABLE pre-exists every query (a store where
    * only one loader has run must still report, with empty sections —
    * weekly-report.py's per-chart empty guards, report:61-63). */
  private def t(name: String): DataFrame =
    if (new java.io.File(s"$storeDir/$name").exists()) spark.read.parquet(s"$storeDir/$name")
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.model.StoreSchemas.byName(name))
  private lazy val weekly = t("weekly_report")
    .filter(col("collection_week") <= lit(asOf))
  private lazy val hospital = t("hospital")
  private lazy val quality = t("hospital_quality")
  /** state lives on location (nb cell 4); reach it through the FK chain
    * exactly like weekly-report.py:349-350. */
  private lazy val hospitalState = hospital
    .join(broadcast(t("location").select(col("location_id"), col("state"))),
      Seq("location_id"), "left")
    .select(col("hospital_pk"), col("hospital_name"), col("state"))

  private val adultBeds = col(HhsLoad.MetricCols(0))
  private val pedBeds = col(HhsLoad.MetricCols(1))
  private val adultOcc = col(HhsLoad.MetricCols(2))
  private val pedOcc = col(HhsLoad.MetricCols(3))
  private val covidBeds = col(HhsLoad.MetricCols(6))

  private lazy val latestWeek: DataFrame =
    weekly.agg(max(col("collection_week")).as("latest_week"))

  /** Q1 (report:269-286): hospitals reporting per week + WoW delta. */
  def recordsPerWeek: DataFrame = {
    val perWeek = weekly.groupBy(col("collection_week"))
      .agg(countDistinct(col("hospital_weekly_id")).as("hospital_count"))
    perWeek.withColumn("delta",
        col("hospital_count") -
          coalesce(lag(col("hospital_count"), 1).over(Window.orderBy(col("collection_week"))), lit(0)))
      .orderBy(col("collection_week"))
  }

  /** Q2 (report:289-306): bed sums over the 5 most recent weeks. */
  def bedsSummary: DataFrame = {
    val recent = weekly.select(col("collection_week")).distinct()
      .orderBy(col("collection_week").desc).limit(5)
    weekly.join(broadcast(recent), Seq("collection_week"))
      .groupBy(col("collection_week"))
      .agg(dsum(adultBeds).as("adult_beds"), dsum(pedBeds).as("pediatric_beds"),
        dsum(adultOcc).as("adult_occupied"), dsum(pedOcc).as("pediatric_occupied"),
        round(dsumExact(dec(adultOcc) + dec(pedOcc)) * 100.0 /
          when(dsum(adultBeds) + dsum(pedBeds) === 0, lit(null))
            .otherwise(dsum(adultBeds) + dsum(pedBeds)), 1).as("pct_occupied"))
      .orderBy(col("collection_week"))
  }

  /** Q3 (report:319-331): latest rating per facility × latest-week usage. */
  def qualityVsUsage: DataFrame = {
    val w = Window.partitionBy(col("facility_id"))
      .orderBy(col("rating_date").desc, col("quality_rating").desc_nulls_last)
    val latestRating = quality.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("facility_id"), col("quality_rating"))
    val latestRows = weekly.join(broadcast(latestWeek),
      col("collection_week") === col("latest_week"))
    latestRating.join(latestRows, col("facility_id") === col("hospital_weekly_id"))
      .groupBy(col("quality_rating"))
      .agg(dsumExact(dec(adultOcc) + dec(pedOcc)).as("beds_in_use"),
        countDistinct(col("hospital_weekly_id")).as("n_hospitals"))
      .orderBy(col("quality_rating").asc_nulls_first)
  }

  /** Q4 (report:333-343): total beds used per week (NULL-propagating a+b). */
  def bedsUsedPerWeek: DataFrame =
    weekly.groupBy(col("collection_week"))
      .agg(dsumExact(dec(adultOcc) + dec(pedOcc)).as("beds_used"))
      .orderBy(col("collection_week"))

  /** Q5 (report:346-352): covid beds per week. */
  def covidPerWeek: DataFrame =
    weekly.groupBy(col("collection_week"))
      .agg(dsum(covidBeds).as("covid_beds"))
      .orderBy(col("collection_week"))

  /** Q6 (report:356-367): 10 states with fewest open beds at latest week. */
  def fewestOpenBedsByState: DataFrame = {
    val latestRows = weekly.join(broadcast(latestWeek),
      col("collection_week") === col("latest_week"))
    latestRows.join(broadcast(hospitalState), col("hospital_weekly_id") === col("hospital_pk"))
      .groupBy(col("state"))
      .agg(dsumExact(dec(adultBeds) + dec(pedBeds) - dec(adultOcc) - dec(pedOcc))
        .as("open_beds"))
      .orderBy(col("open_beds").asc_nulls_last, col("state"))
      .limit(10)
  }

  /** Q7 (report:371-383): 10 hospitals (alphabetical) that stopped
    * reporting — MAX(week) < latest; never-reporters NULL-dropped. */
  def nonReporting: DataFrame = {
    val all = spark.read.parquet(s"$storeDir/weekly_report") // unfiltered join side
    hospital.join(all, col("hospital_pk") === col("hospital_weekly_id"), "left")
      .groupBy(col("hospital_pk"), col("hospital_name"))
      .agg(max(col("collection_week")).as("last_reported"))
      .crossJoin(broadcast(latestWeek))
      .filter(col("last_reported") < col("latest_week"))
      .select(col("hospital_pk"), col("hospital_name"), col("last_reported"))
      .orderBy(col("hospital_name").asc, col("hospital_pk"))
      .limit(10)
  }

  /** Q8 (report:386-401): utilization grid per (week, state). */
  def utilizationByState: DataFrame =
    weekly.join(broadcast(hospitalState), col("hospital_weekly_id") === col("hospital_pk"))
      .groupBy(col("collection_week"), col("state"))
      .agg(round(dsumExact(dec(adultOcc) + dec(pedOcc)) * 100.0 /
        when(dsumExact(dec(adultBeds) + dec(pedBeds)) === 0, lit(null))
          .otherwise(dsumExact(dec(adultBeds) + dec(pedBeds))), 1)
        .as("pct_utilization"))
      .orderBy(col("collection_week"), col("state"))

  /** generate_report (report:406-491): all eight, keyed like the reference. */
  def all: Map[String, DataFrame] = Map(
    "records_per_week" -> recordsPerWeek,
    "beds_summary" -> bedsSummary,
    "quality_vs_usage" -> qualityVsUsage,
    "beds_used_per_week" -> bedsUsedPerWeek,
    "covid_per_week" -> covidPerWeek,
    "fewest_open_beds" -> fewestOpenBedsByState,
    "non_reporting" -> nonReporting,
    "utilization_by_state" -> utilizationByState)
}
