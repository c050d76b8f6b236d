package graft.model

import graft.ingest.HhsLoad
import org.apache.spark.sql.types._

/** The reference DDL (Phase1_updated.ipynb cells 4/7/10/13) as Spark
  * schemas — the store's contract. SERIAL ids are 64-bit hash surrogates
  * here (SURVEY.md §1.2). */
object StoreSchemas {

  val location: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zip_code", StringType),
    StructField("address", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("fips_code", StringType),
    StructField("location_id", LongType)))

  val hospital: StructType = StructType(Seq(
    StructField("hospital_pk", StringType),
    StructField("hospital_name", StringType),
    StructField("location_id", LongType)))

  val hospitalQuality: StructType = StructType(Seq(
    StructField("facility_id", StringType),
    StructField("quality_rating", IntegerType),
    StructField("rating_date", DateType),
    StructField("ownership", StringType),
    StructField("hospital_type", StringType),
    StructField("provides_emergency_services", BooleanType)))

  val weeklyReport: StructType = StructType(
    Seq(
      StructField("hospital_weekly_id", StringType),
      StructField("collection_week", DateType)) ++
      HhsLoad.MetricCols.map(c => StructField(c, DoubleType)))

  val byName: Map[String, StructType] = Map(
    "location" -> location,
    "hospital" -> hospital,
    "hospital_quality" -> hospitalQuality,
    "weekly_report" -> weeklyReport)
}
