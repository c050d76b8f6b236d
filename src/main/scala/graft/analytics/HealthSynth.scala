package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-verified registration of the reference's 8 report queries
  * (`weekly-report.py:269-403`): a deterministic synthetic hospital
  * store derived FROM the testdata tables (so the DuckDB oracle can
  * rebuild it with the same SQL), fed through the REAL
  * [[HealthReport]] query objects — the exact plans the fixture-ingest
  * path runs, now hash-checked end-to-end by the driver rather than
  * only by HealthReportSpec.
  *
  * Derivation (identical in both engines, column-for-column):
  * - hospital: one row per `c_custkey % 100` (ids H000–H099), located
  *   at the group's MIN nationkey.
  * - location: nation ⋈ region (city = n_name, state = r_name).
  * - weekly_report: one row per (hospital, week) from orders — the
  *   first order (by orderkey) in each (custkey%100, week) cell;
  *   metric values are small `o_orderkey % m` integers with sentinel
  *   NULLs on other moduli so every NULL-propagation path is
  *   exercised. Hospitals 80–99 never report (Q7's never-reporter
  *   NULL-drop) and 60–79 stop before 1997 (Q7's non-empty answer).
  * - hospital_quality: two ratings per facility with engineered
  *   rating_date ties and NULL ratings (Q3's DISTINCT ON tie-break
  *   and NULL rating group).
  *
  * asOf = 1998-06-30, mid-range of the orders dates (1995-01..2001-08), so the ≤asOf
  * filter and the weeklyAll/weekly split both bite. */
object HealthSynth {

  val AsOf: java.sql.Date = java.sql.Date.valueOf("1998-06-30")

  // ---- Spark-side store derivation ----------------------------------

  private def hk(c: org.apache.spark.sql.Column) =
    concat(lit("H"), lpad((c % 100).cast("string"), 3, "0"))

  private[analytics] def hospital(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy((col("c_custkey") % 100).as("k"))
      .agg(min(col("c_nationkey")).as("nk"))
      .select(
        concat(lit("H"), lpad(col("k").cast("string"), 3, "0")).as("hospital_pk"),
        concat(lit("Hospital "), col("k").cast("string")).as("hospital_name"),
        col("nk").cast("long").as("location_id"))

  private[analytics] def location(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name").as("city"), col("r_name").as("state"),
        col("n_nationkey").cast("long").as("location_id"))

  private[analytics] def weeklyReport(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .filter(col("o_custkey") % 100 < 80 &&
        (col("o_custkey") % 100 < 60 ||
          col("o_orderdate") < lit("1997-01-01").cast("date")))
      .select(hk(col("o_custkey")).as("hospital_weekly_id"),
        to_date(date_trunc("week", col("o_orderdate"))).as("collection_week"),
        col("o_orderkey"))
    val w = Window.partitionBy(col("hospital_weekly_id"), col("collection_week"))
      .orderBy(col("o_orderkey"))
    def m(mod: Int, nullMod: Int) =
      when(col("o_orderkey") % nullMod === 0, lit(null))
        .otherwise((col("o_orderkey") % mod).cast("double"))
    base.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("hospital_weekly_id"), col("collection_week"),
        m(100, 11).as(graft.ingest.HhsLoad.MetricCols(0)),
        m(50, 13).as(graft.ingest.HhsLoad.MetricCols(1)),
        (col("o_orderkey") % 60).cast("double").as(graft.ingest.HhsLoad.MetricCols(2)),
        m(30, 17).as(graft.ingest.HhsLoad.MetricCols(3)),
        m(20, 19).as(graft.ingest.HhsLoad.MetricCols(6)))
  }

  private[analytics] def quality(s: SparkSession, dir: String): DataFrame = {
    val ks = Tables.customer(s, dir)
      .select((col("c_custkey") % 100).as("k")).distinct()
    val fid = concat(lit("H"), lpad(col("k").cast("string"), 3, "0")).as("facility_id")
    val r1 = ks.select(fid,
      when(col("k") % 9 === 0, lit(null))
        .otherwise(col("k") % 5 + 1).cast("int").as("quality_rating"),
      lit("2022-01-01").cast("date").as("rating_date"))
    val r2 = ks.select(fid,
      (col("k") * 2 % 5 + 1).cast("int").as("quality_rating"),
      when(col("k") % 4 === 0, lit("2022-01-01")).otherwise(lit("2021-06-01"))
        .cast("date").as("rating_date"))
    r1.unionByName(r2)
  }

  private def report(s: SparkSession, dir: String): HealthReport =
    HealthReport.onTables(s, Map(
      "weekly_report" -> weeklyReport(s, dir),
      "hospital" -> hospital(s, dir),
      "hospital_quality" -> quality(s, dir),
      "location" -> location(s, dir)), AsOf)

  // ---- DuckDB-side store derivation (shared CTE prelude) ------------

  /** Metric column SQL names, kept short; aliases must match Spark. */
  private val M = graft.ingest.HhsLoad.MetricCols

  private val StoreCtes: String = {
    def m(mod: Int, nullMod: Int, as: String) =
      s"CASE WHEN o_orderkey % $nullMod = 0 THEN NULL " +
        s"ELSE CAST(o_orderkey % $mod AS DOUBLE) END AS $as"
    s"""hosp AS MATERIALIZED (
       |  SELECT 'H' || lpad(CAST(k AS VARCHAR), 3, '0') AS hospital_pk,
       |         'Hospital ' || CAST(k AS VARCHAR) AS hospital_name,
       |         CAST(nk AS BIGINT) AS location_id
       |  FROM (SELECT c_custkey % 100 AS k, MIN(c_nationkey) AS nk
       |        FROM customer GROUP BY 1)),
       |loc AS MATERIALIZED (
       |  SELECT n_name AS city, r_name AS state,
       |         CAST(n_nationkey AS BIGINT) AS location_id
       |  FROM nation JOIN region ON n_regionkey = r_regionkey),
       |hl AS MATERIALIZED (
       |  SELECT h.hospital_pk, h.hospital_name, l.city, l.state
       |  FROM hosp h JOIN loc l ON h.location_id = l.location_id),
       |wk0 AS MATERIALIZED (
       |  SELECT 'H' || lpad(CAST(o_custkey % 100 AS VARCHAR), 3, '0')
       |           AS hospital_weekly_id,
       |         CAST(date_trunc('week', o_orderdate) AS DATE) AS collection_week,
       |         o_orderkey,
       |         ROW_NUMBER() OVER (
       |           PARTITION BY o_custkey % 100, date_trunc('week', o_orderdate)
       |           ORDER BY o_orderkey) AS rn
       |  FROM orders
       |  WHERE o_custkey % 100 < 80
       |    AND (o_custkey % 100 < 60 OR o_orderdate < DATE '1997-01-01')),
       |wkA AS MATERIALIZED (
       |  SELECT hospital_weekly_id, collection_week,
       |    ${m(100, 11, M(0))},
       |    ${m(50, 13, M(1))},
       |    CAST(o_orderkey % 60 AS DOUBLE) AS ${M(2)},
       |    ${m(30, 17, M(3))},
       |    ${m(20, 19, M(6))}
       |  FROM wk0 WHERE rn = 1),
       |wkF AS MATERIALIZED (
       |  SELECT * FROM wkA WHERE collection_week <= DATE '1998-06-30'),
       |lw AS MATERIALIZED (
       |  SELECT MAX(collection_week) AS latest_week FROM wkF),
       |qual AS MATERIALIZED (
       |  SELECT 'H' || lpad(CAST(k AS VARCHAR), 3, '0') AS facility_id,
       |         CASE WHEN k % 9 = 0 THEN NULL
       |              ELSE CAST(k % 5 + 1 AS INTEGER) END AS quality_rating,
       |         DATE '2022-01-01' AS rating_date
       |  FROM (SELECT DISTINCT c_custkey % 100 AS k FROM customer)
       |  UNION ALL
       |  SELECT 'H' || lpad(CAST(k AS VARCHAR), 3, '0'),
       |         CAST(k * 2 % 5 + 1 AS INTEGER),
       |         CASE WHEN k % 4 = 0 THEN DATE '2022-01-01'
       |              ELSE DATE '2021-06-01' END
       |  FROM (SELECT DISTINCT c_custkey % 100 AS k FROM customer))""".stripMargin
  }

  private def dsum(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"
  private def dsum2(a: String, b: String) =
    s"CAST(SUM(CAST($a AS DECIMAL(12,2)) + CAST($b AS DECIMAL(12,2))) AS DOUBLE)"
  private def pct(numA: String, numB: String, denA: String, denB: String) =
    s"ROUND(${dsum2(numA, numB)} * CAST(100 AS DOUBLE) / " +
      s"NULLIF(${dsum2(denA, denB)}, 0), 1)"

  // ---- the 8 registered queries -------------------------------------

  val recordsSummary = Q.withOracle(
    "hr1_hospital_records_summary",
    "reference report Q1: hospitals reporting per week + WoW delta (weekly-report.py:270-287)",
    s"""WITH $StoreCtes
       |SELECT collection_week, hospital_count,
       |  COALESCE(LAG(hospital_count) OVER (ORDER BY collection_week), 0)
       |    AS previous_week_count,
       |  hospital_count -
       |    COALESCE(LAG(hospital_count) OVER (ORDER BY collection_week), 0)
       |    AS week_difference
       |FROM (SELECT collection_week,
       |        COUNT(DISTINCT hospital_weekly_id) AS hospital_count
       |      FROM wkF GROUP BY 1)
       |ORDER BY collection_week DESC""".stripMargin)(
    (s, dir) => report(s, dir).recordsPerWeek)

  val bedsSummary = Q.withOracle(
    "hr2_beds_summary",
    "reference report Q2: five bed sums over the 5 most recent weeks (weekly-report.py:288-307)",
    s"""WITH $StoreCtes,
       |recent AS (SELECT DISTINCT collection_week FROM wkF
       |           ORDER BY collection_week DESC LIMIT 5)
       |SELECT w.collection_week,
       |  ${dsum(M(0))} AS total_adult_beds_available,
       |  ${dsum(M(1))} AS total_pediatric_beds_available,
       |  ${dsum(M(2))} AS total_adult_beds_occupied,
       |  ${dsum(M(3))} AS total_pediatric_beds_occupied,
       |  ${dsum(M(6))} AS total_covid_beds_used
       |FROM wkF w JOIN recent r ON w.collection_week = r.collection_week
       |GROUP BY 1 ORDER BY 1 DESC""".stripMargin)(
    (s, dir) => report(s, dir).bedsSummary)

  val bedsUtilization = Q.withOracle(
    "hr3_beds_utilization",
    "reference report Q3: percent beds in use per latest quality rating (weekly-report.py:308-334)",
    s"""WITH $StoreCtes,
       |lr AS MATERIALIZED (
       |  SELECT facility_id, quality_rating FROM (
       |    SELECT facility_id, quality_rating,
       |      ROW_NUMBER() OVER (PARTITION BY facility_id
       |        ORDER BY rating_date DESC, quality_rating DESC NULLS LAST) AS rn
       |    FROM qual) WHERE rn = 1),
       |latest AS MATERIALIZED (
       |  SELECT w.* FROM wkA w, lw WHERE w.collection_week = lw.latest_week)
       |SELECT r.quality_rating,
       |  ${pct(M(2), M(3), M(0), M(1))} AS percent_beds_in_use
       |FROM lr r JOIN latest w ON r.facility_id = w.hospital_weekly_id
       |GROUP BY 1 ORDER BY quality_rating ASC NULLS FIRST""".stripMargin)(
    (s, dir) => report(s, dir).qualityVsUsage)

  val weeklyBedsUsed = Q.withOracle(
    "hr4_weekly_beds_used",
    "reference report Q4: NULL-propagating total + covid beds per week (weekly-report.py:335-346)",
    s"""WITH $StoreCtes
       |SELECT collection_week,
       |  ${dsum2(M(2), M(3))} AS total_beds_used,
       |  ${dsum(M(6))} AS covid_beds_used
       |FROM wkF GROUP BY 1 ORDER BY collection_week""".stripMargin)(
    (s, dir) => report(s, dir).bedsUsedPerWeek)

  val covidByState = Q.withOracle(
    "hr5_covid_cases_by_state",
    "reference report Q5: covid beds per state over all weeks (weekly-report.py:347-358)",
    s"""WITH $StoreCtes
       |SELECT h.state, ${dsum(M(6))} AS total_covid_cases
       |FROM wkA w JOIN hl h ON w.hospital_weekly_id = h.hospital_pk
       |GROUP BY 1 ORDER BY state""".stripMargin)(
    (s, dir) => report(s, dir).covidByState)

  val fewestOpenBeds = Q.withOracle(
    "hr6_states_fewest_open_beds",
    "reference report Q6: SUM(a+p) - SUM(ao+po), two NULL-propagating sums (weekly-report.py:359-372)",
    s"""WITH $StoreCtes,
       |latest AS MATERIALIZED (
       |  SELECT w.* FROM wkA w, lw WHERE w.collection_week = lw.latest_week)
       |SELECT h.state,
       |  ${dsum2(M(0), M(1))} - ${dsum2(M(2), M(3))} AS open_beds
       |FROM latest w JOIN hl h ON w.hospital_weekly_id = h.hospital_pk
       |GROUP BY 1 ORDER BY open_beds ASC NULLS LAST, state LIMIT 10""".stripMargin)(
    (s, dir) => report(s, dir).fewestOpenBedsByState)

  val notReporting = Q.withOracle(
    "hr7_hospitals_not_reporting",
    "reference report Q7: HAVING MAX(week) < latest, never-reporters NULL-drop (weekly-report.py:373-386)",
    s"""WITH $StoreCtes
       |SELECT hospital_name, city, state, last_reported_week FROM (
       |  SELECT h.hospital_name, h.city, h.state,
       |         MAX(w.collection_week) AS last_reported_week
       |  FROM hl h LEFT JOIN wkA w ON h.hospital_pk = w.hospital_weekly_id
       |  GROUP BY 1, 2, 3) g, lw
       |WHERE g.last_reported_week < lw.latest_week
       |ORDER BY hospital_name ASC, city, state LIMIT 10""".stripMargin)(
    (s, dir) => report(s, dir).nonReporting)

  val utilizationByState = Q.withOracle(
    "hr8_utilization_by_state",
    "reference report Q8: percent utilization per (week, state) (weekly-report.py:387-403)",
    s"""WITH $StoreCtes
       |SELECT w.collection_week, h.state,
       |  ${pct(M(2), M(3), M(0), M(1))} AS percent_utilization
       |FROM wkF w JOIN hl h ON w.hospital_weekly_id = h.hospital_pk
       |GROUP BY 1, 2 ORDER BY collection_week, state""".stripMargin)(
    (s, dir) => report(s, dir).utilizationByState)

  val all: Seq[Q] = Seq(recordsSummary, bedsSummary, bedsUtilization,
    weeklyBedsUsed, covidByState, fewestOpenBeds, notReporting,
    utilizationByState)
}
