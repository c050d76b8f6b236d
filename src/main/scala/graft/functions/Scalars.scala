package graft.functions

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.7, F1-F10) — all native Column
  * expressions, zero UDFs, exactly as §2.8 prescribes: every one of the
  * reference's "custom functions" (geocode destructure, rating parse,
  * boolean parse) compiles to codegen'd Catalyst expressions here.
  */
object Scalars {
  import Parity._

  /** F1+F2+F3: WKT `POINT (x y)` destructure — build the reference's
    * geocoded string shape from columns, then split it back into two
    * doubles via regexp groups (helper_load_hhs.py:60-63). */
  val f1 = Q.withOracle(
    "f1_wkt_point_split",
    "F1/F2/F3: WKT POINT string build + regex destructure + cast",
    """SELECT p_partkey,
      |  'POINT (' || p_partkey || ' ' || p_size || ')' AS wkt,
      |  CAST(regexp_extract('POINT (' || p_partkey || ' ' || p_size || ')',
      |    'POINT \(([-0-9.]+) ([-0-9.]+)\)', 1) AS DOUBLE) AS lon,
      |  CAST(regexp_extract('POINT (' || p_partkey || ' ' || p_size || ')',
      |    'POINT \(([-0-9.]+) ([-0-9.]+)\)', 2) AS DOUBLE) AS lat
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val wkt = concat(lit("POINT ("), col("p_partkey").cast("string"), lit(" "),
      col("p_size").cast("string"), lit(")"))
    val pat = "POINT \\(([-0-9.]+) ([-0-9.]+)\\)"
    Tables.part(s, dir)
      .select(col("p_partkey"), wkt.as("wkt"),
        regexp_extract(wkt, pat, 1).cast("double").as("lon"),
        regexp_extract(wkt, pat, 2).cast("double").as("lat"))
      .orderBy(col("p_partkey"))
  }

  /** F4+F5+F9+F10: date parse/format round-trip and date arithmetic —
    * `%Y-%m-%d` parse (helper_load_hhs.py:67), minus-one-week
    * (weekly-report.py:414), back to ISO string (weekly-report.py:416). */
  val f4 = Q.withOracle(
    "f4_date_roundtrip",
    "F4/F5/F9/F10: to_date/date_sub/ISO-format round-trip",
    s"""SELECT o_orderkey, ${sql.day("o_orderdate")} AS order_day,
       |  CAST(${sql.day("o_orderdate")} AS VARCHAR) AS iso,
       |  CAST(CAST(${sql.day("o_orderdate")} AS VARCHAR) AS DATE) AS reparsed,
       |  ${sql.day("o_orderdate")} - 7 AS prev_week
       |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val d = day(col("o_orderdate"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), d.as("order_day"),
        d.cast("string").as("iso"),
        to_date(d.cast("string"), "yyyy-MM-dd").as("reparsed"),
        date_sub(d, 7).as("prev_week"))
      .orderBy(col("o_orderkey"))
  }

  /** S4-adjacent: semi-structured JSON column parsing with a declared
    * schema (`from_json`) — the engine-side analog of the reference's
    * JSON fetch (weekly-report.py:140-147; the HTTP part stays a viz
    * concern per SURVEY §2.1). */
  val s4 = Q.withOracle(
    "s4_json_parse",
    "S4: typed JSON extraction from a string column",
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS k_decile,
      |  COUNT(*) AS n,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType)))).getField("k")
    Tables.events(s, dir)
      .select(k.as("k"))
      .groupBy(floor(col("k") / 10).cast("int").as("k_decile"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("k_decile"))
  }

  val all: Seq[Q] = Seq(f1, f4, s4)
}
