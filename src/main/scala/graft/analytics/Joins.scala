package graft.analytics

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.4, J1-J6) plus the set operations the
  * engine gets for free (§2.6). The reference let Postgres choose join
  * algorithms; here Catalyst chooses, with explicit `broadcast()` hints on
  * genuinely small sides (dims, top-k derived tables) so the 100 TB plan
  * never sort-merge-shuffles a 5-row table against a fact.
  */
object Joins {
  import Parity._

  /** J1: fact ⋈ tiny derived table (top-5 recent weeks CTE) — broadcast.
    * Ref: weekly-report.py:289-304. */
  val j1 = Q.withOracle(
    "j1_recent_weeks_join",
    "J1: broadcast join against top-5-weeks derived table",
    s"""WITH recent AS (SELECT DISTINCT ${sql.week("l_shipdate")} AS wk
       |  FROM lineitem ORDER BY wk DESC LIMIT 5)
       |SELECT r.wk, ${sql.dsum("l_quantity")} AS sum_qty, COUNT(*) AS n_lines
       |FROM lineitem l JOIN recent r ON ${sql.week("l.l_shipdate")} = r.wk
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir).withColumn("li_wk", week(col("l_shipdate")))
    val recent = li.select(col("li_wk").as("wk")).distinct()
      .orderBy(col("wk").desc).limit(5)
    li.join(broadcast(recent), col("li_wk") === col("wk"))
      .groupBy(col("wk"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
      .orderBy(col("wk"))
  }

  /** J2: fact ⋈ fact equi-join on different key names.
    * Ref: weekly-report.py:326 (facility_id = hospital_weekly_id). */
  val j2 = Q.withOracle(
    "j2_orders_lineitem_join",
    "J2: fact-fact equi join, grouped rollup",
    s"""SELECT o_orderstatus,
       |  ${sql.revenueSum("l_extendedprice", "l_discount")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderstatus"))
  }

  /** J3: 2-hop FK dim chain, both dims broadcast.
    * Ref: weekly-report.py:349-350 (weekly_report ⋈ hospital ⋈ location). */
  val j3 = Q.withOracle(
    "j3_region_rollup",
    "J3: fact through customer→nation→region dim chain",
    s"""SELECT r_name, ${sql.dsum("o_totalprice")} AS sum_price, COUNT(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // customer scales with SF (15M rows at sf100) — no broadcast hint;
    // AQE picks runtime broadcast when it actually fits, sort-merge when
    // it doesn't. Only the bounded dims (nation=25, region=5) are hinted.
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))
  }

  /** J4: left outer join with NULL-extended aggregates coalesced.
    * Ref: weekly-report.py:376-377. */
  val j4 = Q.withOracle(
    "j4_customer_order_counts",
    "J4: left outer join, count/sum over NULL-extended rows",
    s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       |  COALESCE(${sql.dsum("o_totalprice")}, 0.0) AS spent
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spent"))
      .orderBy(col("c_custkey"))
  }

  private val RecentCutoff = "2001-01-01"

  /** J5: left semi join — "customers with recent activity" (EXISTS).
    * Ref: helper_load_hhs.py:134-138 bulk-key-lookup shape. */
  val j5 = Q.withOracle(
    "j5_active_customers_semi",
    "J5: left semi join (EXISTS)",
    s"""SELECT c_custkey, c_name FROM customer c
       |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
       |  AND ${sql.day("o.o_orderdate")} >= DATE '$RecentCutoff')
       |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val recent = Tables.orders(s, dir)
      .filter(day(col("o_orderdate")) >= lit(java.sql.Date.valueOf(RecentCutoff)))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** J6: left anti join — "customers with no recent activity" (NOT EXISTS),
    * the ON CONFLICT DO NOTHING shape. Ref: helper_load_hhs.py:96. */
  val j6 = Q.withOracle(
    "j6_inactive_customers_anti",
    "J6: left anti join (NOT EXISTS)",
    s"""SELECT c_custkey, c_name FROM customer c
       |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
       |  AND ${sql.day("o.o_orderdate")} >= DATE '$RecentCutoff')
       |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val recent = Tables.orders(s, dir)
      .filter(day(col("o_orderdate")) >= lit(java.sql.Date.valueOf(RecentCutoff)))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Set ops (§2.6): capability headroom beyond the reference. Segments
    * seen in low-key nations vs high-key nations. */
  private def segs(s: org.apache.spark.sql.SparkSession, dir: String, lo: Boolean) = {
    val c = Tables.customer(s, dir)
    val f = if (lo) col("c_nationkey") < 12 else col("c_nationkey") >= 12
    c.filter(f).select(col("c_mktsegment")).distinct()
  }

  val setUnion = Q.withOracle(
    "set_union_segments",
    "UNION (distinct) of two projected sets",
    """SELECT c_mktsegment FROM customer WHERE c_nationkey < 12
      |UNION
      |SELECT c_mktsegment FROM customer WHERE c_nationkey >= 12
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    segs(s, dir, lo = true).union(segs(s, dir, lo = false))
      .distinct().orderBy(col("c_mktsegment"))
  }

  val setIntersect = Q.withOracle(
    "set_intersect_segments",
    "INTERSECT of two projected sets",
    """SELECT c_mktsegment FROM customer WHERE c_nationkey < 12
      |INTERSECT
      |SELECT c_mktsegment FROM customer WHERE c_nationkey >= 12
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    segs(s, dir, lo = true).intersect(segs(s, dir, lo = false))
      .orderBy(col("c_mktsegment"))
  }

  /** Ship-weeks with no order activity — non-empty because shipments
    * trail the last order date. */
  val setExcept = Q.withOracle(
    "set_except_weeks",
    "EXCEPT of two projected sets",
    s"""SELECT ${sql.week("l_shipdate")} AS wk FROM lineitem
       |EXCEPT
       |SELECT ${sql.week("o_orderdate")} AS wk FROM orders
       |ORDER BY wk""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).select(week(col("l_shipdate")).as("wk"))
      .except(Tables.orders(s, dir).select(week(col("o_orderdate")).as("wk")))
      .orderBy(col("wk"))
  }

  /** Capability headroom beyond the reference (SURVEY §2.5 notes none):
    * ROLLUP subtotal hierarchy over the dim chain. */
  val rollup = Q.withOracle(
    "a12_rollup_region_nation",
    "GROUP BY ROLLUP (region, nation) with subtotal rows",
    s"""SELECT r_name, n_name, ${sql.dsum("c_acctbal")} AS total_balance,
       |  COUNT(*) AS n
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("total_balance"), count(lit(1)).as("n"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** a16: full CUBE over (priority, status) with GROUPING() ids — the
    * ids disambiguate "subtotal row" from "genuinely NULL key", which
    * raw NULLs cannot (A10's lesson generalized). GROUPING() is cast to
    * INT on both sides: Spark emits TINYINT, DuckDB BIGINT, and the
    * driver's hash is dtype-sensitive. */
  val cube = Q.withOracle(
    "a16_cube_priority_status",
    "A16: GROUP BY CUBE with GROUPING() ids",
    s"""SELECT o_orderpriority, o_orderstatus,
       |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
       |  ${sql.dsum("o_totalprice")} AS total_price, COUNT(*) AS n
       |FROM orders
       |GROUP BY CUBE (o_orderpriority, o_orderstatus)
       |ORDER BY g_pri, g_st, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""
      .stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping(col("o_orderpriority")).cast("int").as("g_pri"),
        grouping(col("o_orderstatus")).cast("int").as("g_st"),
        dsum(col("o_totalprice")).as("total_price"), count(lit(1)).as("n"))
      .orderBy(col("g_pri"), col("g_st"),
        col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** A20: GROUPING SETS — the general form behind rollup (a12) and cube
    * (a16), with an explicitly chosen set list. Spark's DataFrame API has
    * no grouping-sets builder, so this goes through the SQL surface —
    * same Aggregate(Expand) plan Catalyst produces for rollup/cube. */
  val groupingSets: Q = {
    val body =
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
         |  ${sql.dsum("o_totalprice")} AS total_price, COUNT(*) AS n
         |FROM %s
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
         |  (o_orderstatus), ())
         |ORDER BY g_st, g_pri, o_orderstatus NULLS FIRST,
         |  o_orderpriority NULLS FIRST""".stripMargin
    Q.withOracle(
      "a20_grouping_sets",
      "A20: GROUP BY GROUPING SETS with GROUPING() ids",
      body.format("orders")) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_a20")
      s.sql(body.format("orders_a20"))
    }
  }

  val all: Seq[Q] = Seq(j1, j2, j3, j4, j5, j6, setUnion, setIntersect, setExcept,
    rollup, cube, groupingSets)
}
