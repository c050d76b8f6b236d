package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial boundary inputs for the temporal family (round 10, the
  * SessionBoundarySpec lesson generalized): testdata's random µs spacing
  * never lands two events on the exact boundary an operator's comparison
  * rule turns on, so the DuckDB oracles alone can't falsify an off-by-one
  * there. Each test drives the REGISTERED query (through the Tables
  * loader and a written parquet dir, same as Verify) on inputs where
  * every inclusive/exclusive edge is occupied, and pins the row that
  * distinguishes <= from <, >= from >, and the window-edge membership.
  */
class TemporalBoundarySpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1700000000000000L // µs
  private val HourUs = 3600L * 1000000L

  /** (event_id, ts_us, user_id, event_type, value).
    * user 1: views v1@T0, v2@T0+10s; purchases p1@T0+10s (TIE with v2),
    *   p2@T0+20s; v3@T0+30s (after both purchases).
    * user 2: purchase p3 with no views at all.
    * user 3: purchase p4@T0+7230s (not hour-aligned) with views at the
    *   four window edges — exactly −1h (in), −1h−1µs (out), exactly p4
    *   (in), +1µs (out) — plus one mid-window; purchase p5 far away with
    *   zero views inside its window. */
  private val rows: Seq[(Long, Long, Long, String, Double)] = {
    val p4 = T0 + 7230L * 1000000L
    Seq(
      (1L, T0, 1L, "view", 1.0),
      (2L, T0 + 10L * 1000000L, 1L, "view", 2.0),
      (3L, T0 + 10L * 1000000L, 1L, "purchase", 100.0),
      (4L, T0 + 20L * 1000000L, 1L, "purchase", 100.0),
      (5L, T0 + 30L * 1000000L, 1L, "view", 3.0),
      (6L, T0, 2L, "purchase", 100.0),
      (10L, p4 - HourUs, 3L, "view", 4.0),
      (11L, p4 - HourUs - 1L, 3L, "view", 5.0),
      (12L, p4, 3L, "view", 6.0),
      (13L, p4 + 1L, 3L, "view", 7.0),
      (14L, p4 - 1800L * 1000000L, 3L, "view", 8.0),
      (15L, p4, 3L, "purchase", 100.0),
      (16L, p4 + 100000L * 1000000L, 3L, "purchase", 100.0)
    )
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("temporal-edge").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  /** Brute-force reference: purchases × views with an explicit predicate,
    * reduced per purchase by min/max over (v_tus, v_eid) — the packed
    * order both registered plans' tie-break documents. */
  private def brute(forward: Boolean): Seq[(Long, Long, Long, Option[Long], Option[Double])] = {
    val ev = rows.map { case (id, us, u, t, v) => (id, us, u, t, v) }
    val purchases = ev.filter(_._4 == "purchase")
    val views = ev.filter(_._4 == "view")
    purchases.map { p =>
      val matching = views.filter(v => v._3 == p._3 &&
        (if (forward) v._2 >= p._2 else v._2 <= p._2))
      val pick =
        if (matching.isEmpty) None
        else if (forward) Some(matching.minBy(v => (v._2, v._1)))
        else Some(matching.maxBy(v => (v._2, v._1)))
      (p._1, p._3, p._2, pick.map(_._2), pick.map(_._5))
    }.sortBy(_._1)
  }

  private def collected(name: String): Seq[(Long, Long, Long, Option[Long], Option[Double])] =
    q(name)
      .select($"event_id", $"user_id", $"purchase_tus", $"view_tus", $"view_value")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect().toSeq.sortBy(_._1)

  test("x15 as-of: tie at equal timestamp attributes (<= is inclusive); no-view purchase is NULL") {
    val got = collected("x15_asof_join")
    assert(got === brute(forward = false))
    // p1 ties with v2 at the same microsecond → attributed to v2, not v1
    assert(got.find(_._1 == 3L).get._4 === Some(T0 + 10L * 1000000L))
    // user 2 has no views → LEFT row with NULL attribution survives
    assert(got.find(_._1 == 6L).get._4 === None)
    // v3 is 10s AFTER p2 → must NOT be picked backward
    assert(got.find(_._1 == 4L).get._4 === Some(T0 + 10L * 1000000L))
  }

  test("x15b forward as-of: >= is inclusive at the tie; picks earliest follower") {
    val got = collected("x15b_asof_forward")
    assert(got === brute(forward = true))
    // p1's earliest at-or-after view is v2 at the SAME microsecond
    assert(got.find(_._1 == 3L).get._4 === Some(T0 + 10L * 1000000L))
    // p2's earliest follower is v3
    assert(got.find(_._1 == 4L).get._4 === Some(T0 + 30L * 1000000L))
    // user 2: no views at all → NULL
    assert(got.find(_._1 == 6L).get._4 === None)
  }

  test("x20 interval count: both window edges inclusive, ±1µs excluded, bucket seam covered") {
    val got = q("x20_interval_count")
      .select($"event_id", $"n_views_1h")
      .as[(Long, Long)].collect().toMap
    // p4's window [p4-1h, p4]: edge views 10 (exactly -1h) and 12
    // (exactly p4) are IN, 11 (-1h-1µs) and 13 (+1µs) are OUT, 14 is in
    assert(got(15L) === 3L)
    // p5: user 3 has views, but none within its window → 0, row kept
    assert(got(16L) === 0L)
    // user 2's no-view purchase also keeps its LEFT row at 0
    assert(got(6L) === 0L)
    // user 1: p1 sees v1,v2 (tie in); p2 sees v1,v2
    assert(got(3L) === 2L && got(4L) === 2L)
    // oracle SQL agrees on this adversarial input (BETWEEN is inclusive
    // on both ends, COUNT(v.tus) keeps the empty-window rows)
    Tables.events(spark, dir).createOrReplaceTempView("events")
    try {
      val viaSql = spark.sql(
        SparkEntry.oracleSql("x20_interval_count").replace("epoch_us(ts)", "unix_micros(ts)"))
        .select($"event_id", $"n_views_1h").as[(Long, Long)].collect().toMap
      assert(viaSql === got)
    } finally spark.catalog.dropTempView("events")
  }

  test("w5 trailing-30d RANGE window: exactly-30-days is IN, 31 is OUT, same-day orders are peers") {
    val d = Files.createTempDirectory("w5-edge").toString
    val base = java.sql.Date.valueOf("1995-01-01")
    def plus(days: Int): java.sql.Date =
      java.sql.Date.valueOf(base.toLocalDate.plusDays(days.toLong))
    // cust 1: day 0 (10), day 30 (20: 0 is exactly 30 back → IN),
    //         day 61 (40: 30 is 31 back → OUT)
    // cust 2: two same-day orders (peers must both see both) + day 30+1
    Seq(
      (1L, 1L, plus(0), 10.0), (2L, 1L, plus(30), 20.0), (3L, 1L, plus(61), 40.0),
      (4L, 2L, plus(0), 1.0), (5L, 2L, plus(0), 2.0), (6L, 2L, plus(31), 4.0)
    ).toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", $"d".cast("timestamp")).drop("d")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("w5_trailing_30d_spend")(spark, d)
      .select($"o_orderkey", $"spend_30d")
      .as[(Long, Double)].collect().toMap
    assert(got === Map(
      1L -> 10.0, 2L -> 30.0, 3L -> 40.0, // exactly-30 in; 31 out
      4L -> 3.0, 5L -> 3.0,               // same-day peers share the frame
      6L -> 4.0))                         // 31 days after the peers → out
  }

  test("x94 islands: overlap merges, half-open touching merges, gaps split") {
    val d = Files.createTempDirectory("x94-edge").toString
    def li(ok: Long, supp: Long, ln: Int, ship: String, qty: Double) =
      (ok, 1L, supp, ln, qty, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf(s"$ship 00:00:00"))
    // supp 1: [0,2) ∪ [1,3) overlap-merge; [3,5) TOUCHES 3 (half-open →
    // merges); [10,12) gap → 2 islands, covered (5-0)+(12-10)=7, longest 5
    // supp 2: single [0,1)
    Seq(
      li(1L, 1L, 1, "1970-01-01", 2.0), li(2L, 1L, 1, "1970-01-02", 2.0),
      li(3L, 1L, 1, "1970-01-04", 2.0), li(4L, 1L, 1, "1970-01-11", 2.0),
      li(5L, 2L, 1, "1970-01-01", 1.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = analytics.Temporal.intervalCoverage.fn(spark, d)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(1L -> ((2L, 7L, 5L)), 2L -> ((1L, 1L, 1L))))
  }

  test("x127 peak: end-exclusive handoff never double-counts; nested intervals stack") {
    val d = Files.createTempDirectory("x127-edge").toString
    def li(ok: Long, supp: Long, ln: Int, ship: String, qty: Double) =
      (ok, 1L, supp, ln, qty, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf(s"$ship 00:00:00"))
    // supp 1: [0,10) [5,15) [10,20) — at day 10 the first interval's
    // END closes BEFORE the third's start opens (delta sorts -1 first),
    // so live never hits 3: peak 2, first reached day 5
    // supp 2: nested [0,10) [2,8) [4,6): peak 3 at day 4
    Seq(
      li(1L, 1L, 1, "1970-01-01", 10.0), li(2L, 1L, 1, "1970-01-06", 10.0),
      li(3L, 1L, 1, "1970-01-11", 10.0),
      li(4L, 2L, 1, "1970-01-01", 10.0), li(5L, 2L, 1, "1970-01-03", 6.0),
      li(6L, 2L, 1, "1970-01-05", 2.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = analytics.Temporal.peakConcurrency.fn(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((2L, 3L, 4L), (1L, 2L, 5L)))
  }

  test("x107 dwell: successor crosses event types; terminal events excluded from mean") {
    val d = Files.createTempDirectory("x107-edge").toString
    // user 1: view@0s → purchase@40s → (terminal): view dwell 40s, the
    // purchase row counts but adds no dwell. user 2: single view (terminal).
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:00:40", 1L, "purchase"),
      (3L, "2024-02-01 00:00:00", 2L, "view"))
      .map { case (id, ts, u, et) =>
        (id, java.sql.Timestamp.valueOf(ts), u, et, 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = analytics.Temporal.dwellTime.fn(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(5))))).toMap
    assert(got("view") === ((2L, 1L, Some(40000000L), Some(40000000.0))))
    assert(got("purchase") === ((1L, 0L, None, None)))
  }

  test("x94 plan: both windows share the suppkey partitioning — never global") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = analytics.Temporal.intervalCoverage.fn(spark, sf)
    df.count()
    val windows = flattenPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty))
  }

  test("x121 trailing distinct: cross-week dedup, window membership, high-water clip") {
    // weeks are Monday-truncated; 2024-01-01 is a Monday. Tuesdays noon:
    val w1 = 1704196800000000L // 2024-01-02T12:00Z, week 2024-01-01
    val wkUs = 604800L * 1000000L
    val d = Files.createTempDirectory("temporal-x121").toString
    Seq(
      // view u1 active in weeks 1 AND 2 -> every window holding both
      // weeks must count u1 ONCE; coverage spans window-ends w1..w5
      (1L, w1, 1L, "view", 1.0),
      (2L, w1 + wkUs, 1L, "view", 1.0),
      // view u2 active in week 5 = the global high-water week: windows
      // ending past w5 are clipped away entirely
      (3L, w1 + 4 * wkUs, 2L, "view", 1.0),
      // click u3 in week 1 only -> ends w1..w4 (all within high water)
      (4L, w1, 3L, "click", 1.0))
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = analytics.Temporal.trailingDistinct.fn(spark, d)
      .select($"event_type", $"end_wk".cast("string"), $"distinct_users")
      .as[(String, String, Long)].collect().toSeq
    val wk = (i: Int) => java.time.LocalDate.of(2024, 1, 1).plusWeeks(i - 1).toString
    assert(got === Seq(
      ("click", wk(1), 1L), ("click", wk(2), 1L), ("click", wk(3), 1L),
      ("click", wk(4), 1L),
      ("view", wk(1), 1L), ("view", wk(2), 1L), ("view", wk(3), 1L),
      ("view", wk(4), 1L), ("view", wk(5), 2L)))
  }
}
