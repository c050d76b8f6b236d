package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x57 funnel: the oracle pins the counts on the real log; this pins the
  * ORDERING semantics on crafted sequences — stages out of order don't
  * count, same-microsecond ties resolve by event_id, interleaved noise
  * events are ignored, and a user can't skip a stage. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, String, Long, String)]): Unit =
    rows.map { case (id, ts, u, t) =>
      (id, Timestamp.valueOf(ts), u, t, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("order matters; ties resolve by event_id; noise is ignored") {
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    write(dir, Seq(
      // u1: full funnel in order (with noise between stages)
      (1L, "2024-01-01 10:00:00", 1L, "signup"),
      (2L, "2024-01-01 10:01:00", 1L, "error"),
      (3L, "2024-01-01 10:02:00", 1L, "view"),
      (4L, "2024-01-01 10:03:00", 1L, "purchase"),
      // u2: purchase BEFORE view - reaches stage 2 only
      (5L, "2024-01-02 10:00:00", 2L, "signup"),
      (6L, "2024-01-02 10:01:00", 2L, "purchase"),
      (7L, "2024-01-02 10:02:00", 2L, "view"),
      // u3: view+purchase at the SAME timestamp as signup - event_id
      // breaks the tie in funnel order, so the whole chain counts
      (8L, "2024-01-03 10:00:00", 3L, "signup"),
      (9L, "2024-01-03 10:00:00", 3L, "view"),
      (10L, "2024-01-03 10:00:00", 3L, "purchase"),
      // u4: never signs up - purchase/view alone reach nothing
      (11L, "2024-01-04 10:00:00", 4L, "view"),
      (12L, "2024-01-04 10:01:00", 4L, "purchase")))
    val got = analytics.Funnel.funnel.fn(spark, dir)
      .select($"stage", $"n_users").as[(Int, Long)].collect().toSeq
    // stage 1 (signup): u1,u2,u3; stage 2 (view after): u1,u2,u3; stage 3: u1,u3
    assert(got === Seq((1, 3L), (2, 3L), (3, 2L)))
  }

  test("monotone by construction on the real log") {
    val ns = analytics.Funnel.funnel.fn(spark, sf)
      .select($"n_users").as[Long].collect().toSeq
    assert(ns.size === 3 && ns === ns.sorted.reverse, s"funnel must be non-increasing: $ns")
    assert(ns.head > 0)
  }

  private def writeV(dir: String,
      rows: Seq[(Long, String, Long, String, Option[Double])]): Unit =
    rows.map { case (id, ts, u, t, v) =>
      (id, Timestamp.valueOf(ts), u, t, v.map(java.lang.Double.valueOf).orNull, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("x112 crafted: predecessor credit, first-event 'none', tiebreak, NULL value") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    writeV(dir, Seq(
      // u1: view → purchase(5.50) → purchase(2.00): view credits the
      // first conversion, the first purchase credits the second
      (1L, "2024-01-01 10:00:00", 1L, "view", Some(0.0)),
      (2L, "2024-01-01 10:01:00", 1L, "purchase", Some(5.50)),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", Some(2.00)),
      // u2: purchase is the user's FIRST event → 'none'; then a
      // click-attributed conversion with NULL value (counts, no money)
      (4L, "2024-01-02 10:00:00", 2L, "purchase", Some(1.25)),
      (5L, "2024-01-02 10:01:00", 2L, "click", Some(0.0)),
      (6L, "2024-01-02 10:02:00", 2L, "purchase", None),
      // u3: view and purchase at the SAME timestamp — event_id breaks
      // the tie, so the view is the predecessor
      (7L, "2024-01-03 11:00:00", 3L, "view", Some(0.0)),
      (8L, "2024-01-03 11:00:00", 3L, "purchase", Some(3.00))))
    val got = analytics.Funnel.attribution.fn(spark, dir)
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      ("click", 1L, None),
      ("none", 1L, Some(1.25)),
      ("purchase", 1L, Some(2.00)),
      ("view", 2L, Some(8.50))))
  }

  test("x112 real log: conversions are conserved and buckets are known types") {
    val rows = analytics.Funnel.attribution.fn(spark, sf)
      .as[(String, Long, Option[Double])].collect().toSeq
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(rows.map(_._2).sum === purchases, "every conversion attributed exactly once")
    val types = Tables.events(spark, sf)
      .select($"event_type").distinct().as[String].collect().toSet + "none"
    assert(rows.map(_._1).toSet.subsetOf(types))
  }

  test("x130: on-rank quartiles over 5 converts; pre-view purchases and non-converts excluded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-x130").toString
    // users 1..5 convert with latencies 0,10,20,30,40 s; user 6's
    // purchase PRECEDES its first view (excluded); user 7 never buys
    write(dir, Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"), (2L, "2024-01-01 00:00:00", 1L, "purchase"),
      (3L, "2024-01-01 00:00:00", 2L, "view"), (4L, "2024-01-01 00:00:10", 2L, "purchase"),
      (5L, "2024-01-01 00:00:00", 3L, "view"), (6L, "2024-01-01 00:00:20", 3L, "purchase"),
      (7L, "2024-01-01 00:00:00", 4L, "view"), (8L, "2024-01-01 00:00:30", 4L, "purchase"),
      (9L, "2024-01-01 00:00:00", 5L, "view"), (10L, "2024-01-01 00:00:40", 5L, "purchase"),
      (11L, "2024-01-01 00:01:00", 6L, "view"), (12L, "2024-01-01 00:00:30", 6L, "purchase"),
      (13L, "2024-01-01 00:00:00", 7L, "view")))
    val got = analytics.Funnel.latencyQuartiles.fn(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // n=5: p25/p50/p75 land exactly on ranks 2/3/4 -> 10s/20s/30s
    assert(got === Seq(
      (1L, 5L, 40000000L, 10000000.0),
      (2L, 5L, 80000000L, 20000000.0),
      (3L, 5L, 120000000L, 30000000.0)))
  }

  test("x130 equals Spark's exact percentile() on real data") {
    val durs = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("v"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("p"))
      .filter(col("v").isNotNull && col("p").isNotNull && col("p") >= col("v"))
      .select((col("p") - col("v")).as("dur"))
    val want = durs.agg(expr("percentile(dur, array(0.25, 0.5, 0.75))")).as[Seq[Double]]
      .head()
    val got = analytics.Funnel.latencyQuartiles.fn(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1).map(_._4)
    assert(got === want)
  }

  test("x150 crafted: negation semantics — error blocks, later view reopens") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-neg").toString
    def ev(id: Long, u: Long, t: String, hh: Int) =
      (id, Timestamp.valueOf(f"2024-01-01 $hh%02d:00:00"), u, t, 1.0, "")
    Seq(
      ev(1, 1, "view", 1), ev(2, 1, "purchase", 2),                   // clean
      ev(3, 2, "view", 1), ev(4, 2, "error", 2), ev(5, 2, "purchase", 3), // blocked
      ev(6, 3, "view", 1), ev(7, 3, "error", 2), ev(8, 3, "view", 3),
      ev(9, 3, "purchase", 4),                                        // reopened → clean
      ev(10, 4, "purchase", 1), ev(11, 4, "view", 2),                 // wrong order
      ev(12, 5, "error", 1), ev(13, 5, "view", 2), ev(14, 5, "purchase", 3), // clean
      ev(15, 6, "view", 1))                                           // no purchase
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = analytics.Funnel.patternNegation.fn(spark, dir)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r === ((6L, 4L, 3L, 1L)))
  }

  test("x150 real data: the NFA fold equals a per-user scalar replay") {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase", "error"))
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val byUser = ev.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._2, e._3)).map(_._4)).toMap
    var anyC = 0L; var clean = 0L
    byUser.values.foreach { ts =>
      var hv = false; var open = false; var a = false; var c = false
      ts.foreach {
        case "view" => hv = true; open = true
        case "error" => open = false
        case "purchase" => if (hv) a = true; if (open) c = true
        case _ =>
      }
      if (a) anyC += 1; if (c) clean += 1
    }
    val r = analytics.Funnel.patternNegation.fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r === ((byUser.size.toLong, anyC, clean, anyC - clean)))
  }
}
