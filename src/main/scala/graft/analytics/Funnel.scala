package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics — the event-sequence operator that rounds
  * out the events family (x13 sessionization, x15 as-of, x20 interval):
  * how many users completed signup → view → purchase IN ORDER? This is
  * SQL's MATCH_RECOGNIZE / the product-analytics "funnel" primitive;
  * the naive relational form is one self-join per stage (k-way join
  * fan-out on a 100 TB event log), the scalable form is ONE doc-keyed
  * aggregation: collect each user's (time-ordered) stage events and
  * fold a stage counter over them — state per user is the counter, the
  * shuffle is the one user-keyed exchange, and stages generalize to any
  * k without another join.
  *
  * Determinism: events order by exact (epoch-micros, event_id) — ties
  * at the same microsecond resolve by event id identically in both
  * engines; the fold is a left fold in both (`aggregate` here,
  * `list_reduce` there). Output is the per-stage completion count —
  * 3 rows, contractually bounded.
  */
object Funnel {

  private val Stages = Seq("signup", "view", "purchase")

  private def funnelOracle: String = {
    // events map to their 1-based stage number; the fold advances when
    // the next event IS the next stage (t = acc + 1) — identical to the
    // engine's (acc = i AND type = stages(i)) arm-by-arm match
    val stageNum = Stages.zipWithIndex
      .map { case (s, i) => s"WHEN '$s' THEN ${i + 1}" }.mkString(" ")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
       |  FROM events WHERE event_type IN (${Stages.map(s => s"'$s'").mkString(", ")})),
       |peruser AS MATERIALIZED (
       |  SELECT user_id,
       |    list_reduce(list_prepend(0,
       |      list_transform(
       |        list_sort(list({'us': us, 'eid': event_id, 't': event_type})),
       |        r -> CASE r.t $stageNum END)),
       |      (acc, t) -> CASE WHEN t = acc + 1 THEN acc + 1 ELSE acc END) AS reached
       |  FROM ev GROUP BY user_id),
       |stages(stage, stage_name) AS (VALUES
       |  ${Stages.zipWithIndex.map { case (s, i) => s"(${i + 1}, '$s')" }.mkString(", ")})
       |SELECT s.stage, s.stage_name,
       |  CAST(COUNT(p.user_id) FILTER (WHERE p.reached >= s.stage) AS BIGINT) AS n_users
       |FROM stages s CROSS JOIN peruser p
       |GROUP BY s.stage, s.stage_name
       |ORDER BY s.stage""".stripMargin
  }

  /** x57: ordered funnel over the events log — users completing each
    * prefix of signup → view → purchase, one user-keyed aggregation. */
  val funnel = Q.withOracle(
    "x57_funnel_stages",
    s"x57: ordered funnel (${Stages.mkString(" -> ")}) per-stage completion counts",
    funnelOracle) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin(Stages: _*))
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type").as("t")).as("e"))
    val folded = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"), aggregate(
        transform(col("es"), e => e.getField("t")),
        lit(0),
        (acc, t) => Stages.zipWithIndex.foldRight(acc) { case ((s0, i), els) =>
          when(acc === i && t === s0, i + 1).otherwise(els)
        }).as("reached"))
    val counts = Stages.indices.map(i =>
      sum(when(col("reached") >= i + 1, 1L).otherwise(0L)).as(s"s${i + 1}"))
    val one = folded.agg(counts.head, counts.tail: _*)
    val rows = Stages.zipWithIndex.map { case (s0, i) =>
      struct(lit(i + 1).as("stage"), lit(s0).as("stage_name"),
        col(s"s${i + 1}").as("n_users"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy(col("stage"))
  }

  /** The conversion event for x112. */
  private val ConvType = "purchase"

  /** x112: last-touch conversion attribution — for every $ConvType
    * event, credit the IMMEDIATELY PRECEDING event on the same user's
    * timeline (any type; a user's first-ever event converting gets the
    * 'none' bucket), and report per touch type the conversion count and
    * the attributed conversion value. This is the marketing-analytics
    * companion to x57's funnel: the funnel says how far users get, the
    * attribution says which touch is adjacent to the money.
    *
    * Determinism/exactness: the timeline orders by exact (ts, event_id)
    * — a unique total order, so LAG is well-defined under ties in both
    * engines; attributed value is the Parity decimal-exact sum
    * (order-independent, AQE-stable), cast once to double. NULL-valued
    * conversions count but contribute no value (SUM skips NULL
    * identically in both engines).
    *
    * Scale shape: ONE user-keyed window shuffle (the same exchange any
    * per-user timeline op pays — x79/x107's regime, never a global
    * window) followed by one bounded hash agg on the handful of event
    * types. At 100 TB this is the minimal cost of the semantics: the
    * predecessor relation is per-user sequential. */
  val attribution = Q.withOracle(
    "x112_last_touch",
    s"x112: last-touch attribution of $ConvType conversions by preceding event type",
    s"""WITH tl AS (
       |  SELECT user_id, event_type, value,
       |    LAG(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS prev_type
       |  FROM events)
       |SELECT COALESCE(prev_type, 'none') AS touch_type,
       |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
       |  CAST(CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
       |    AS DECIMAL(38,0)) / 100 AS DOUBLE) AS attributed_value
       |FROM tl WHERE event_type = '$ConvType'
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("event_type") === ConvType)
      .groupBy(coalesce(col("prev_type"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).cast("long").as("n_conversions"),
        graft.Parity.dsum(col("value")).as("attributed_value"))
      .orderBy(col("touch_type"))
  }

  /** x130: conversion-latency quartiles — the exact p25/p50/p75 of
    * "first view → first purchase" time over converted users, the
    * distribution a growth team reads before setting nudge timers.
    * Median-not-mean matters here precisely because latency is
    * heavy-tailed — and these are EXACT interpolated quartiles (the
    * x125 rank-probe machinery on a single population), not a sketch.
    *
    * Shape: one user-keyed aggregation to (first view µs, first
    * purchase µs), converts filtered (purchase at-or-after view), then
    * the x111/x114 segmented exact rank over µs-bucketed durations
    * (buckets of 2³² µs ≈ 1.2 h keep thousands of rank partitions
    * parallel) and a 6-row broadcast probe join. All integer µs; the
    * only double is the final /4.0. */
  val latencyQuartiles = Q.withOracle(
    "x130_conversion_latency",
    "x130: exact first-view->first-purchase latency quartiles (rank probe, no sort)",
    """WITH fu AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT user_id AS ck, p - v AS dur
      |  FROM fu WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v),
      |r AS (
      |  SELECT dur, CAST(ROW_NUMBER() OVER (ORDER BY dur, ck) AS BIGINT) AS rnk
      |  FROM d),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
      |k AS (
      |  SELECT n, qnum,
      |    ((n - 1) * qnum) // 4 + 1 AS lo1,
      |    ((n - 1) * qnum) % 4 AS rem
      |  FROM n, LATERAL (SELECT unnest([1, 2, 3]) AS qnum)),
      |v AS (
      |  SELECT k.qnum, k.n,
      |    CAST(4 * lo.dur + k.rem * (hi.dur - lo.dur) AS BIGINT) AS quarter_us
      |  FROM k
      |  JOIN r lo ON lo.rnk = k.lo1
      |  JOIN r hi ON hi.rnk = k.lo1 + CASE WHEN k.rem > 0 THEN 1 ELSE 0 END)
      |SELECT CAST(qnum AS BIGINT) AS qnum, n AS n_converted, quarter_us,
      |  CAST(quarter_us AS DOUBLE) / 4.0 AS latency_us
      |FROM v ORDER BY qnum""".stripMargin) { (s, dir) =>
    val fu = graft.Tables.events(s, dir)
      .groupBy(col("user_id").as("ck"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("v"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("p"))
    val d = fu
      .filter(col("v").isNotNull && col("p").isNotNull && col("p") >= col("v"))
      .select(col("ck"), (col("p") - col("v")).as("dur"))
    // segmented exact rank over 2^32-µs duration buckets
    val ranked = Rfm.exactRank(d, col("dur"), 32, "rnk")
      .select(col("dur"), col("rnk"))
    val n = ranked.agg(count(lit(1)).as("n"))
    val k = n
      .withColumn("qnum", explode(array(lit(1L), lit(2L), lit(3L))))
      .withColumn("lo1", expr("((n - 1) * qnum) div 4 + 1"))
      .withColumn("rem", expr("((n - 1) * qnum) % 4"))
      .withColumn("hi1", col("lo1") + when(col("rem") > 0, 1L).otherwise(0L))
    broadcast(k)
      .join(ranked.select(col("rnk").as("lo1"), col("dur").as("dlo")), Seq("lo1"))
      .join(ranked.select(col("rnk").as("hi1"), col("dur").as("dhi")), Seq("hi1"))
      .select(col("qnum"), col("n").as("n_converted"),
        (lit(4L) * col("dlo") + col("rem") * (col("dhi") - col("dlo")))
          .cast("long").as("quarter_us"))
      .withColumn("latency_us", col("quarter_us").cast("double") / 4.0)
      .orderBy(col("qnum"))
  }

  /** x150: sequence pattern WITH NEGATION — users who converted
    * (view → … → purchase) with NO error event strictly between: the
    * MATCH_RECOGNIZE-with-NOT class x57's positive-only fold can't
    * express, and the pattern every incident-impact analysis needs
    * ("did the error actually block the purchase?"). The engine runs it
    * as ONE user-keyed fold (NFA state: has-view, open-since-last-error,
    * matched flags — four ints per user); the oracle states the same
    * semantics RELATIONALLY (EXISTS pair + NOT EXISTS error between,
    * tuple-comparison total order) — two independent formulations, one
    * hash gate. Equivalence argument in the fold: a purchase is clean
    * iff the latest view/error marker before it is a view, which holds
    * iff SOME (view, purchase) pair has no error inside it.
    *
    * Scale shape: one user-keyed exchange, per-user state O(1); the
    * oracle's O(events²/user) join is the oracle's price, not the
    * engine's. Output is ONE bounded row. */
  val patternNegation = Q.withOracle(
    "x150_pattern_negation",
    "x150: users converting view->purchase with NO error between (NFA fold vs EXISTS/NOT-EXISTS oracle)",
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      |  FROM events WHERE event_type IN ('view', 'purchase', 'error')),
      |u AS MATERIALIZED (SELECT DISTINCT user_id FROM ev),
      |anyc AS MATERIALIZED (
      |  SELECT DISTINCT v.user_id FROM ev v JOIN ev p ON p.user_id = v.user_id
      |    AND v.event_type = 'view' AND p.event_type = 'purchase'
      |    AND (v.us, v.event_id) < (p.us, p.event_id)),
      |clean AS MATERIALIZED (
      |  SELECT DISTINCT v.user_id FROM ev v JOIN ev p ON p.user_id = v.user_id
      |    AND v.event_type = 'view' AND p.event_type = 'purchase'
      |    AND (v.us, v.event_id) < (p.us, p.event_id)
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM ev e WHERE e.user_id = v.user_id
      |      AND e.event_type = 'error'
      |      AND (e.us, e.event_id) > (v.us, v.event_id)
      |      AND (e.us, e.event_id) < (p.us, p.event_id)))
      |SELECT CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_users,
      |  CAST((SELECT COUNT(*) FROM anyc) AS BIGINT) AS users_any_conversion,
      |  CAST((SELECT COUNT(*) FROM clean) AS BIGINT) AS users_clean_conversion,
      |  CAST((SELECT COUNT(*) FROM anyc) - (SELECT COUNT(*) FROM clean)
      |    AS BIGINT) AS users_error_blocked""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase", "error"))
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type").as("t")).as("e"))
    val folded = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(expr(
        """aggregate(es,
          |  named_struct('hv', CAST(0 AS BIGINT), 'open', CAST(0 AS BIGINT),
          |               'anyc', CAST(0 AS BIGINT), 'clean', CAST(0 AS BIGINT)),
          |  (acc, e) -> named_struct(
          |    'hv', CASE WHEN e.t = 'view' THEN CAST(1 AS BIGINT) ELSE acc.hv END,
          |    'open', CASE WHEN e.t = 'view' THEN CAST(1 AS BIGINT)
          |                 WHEN e.t = 'error' THEN CAST(0 AS BIGINT)
          |                 ELSE acc.open END,
          |    'anyc', CASE WHEN e.t = 'purchase' AND acc.hv = 1
          |                 THEN CAST(1 AS BIGINT) ELSE acc.anyc END,
          |    'clean', CASE WHEN e.t = 'purchase' AND acc.open = 1
          |                  THEN CAST(1 AS BIGINT) ELSE acc.clean END))"""
          .stripMargin).as("st"))
    folded.agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("st.anyc")).cast("long").as("users_any_conversion"),
        sum(col("st.clean")).cast("long").as("users_clean_conversion"),
        (sum(col("st.anyc")) - sum(col("st.clean"))).cast("long")
          .as("users_error_blocked"))
  }

  val all: Seq[Q] = Seq(funnel, attribution, latencyQuartiles, patternNegation)
}
