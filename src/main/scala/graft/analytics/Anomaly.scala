package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** x65: EWMA baseline + per-event surprise — the streaming-monitoring
  * primitive (anomaly scoring against an exponentially-decaying mean)
  * replayed deterministically in batch. For each user the events fold in
  * exact (epoch-µs, event_id) order through
  *
  *   ewma ← (3·ewma + value) / 4          (α = 1/4)
  *   surprise ← max(surprise, |value − ewma_before|)
  *
  * seeded with the user's FIRST value (so the first event is never a fake
  * anomaly against a zero baseline). α = 1/4 keeps the fold inside IEEE's
  * guaranteed operations: one correctly-rounded multiply, one add, and a
  * power-of-two divide — Spark's `aggregate` and DuckDB's `list_reduce`
  * walk the identical op sequence over the identically-sorted list, so
  * the doubles are bit-equal on both engines (the x57 funnel-fold
  * pattern, extended from integer state to a struct of doubles).
  *
  * Scale shape: one user-keyed shuffle; per-user state is the sorted
  * event list (bounded by events-per-user, the same contract x57
  * documents); everything else is map-side. The streaming form of the
  * same fold is a `mapGroupsWithState` whose state is just the two
  * doubles — this batch query is its replayable oracle.
  */
object Anomaly {

  private def ewmaOracle: String =
    """WITH per AS MATERIALIZED (
      |  SELECT user_id,
      |    list_transform(
      |      list_sort(list({'us': epoch_us(ts), 'eid': event_id,
      |                      'v': CAST(value AS DOUBLE)})),
      |      r -> {'m': CAST(0.0 AS DOUBLE), 'e': r.v}) AS es
      |  FROM events GROUP BY user_id),
      |folded AS (
      |  SELECT user_id, CAST(len(es) AS BIGINT) AS n_events,
      |    list_reduce(es, (a, x) -> {
      |      'm': greatest(a.m, abs(x.e - a.e)),
      |      'e': (3.0 * a.e + x.e) / 4.0}) AS st
      |  FROM per)
      |SELECT user_id, n_events, st.e AS ewma, st.m AS max_surprise
      |FROM folded ORDER BY user_id""".stripMargin

  /** x65: per-user EWMA baseline (α=1/4) and maximum one-step surprise
    * over the time-ordered event stream. */
  val ewmaSurprise = Q.withOracle(
    "x65_ewma_surprise",
    "x65: per-user EWMA baseline + max one-step surprise (bit-exact ordered fold)",
    ewmaOracle) { (s, dir) =>
    val ev = Tables.events(s, dir).select(col("user_id"),
      struct(unix_micros(col("ts")).as("us"), col("event_id"),
        col("value").cast("double").as("v")).as("e"))
    val per = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("raw"))
      // (running-max, value) state elements, in exact event order. Field
      // order `m` BEFORE `e` is load-bearing for the ORACLE side:
      // DuckDB's vectorized list_reduce materializes struct fields
      // sequentially into the accumulator, so a field expression
      // reading a.e after the 'e' slot is written sees the UPDATED
      // value (measured: m scaled by exactly 3/4 = |x−e_new|/|x−e_old|
      // on column inputs, while literal-list folds evaluate
      // simultaneously). With m first, sequential and simultaneous
      // evaluation agree — and Spark's functional fold is
      // order-insensitive, so the one safe order is shared.
      .select(col("user_id"),
        transform(col("raw"), e =>
          struct(lit(0.0).as("m"), e.getField("v").as("e"))).as("es"))
    val folded = per.select(col("user_id"),
      size(col("es")).cast("long").as("n_events"),
      aggregate(
        slice(col("es"), lit(2), size(col("es")) - 1),
        element_at(col("es"), 1), // seed: the first value, zero surprise
        (a, x) => struct(
          greatest(a.getField("m"),
            abs(x.getField("e") - a.getField("e"))).as("m"),
          ((lit(3.0) * a.getField("e") + x.getField("e")) / lit(4.0)).as("e"))).as("st"))
    folded.select(col("user_id"), col("n_events"),
        col("st").getField("e").as("ewma"),
        col("st").getField("m").as("max_surprise"))
      .orderBy(col("user_id"))
  }

  // ---- x83: per-user event debounce ---------------------------------

  /** Debounce window: 6 hours in epoch-µs — sized against the corpus's
    * inter-event gap distribution (p10 ≈ 1.1 h, median ≈ 7.3 h) so the
    * throttle genuinely drops events without flattening every user to
    * one. */
  private val DebounceUs = 21600000000L

  /** Bits for the kept-count lane of the packed debounce state: state =
    * last_kept_µs·2^11 + kept_count. Headroom: epoch-µs stays < 4.1e15
    * through year 2100, ×2^11 = 8.4e18 < 2^63; kept counts are bounded
    * at 2047 per user (a 6 h debounce keeps ≤ 4/day — ~17 months of
    * continuous alerting; a longer horizon drops the state to
    * millisecond grain for 2^20 headroom). */
  private val KeptBits = 11

  /** Oracle as a RECURSIVE kept-event chain, not a list_reduce fold:
    * DuckDB's vectorized list_reduce mis-folds certain long lists on
    * multi-row input — measured HERE with a plain BIGINT accumulator
    * and a struct-free element list (one user of 15 at sf0.001 got a
    * different last-kept lane than the same fold on that user alone),
    * so the x65 field-ordering workaround does not reach this bug
    * class. The chain fixpoint is vectorization-proof: base = each
    * user's first event; every kept (user, t) spawns its successor
    * min(us ≥ t + W); UNION terminates when no successor exists. */
  private def debounceOracle: String =
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, epoch_us(ts) AS us FROM events),
       |kept AS (
       |  SELECT user_id, MIN(us) AS t FROM ev GROUP BY user_id
       |  UNION
       |  SELECT k.user_id, MIN(e.us) AS t
       |  FROM kept k JOIN ev e ON e.user_id = k.user_id
       |    AND e.us >= k.t + $DebounceUs
       |  GROUP BY k.user_id, k.t),
       |agg AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    MAX(t) AS last_kept_us
       |  FROM kept GROUP BY user_id),
       |n AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
       |  FROM ev GROUP BY user_id)
       |SELECT n.user_id, n.n_events, agg.n_kept, agg.last_kept_us
       |FROM n JOIN agg USING (user_id)
       |ORDER BY user_id""".stripMargin

  /** x83: per-user debounce/throttle — an event is KEPT iff it arrives ≥
    * [[DebounceUs]] after the last KEPT event (not the last event: a
    * burst must not keep extending the window, which is what makes the
    * fold inherently sequential and chained — LAG can't express it).
    * The alert/trigger dedup of a monitoring pipeline, replayed
    * deterministically in batch; state is two small integers, so the
    * `mapGroupsWithState` streaming form carries (count, last-kept-µs)
    * per user and this query is its replayable oracle.
    *
    * The state is ONE packed long (the LPA PackBase discipline) so the
    * all-integer fold is exact and partitioning-invariant; the ORACLE
    * deliberately avoids list_reduce altogether (see
    * [[debounceOracle]]'s note on the DuckDB vectorized-fold bug) and
    * replays the chain as a recursive fixpoint instead — two
    * independent formulations agreeing is a stronger gate than one
    * shared fold anyway. Scale shape: identical to x65 — one user-keyed
    * shuffle, per-user sorted list, everything else map-side. */
  val debounce = Q.withOracle(
    "x83_debounce",
    "x83: per-user 6h debounce — kept-event counts via a packed-long chained fold",
    debounceOracle) { (s, dir) =>
    val ev = Tables.events(s, dir).select(col("user_id"),
      struct(unix_micros(col("ts")).as("us"), col("event_id")).as("e"))
    val per = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("raw"))
      .select(col("user_id"),
        transform(col("raw"), e =>
          shiftleft(e.getField("us"), KeptBits) + 1L).as("es"))
    // shiftright == div 2^KeptBits on the nonnegative packed values
    val folded = per.select(col("user_id"),
      size(col("es")).cast("long").as("n_events"),
      aggregate(
        slice(col("es"), lit(2), size(col("es")) - 1),
        element_at(col("es"), 1), // seed: the first event is always kept
        (a, x) => {
          val keep = shiftright(x, KeptBits) >= shiftright(a, KeptBits) + DebounceUs
          when(keep, shiftleft(shiftright(x, KeptBits), KeptBits) +
            (a % (1L << KeptBits) + 1L)).otherwise(a)
        }).as("st"))
    folded.select(col("user_id"), col("n_events"),
        (col("st") % (1L << KeptBits)).as("n_kept"),
        shiftright(col("st"), KeptBits).as("last_kept_us"))
      .orderBy(col("user_id"))
  }

  /** Trailing window width (days, inclusive) for the x152 Hampel filter. */
  private val HampelWin = 7

  /** Hampel decision threshold: flag when |y − med| > 3·MAD (the
    * textbook k = 3, compared in exact integers — no σ scaling factor,
    * stated as the raw-MAD form). */
  private val HampelK = 3

  /** x152: Hampel filter — robust outlier days per event type: a day is
    * anomalous when its count deviates from the trailing-$HampelWin-day
    * rolling MEDIAN by more than $HampelK× the rolling MAD. The robust
    * time-series screen that survives what breaks x65's EWMA (a single
    * wild day drags a mean-based baseline; the median/MAD baseline
    * ignores it — spec-pinned). All order statistics are LOWER medians
    * of integer counts, so every value the decision compares is an
    * EXACT integer: no σ-consistency constant, no interpolation, no
    * float anywhere in the flag.
    *
    * Scale shape: one daily hash agg (the only full-data shuffle); the
    * rolling window, the sorts, and both median picks run on arrays of
    * ≤ $HampelWin values over the |types|×|days| calendar axis. */
  val hampelOutliers = Q.withOracle(
    "x152_hampel_outliers",
    s"x152: Hampel-filter outlier days (rolling $HampelWin-day lower median ± $HampelK*MAD, exact integers)",
    s"""WITH d AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT event_type, day, y,
       |    list_sort(list(y) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN ${HampelWin - 1} PRECEDING AND CURRENT ROW)) AS vs
       |  FROM d),
       |m AS (
       |  SELECT event_type, day, y, vs,
       |    vs[(len(vs) + 1) // 2] AS rollmed
       |  FROM w),
       |h AS (
       |  SELECT event_type, day, y, rollmed,
       |    list_sort(list_transform(vs, v -> abs(v - rollmed)))
       |      [(len(vs) + 1) // 2] AS rollmad
       |  FROM m)
       |SELECT event_type, day, y,
       |  CAST(rollmed AS BIGINT) AS rollmed, CAST(rollmad AS BIGINT) AS rollmad,
       |  CAST(abs(y - rollmed) AS BIGINT) AS dev,
       |  CAST(CASE WHEN abs(y - rollmed) > $HampelK * rollmad
       |    THEN 1 ELSE 0 END AS BIGINT) AS outlier
       |FROM h ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    val tw = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(HampelWin - 1), Window.currentRow)
    d.withColumn("vs", sort_array(collect_list(col("y")).over(tw)))
      .withColumn("rollmed",
        expr("element_at(vs, CAST((size(vs) + 1) div 2 AS INT))"))
      .withColumn("rollmad", expr(
        "element_at(sort_array(transform(vs, v -> abs(v - rollmed))), CAST((size(vs) + 1) div 2 AS INT))"))
      .select(col("event_type"), col("day"), col("y"),
        col("rollmed").cast("long").as("rollmed"),
        col("rollmad").cast("long").as("rollmad"),
        abs(col("y") - col("rollmed")).cast("long").as("dev"),
        when(abs(col("y") - col("rollmed")) > col("rollmad") * HampelK, 1L)
          .otherwise(0L).as("outlier"))
      .orderBy(col("event_type"), col("day"))
  }

  val all: Seq[Q] = Seq(ewmaSurprise, debounce, hampelOutliers)
}
