package graft.analytics

import graft.{Q, Tables}
import graft.Parity
import org.apache.spark.sql.functions._

/** Trend analytics: per-group ordinary-least-squares regression and
  * duration-weighted averages — the `regr_slope`/`regr_intercept`/`regr_r2`
  * family (reference pipelines chart weekly trends in
  * weekly-report.py:269-403; a trend LINE is the natural next report), plus
  * the time-weighted mean a metrics store computes over validity intervals.
  *
  * Oracle-exactness: every aggregate is an exact integer/decimal sum
  * (order-independent, associative — identical under any partitioning or
  * AQE re-plan), cast ONCE to double; the regression formulae are then pure
  * scalar IEEE arithmetic on identical inputs, bit-identical across
  * engines. No decimal division anywhere (Spark and DuckDB disagree on
  * quotient scale rules), and zero-variance groups yield NULL (not NaN) via
  * an explicit guard in both forms.
  *
  * Scale shape (100 TB): one hash-aggregation per query — map-side partial
  * sums, a shuffle of #groups × 6 longs/decimals, no window, no sort until
  * the final #groups-row ORDER BY. Sxy/Syy accumulate in decimal(38,0)
  * (a penny·day product is ~2e11/row; a long buffer would overflow near
  * 4e7 rows per group — decimal headroom is 10^27 rows, cf. x74's modular
  * checksum note in etl/Diff.scala).
  */
object Trend {

  /** x78: per-event-type OLS regression of `value` against event day —
    * slope (value units/day), intercept (value at epoch), and r².
    *
    * n·Sxx − Sx² and friends are formed in DOUBLE from the exact sums:
    * both engines evaluate the same expression tree on bit-identical
    * inputs, so the hash compare is exact without carrying 76-digit
    * decimal products (Spark overflows decimal(38)·decimal(38) and
    * DuckDB rejects the result type outright). */
  val groupRegression = Q.withOracle(
    "x78_group_regression",
    "x78: per-event-type OLS value-vs-day (slope, intercept, r2) from exact sums",
    """WITH pts AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
      |    CAST(value AS DECIMAL(12,2)) AS y
      |  FROM events),
      |agg AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx,
      |    CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x AS BIGINT) * x) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(x AS DECIMAL(38,2)) * y) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(y AS DECIMAL(38,2)) * y) AS DOUBLE) AS syy
      |  FROM pts GROUP BY 1)
      |SELECT event_type, n,
      |  CASE WHEN n * sxx - sx * sx <> 0.0
      |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
      |  CASE WHEN n * sxx - sx * sx <> 0.0
      |    THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
      |  END AS intercept,
      |  CASE WHEN n * sxx - sx * sx <> 0.0 AND n * syy - sy * sy <> 0.0
      |    THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
      |      / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      |  END AS r2
      |FROM agg ORDER BY event_type""".stripMargin) { (s, dir) =>
    val pts = Tables.events(s, dir)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("x"),
        Parity.dec(col("value")).as("y"))
    val agg = pts
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("long")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x").cast("long") * col("x")).cast("double").as("sxx"),
        sum(col("x").cast("decimal(38,2)") * col("y")).cast("double").as("sxy"),
        sum(col("y").cast("decimal(38,2)") * col("y")).cast("double").as("syy"))
    val den  = col("n") * col("sxx") - col("sx") * col("sx")
    val num  = col("n") * col("sxy") - col("sx") * col("sy")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    agg.select(col("event_type"), col("n"),
        when(den =!= 0.0, num / den).as("slope"),
        when(den =!= 0.0, (col("sy") - num / den * col("sx")) / col("n")).as("intercept"),
        when(den =!= 0.0 && deny =!= 0.0, (num * num) / (den * deny)).as("r2"))
      .orderBy(col("event_type"))
  }

  /** x79: duration-weighted mean order price per priority — each order's
    * price is weighted by the number of DAYS until the customer's NEXT
    * order (LEAD over the per-customer timeline), the interval-weighted
    * average a metrics store computes over validity windows. Orders with
    * no successor (open intervals) are excluded from the weighted mean
    * but counted.
    *
    * Day grain, not seconds, on purpose: pennies·seconds sums cross 2^53
    * already at sf0.01, and DuckDB's decimal→double cast is NOT correctly
    * rounded there (int128→double then /10^scale — two roundings; Spark's
    * BigDecimal cast is single-rounded), so second-grain weights
    * hash-diverge in the last ulp. Pennies·days keeps the sums exactly
    * representable up to ~2^53 total (≈1.8e6 orders/group at this data's
    * magnitudes); past that Spark's answer stays exact and deterministic
    * (decimal sums), only the final cast rounds.
    *
    * Scale: LEAD partitions by o_custkey (the same key-shuffle any
    * per-customer timeline op pays — never a global window), then one
    * hash-agg on the handful of priorities. */
  val timeWeightedPrice = Q.withOracle(
    "x79_time_weighted_price",
    "x79: day-weighted mean totalprice per priority (LEAD interval weights)",
    """WITH iv AS (
      |  SELECT o_orderpriority,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS price,
      |    date_diff('day', CAST(o_orderdate AS DATE),
      |      LEAD(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey)) AS w
      |  FROM orders),
      |agg AS (
      |  SELECT o_orderpriority,
      |    COUNT(*) AS n_orders,
      |    COUNT(w) AS n_weighted,
      |    CAST(SUM(w) AS DOUBLE) AS total_w,
      |    CAST(SUM(price * CAST(w AS DECIMAL(26,0))) AS DOUBLE) AS swp
      |  FROM iv GROUP BY 1)
      |SELECT o_orderpriority, n_orders, n_weighted,
      |  CASE WHEN total_w > 0.0 THEN swp / total_w END AS tw_mean_price
      |FROM agg ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val nextDate = lead(to_date(col("o_orderdate")), 1)
      .over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")))
    val iv = Tables.orders(s, dir)
      .select(col("o_orderpriority"),
        Parity.dec(col("o_totalprice")).as("price"),
        datediff(nextDate, to_date(col("o_orderdate"))).as("w"))
    iv.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("w")).as("n_weighted"),
        sum(col("w")).cast("double").as("total_w"),
        sum(col("price") * col("w").cast("decimal(26,0)")).cast("double").as("swp"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_weighted"),
        col("total_w"),
        when(col("total_w") > 0.0, col("swp") / col("total_w")).as("tw_mean_price"))
      .drop("total_w")
      .orderBy(col("o_orderpriority"))
  }

  /** Decay horizon for x91: contributions older than this many days
    * (relative to the corpus high-water ship date) round to zero. With
    * a one-day half-life the weight of day `a` is 2^(Horizon−a) in
    * scaled-integer space — every term is a power of two, so the SUM is
    * exact in a long (headroom: 2^63 / 2^30 ≈ 8.6e9 same-day rows per
    * part before overflow; a longer horizon trades headroom for tail). */
  private val DecayHorizonDays = 30

  /** x91: half-life decayed popularity — "what's trending": each
    * lineitem votes for its part with weight 2^(−age_days), a one-day
    * half-life anchored at the corpus high-water ship date. Chosen
    * decay base 2 on purpose: the weights are DYADIC, so the whole
    * score accumulates as an exact integer (Σ 2^(Horizon−age)) and the
    * reported double is one final division by 2^Horizon — bit-exact
    * across engines with zero float summation, where an e^(−λ·age)
    * formulation would bet the hash on exp() parity AND on float sum
    * order. The recsys/trending primitive, exactness-first.
    *
    * Scale shape: one 1-row high-water scalar broadcast into a pure
    * map, one part-keyed hash agg (map-side combine on longs), bounded
    * top-k. */
  val decayedPopularity = Q.withOracle(
    "x91_decayed_popularity",
    s"x91: top-20 trending parts by one-day-half-life decayed votes ($DecayHorizonDays-day horizon)",
    s"""WITH hw AS (
       |  SELECT MAX(CAST(l_shipdate AS DATE)) AS mx FROM lineitem),
       |w AS (
       |  SELECT l_partkey,
       |    date_diff('day', CAST(l_shipdate AS DATE), hw.mx) AS age
       |  FROM lineitem CROSS JOIN hw),
       |sc AS (
       |  SELECT l_partkey AS part,
       |    CAST(SUM(CASE WHEN age <= $DecayHorizonDays
       |      THEN (CAST(1 AS BIGINT) << ($DecayHorizonDays - age))
       |      ELSE 0 END) AS BIGINT) AS score_scaled,
       |    CAST(COUNT(*) AS BIGINT) AS n_votes
       |  FROM w GROUP BY 1)
       |SELECT part, n_votes, score_scaled,
       |  CAST(score_scaled AS DOUBLE) / ${1L << DecayHorizonDays} AS score
       |FROM sc WHERE score_scaled > 0
       |ORDER BY score_scaled DESC, part LIMIT 20""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val hw = li.agg(max(to_date(col("l_shipdate"))).as("mx"))
    li.crossJoin(broadcast(hw))
      .select(col("l_partkey").as("part"),
        datediff(col("mx"), to_date(col("l_shipdate"))).as("age"))
      .groupBy(col("part"))
      .agg(sum(when(col("age") <= DecayHorizonDays,
          expr(s"shiftleft(CAST(1 AS BIGINT), $DecayHorizonDays - CAST(age AS INT))"))
          .otherwise(0L)).cast("long").as("score_scaled"),
        count(lit(1)).as("n_votes"))
      .filter(col("score_scaled") > 0)
      .select(col("part"), col("n_votes"), col("score_scaled"),
        (col("score_scaled").cast("double") / (1L << DecayHorizonDays)).as("score"))
      .orderBy(col("score_scaled").desc, col("part")).limit(20)
  }

  /** x92: weighted median — the weighted order statistic a17's
    * unweighted percentiles can't express: the smallest price v such
    * that lineitems covering HALF the total quantity cost ≤ v ("half
    * the volume ships at or below this price"). Weights are exact
    * integer quantities, the cumulative scan is an integer window sum,
    * and the pick is `2·cum ≥ total` — no interpolation, no float
    * accumulation, deterministic ties via (price, orderkey, linenumber)
    * total order.
    *
    * Scale: NOT one window per flag — with a handful of groups that
    * plan sorts the whole table in |groups| reducer partitions (first
    * cut measured 7.6× wall for 10× rows at the probe: zero
    * parallelism). The cumulative weight is an associative SUM, so the
    * x23/x80b segmented scan applies: per-(flag, price-bucket) windows
    * in parallel + one tiny per-flag bucket-offset window, identical
    * result (probe after: 1.1× flat). The oracle keeps the plain
    * per-flag window — DuckDB's single-node sort is fine at oracle
    * scale, and a second formulation is a stronger gate. */
  private val WmBucketBits = 10

  val weightedMedian = Q.withOracle(
    "x92_weighted_median",
    "x92: quantity-weighted median price per return flag (segmented cum-weights)",
    """WITH w AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS v,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS wt,
      |    l_orderkey AS ok, l_linenumber AS ln
      |  FROM lineitem),
      |c AS (
      |  SELECT flag, v, wt,
      |    SUM(wt) OVER (PARTITION BY flag ORDER BY v, ok, ln
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(wt) OVER (PARTITION BY flag) AS tot
      |  FROM w)
      |SELECT flag, CAST(MIN(tot) AS BIGINT) AS total_weight,
      |  MIN(CASE WHEN 2 * cum >= tot THEN v END) AS wmedian
      |FROM c GROUP BY flag ORDER BY flag""".stripMargin) { (s, dir) =>
    val w = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"),
        floor(col("l_quantity")).cast("long").as("wt"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
      .withColumn("bkt", shiftright(floor(col("v")).cast("long"), WmBucketBits))
    // segmented cumulative weights + per-flag totals via SegmentedRank's
    // shared core (both offset windows run over the bucket table only)
    graft.ext.SegmentedRank.withGroupedPrefix(
        w, Seq("flag"), "bkt", Seq(col("v"), col("ok"), col("ln")),
        Seq((col("wt"), "cum")), inclusive = true,
        valueTotals = Seq(("cum", "tot")))
      .groupBy(col("flag"))
      .agg(min(col("tot")).cast("long").as("total_weight"),
        min(when(lit(2) * col("cum") >= col("tot"), col("v"))).as("wmedian"))
      .orderBy(col("flag"))
  }

  /** x97: offline CUSUM change-point detection — for each event type,
    * the week where the cumulative deviation from the series mean peaks:
    * the classic "when did the level shift?" screen (Page's CUSUM, run
    * retrospectively). To keep the statistic EXACT, the mean is never
    * formed: multiplying through by n gives the scaled statistic
    *
    *   CUSUM_k = n·prefix_k − k·total      (exact integer pennies)
    *
    * whose argmax is the same week as the textbook (prefix_k − k·mean).
    * All terms are long integer pennies from exact decimal sums; the
    * pick is a deterministic (|CUSUM| desc, week asc) rank. Headroom:
    * n_weeks·total_pennies < 2^63 — at 10^2 weeks this tolerates ~10^15
    * pennies ($10 trillion) per event type; past that, widen the two
    * products to decimal(18,0)×decimal(18,0) as x95 does.
    *
    * Scale shape: one hash agg to the (type, week) grain — the only
    * full-data shuffle — then three stacked windows over the aggregated
    * calendar axis, which is by construction tiny (|types| × |weeks|)
    * regardless of input scale: the same deliberate choice as W1/w3. */
  val cusumChangePoint = Q.withOracle(
    "x97_cusum_changepoint",
    "x97: CUSUM change-point week per event type over exact weekly penny sums",
    """WITH wkly AS (
      |  SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS wk,
      |    COALESCE(CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT), 0) AS v
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, wk,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY wk) AS k,
      |    SUM(v) OVER (PARTITION BY event_type ORDER BY wk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre,
      |    SUM(v) OVER (PARTITION BY event_type) AS tot
      |  FROM wkly),
      |m AS (
      |  SELECT event_type, wk, n, n * pre - k * tot AS cusum,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY abs(n * pre - k * tot) DESC, wk) AS pick
      |  FROM c)
      |SELECT event_type, CAST(n AS BIGINT) AS n_weeks, wk AS change_wk,
      |  CAST(cusum AS BIGINT) AS cusum_scaled,
      |  CAST(sign(cusum) AS BIGINT) AS side
      |FROM m WHERE pick = 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wkly = Tables.events(s, dir)
      .groupBy(col("event_type"), Parity.week(col("ts")).as("wk"))
      .agg(coalesce((sum(Parity.dec(col("value"))) * 100).cast("long"), lit(0L))
        .as("v"))
    val part = Window.partitionBy(col("event_type"))
    val ord = part.orderBy(col("wk"))
    val c = wkly
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("k", row_number().over(ord))
      .withColumn("pre", sum(col("v"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("v")).over(part))
      .withColumn("cusum", col("n") * col("pre") - col("k") * col("tot"))
    c.withColumn("pick", row_number()
        .over(part.orderBy(abs(col("cusum")).desc, col("wk"))))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("n").cast("long").as("n_weeks"),
        col("wk").as("change_wk"), col("cusum").cast("long").as("cusum_scaled"),
        signum(col("cusum")).cast("long").as("side"))
      .orderBy(col("event_type"))
  }

  /** Trailing window (weeks, inclusive of current) for x106. */
  private val RollWeeks = 4

  /** x106: rolling regression — the trailing-$RollWeeks-week OLS slope of
    * weekly volume per event type, at every week: x78 answers "what is
    * the trend overall", x106 answers "what is the trend NOW, and when
    * did it flip" (the time-series acceleration screen; w3's moving
    * average smooths the level, this fits the direction).
    *
    * Exactness: all five regression moments are exact integer window
    * sums (x = epoch-week index, y = exact pennies), and the slope is
    * the x78 formula — numerator/denominator formed in exact integers
    * and cast ONCE to double for one division. Windows of n=1 have zero
    * x-variance → NULL (both engines, guarded). Headroom: the sx·sy
    * product tolerates ~2e14 weekly pennies at this window width; past
    * that, widen to decimal(18,0) as x95 does.
    *
    * Scale shape: one hash agg to the weekly grain (the only full-data
    * shuffle); every window runs on the |types|×|weeks| axis — tiny at
    * any input scale, the same deliberate W1/x97 choice. */
  val rollingSlope = Q.withOracle(
    "x106_rolling_slope",
    s"x106: trailing-$RollWeeks-week OLS slope of weekly volume per event type",
    s"""WITH wkly AS (
       |  SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS wk,
       |    date_diff('day', DATE '1970-01-01', CAST(date_trunc('week', ts) AS DATE)) // 7 AS x,
       |    COALESCE(CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT), 0) AS y
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT event_type, wk,
       |    COUNT(*) OVER tw AS n,
       |    SUM(x) OVER tw AS sx, SUM(y) OVER tw AS sy,
       |    SUM(x * x) OVER tw AS sxx, SUM(x * y) OVER tw AS sxy
       |  FROM wkly
       |  WINDOW tw AS (PARTITION BY event_type ORDER BY wk
       |    ROWS BETWEEN ${RollWeeks - 1} PRECEDING AND CURRENT ROW))
       |SELECT event_type, wk, CAST(n AS BIGINT) AS n_weeks,
       |  CASE WHEN n * sxx - sx * sx <> 0
       |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
       |      / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
       |FROM w ORDER BY event_type, wk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wkly = Tables.events(s, dir)
      .groupBy(col("event_type"), Parity.week(col("ts")).as("wk"))
      .agg(coalesce((sum(Parity.dec(col("value"))) * 100).cast("long"), lit(0L))
        .as("y"))
      .withColumn("x",
        expr("CAST(datediff(wk, DATE '1970-01-01') AS BIGINT) div 7"))
    val tw = Window.partitionBy(col("event_type")).orderBy(col("wk"))
      .rowsBetween(-(RollWeeks - 1), Window.currentRow)
    val w = wkly
      .withColumn("n", count(lit(1)).over(tw))
      .withColumn("sx", sum(col("x")).over(tw))
      .withColumn("sy", sum(col("y")).over(tw))
      .withColumn("sxx", sum(col("x") * col("x")).over(tw))
      .withColumn("sxy", sum(col("x") * col("y")).over(tw))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    w.select(col("event_type"), col("wk"), col("n").cast("long").as("n_weeks"),
        when(den =!= 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / den.cast("double")).as("slope"))
      .orderBy(col("event_type"), col("wk"))
  }

  /** Maximum lag (weeks) for x109. */
  private val AcfMaxLag = 4

  /** x109: lag-k autocorrelation of weekly event volume per event type,
    * k = 1..$AcfMaxLag — the seasonality/persistence screen next to
    * x97's change point and x106's trend: a strong r at lag 1 means
    * volume is momentum-driven; a spike at a longer lag is a cadence.
    * Pairing is BY WEEK INDEX (a self-join on x and x+k), not by row
    * offset, so calendar gaps pair nothing rather than silently pairing
    * across a hole — the x94 gaps-and-islands discipline.
    *
    * Exactness: y = exact weekly counts; all five moments per (type,
    * lag) are exact long sums; the Pearson numerator n·Sab − Sa·Sb is an
    * exact long; the denominator is formed as (double)·(double) with one
    * correctly-rounded sqrt and one division — bit-identical across
    * engines. Zero-variance ends (constant series) → NULL via an
    * explicit guard in both forms. Headroom: y² in a long tolerates
    * ~2e9 events per type-week; past that widen the products to
    * decimal(18,0)×decimal(18,0) as x95 does.
    *
    * Scale shape: ONE full-data shuffle (the weekly hash agg); the lag
    * dimension is a broadcast $AcfMaxLag-row literal and the pair
    * self-join runs on the |types|×|weeks| axis — constant-sized at any
    * input scale, so the whole ACF grid costs the weekly rollup plus
    * noise. */
  val autocorrelation = Q.withOracle(
    "x109_weekly_acf",
    s"x109: lag-1..$AcfMaxLag autocorrelation of weekly event counts per type",
    s"""WITH wkly AS (
       |  SELECT event_type,
       |    date_diff('day', DATE '1970-01-01', CAST(date_trunc('week', ts) AS DATE)) // 7 AS x,
       |    CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |l AS (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag),
       |p AS (
       |  SELECT a.event_type, l.lag, a.y AS ya, b.y AS yb
       |  FROM wkly a CROSS JOIN l
       |  JOIN wkly b ON b.event_type = a.event_type AND b.x = a.x + l.lag),
       |m AS (
       |  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(ya) AS BIGINT) AS sa, CAST(SUM(yb) AS BIGINT) AS sb,
       |    CAST(SUM(ya * ya) AS BIGINT) AS saa,
       |    CAST(SUM(yb * yb) AS BIGINT) AS sbb,
       |    CAST(SUM(ya * yb) AS BIGINT) AS sab
       |  FROM p GROUP BY 1, 2)
       |SELECT event_type, CAST(lag AS BIGINT) AS lag, n AS n_pairs,
       |  CAST(n * sab - sa * sb AS BIGINT) AS acf_num,
       |  CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0 THEN
       |    CAST(n * sab - sa * sb AS DOUBLE)
       |      / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
       |             * CAST(n * sbb - sb * sb AS DOUBLE))
       |  END AS acf
       |FROM m ORDER BY event_type, lag""".stripMargin) { (s, dir) =>
    val wkly = Tables.events(s, dir)
      .groupBy(col("event_type"), Parity.week(col("ts")).as("wk"))
      .agg(count(lit(1)).cast("long").as("y"))
      .withColumn("x",
        expr("CAST(datediff(wk, DATE '1970-01-01') AS BIGINT) div 7"))
      .drop("wk")
    val lags = s.range(1, AcfMaxLag + 1).select(col("id").as("lag"))
    val a = wkly.select(col("event_type"),
      col("x").as("xa"), col("y").as("ya"))
    val b = wkly.select(col("event_type").as("et_b"),
      col("x").as("xb"), col("y").as("yb"))
    val m = a.crossJoin(broadcast(lags))
      .join(b, col("et_b") === col("event_type")
        && col("xb") === col("xa") + col("lag"))
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("ya")).cast("long").as("sa"),
        sum(col("yb")).cast("long").as("sb"),
        sum(col("ya") * col("ya")).cast("long").as("saa"),
        sum(col("yb") * col("yb")).cast("long").as("sbb"),
        sum(col("ya") * col("yb")).cast("long").as("sab"))
    val dA = col("n") * col("saa") - col("sa") * col("sa")
    val dB = col("n") * col("sbb") - col("sb") * col("sb")
    m.select(col("event_type"), col("lag").cast("long").as("lag"),
        col("n").as("n_pairs"),
        (col("n") * col("sab") - col("sa") * col("sb")).cast("long")
          .as("acf_num"),
        when(dA > 0 && dB > 0,
          (col("n") * col("sab") - col("sa") * col("sb")).cast("double")
            / sqrt(dA.cast("double") * dB.cast("double"))).as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Holt fixed-point scale: 2^20 — dyadic, so the reported doubles are
    * exact images of the integer state (one power-of-two division). */
  private[graft] val HoltScale = 1L << 20

  /** Forecast horizon (days ahead) for x139. */
  private[graft] val HoltHorizon = 7

  /** x139: Holt linear-trend exponential smoothing (double exponential)
    * of daily event volume per event type, α = β = 1/2, forecast
    * $HoltHorizon days ahead — the level+trend forecast one step up
    * from x65's EWMA (level only) and x106's rolling OLS (no smoothing):
    *
    *   l_t = α·y_t·S + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   f_{t+h} = l_t + h·b_t
    *
    * α = β = 1/2 on purpose: every update is one add and one truncating
    * halving in SCALED-INTEGER space (S = 2^20), so the whole recursion
    * is exact integer arithmetic — `div`/`//` truncate identically on
    * both engines including negative trend values — and the final
    * doubles are dyadic rationals, bit-identical across engines. Seeds:
    * l_1 = y_1·S, b_1 = 0 (documented convention). The oracle replays
    * the per-type chain as a WITH RECURSIVE walk (list_reduce is
    * order-unsafe, the x83/x136 rule). Headroom: y·S < 2^63 tolerates
    * ~8.8e12 events per (type, day).
    *
    * Scale shape (100 TB): one hash agg to the daily grain (the only
    * full-data shuffle); the fold runs executor-side via the `aggregate`
    * HOF over each type's collected calendar axis — bounded by |days|,
    * not data size, the same x136 posture. */
  val holtForecast = Q.withOracle(
    "x139_holt_forecast",
    s"x139: Holt linear-trend smoothing of daily volume per event type (alpha=beta=1/2, +${HoltHorizon}d forecast)",
    s"""WITH RECURSIVE d AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |ax AS MATERIALIZED (
       |  SELECT event_type, day, y,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
       |      AS BIGINT) AS k,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM d),
       |h AS (
       |  SELECT event_type, k, n, y * $HoltScale AS l, CAST(0 AS BIGINT) AS b
       |  FROM ax WHERE k = 1
       |  UNION ALL
       |  SELECT a.event_type, a.k, a.n,
       |    (a.y * $HoltScale + h.l + h.b) // 2 AS l,
       |    (((a.y * $HoltScale + h.l + h.b) // 2) - h.l + h.b) // 2 AS b
       |  FROM h JOIN ax a ON a.event_type = h.event_type AND a.k = h.k + 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n_days,
       |  CAST(l AS BIGINT) AS level_scaled, CAST(b AS BIGINT) AS trend_scaled,
       |  CAST(l + $HoltHorizon * b AS BIGINT) AS forecast_scaled,
       |  CAST(l AS DOUBLE) / $HoltScale AS level,
       |  CAST(b AS DOUBLE) / $HoltScale AS trend,
       |  CAST(l + $HoltHorizon * b AS DOUBLE) / $HoltScale AS forecast
       |FROM h WHERE k = n ORDER BY event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    d.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("ax"),
        count(lit(1)).cast("long").as("n_days"))
      .select(col("event_type"), col("n_days"), expr(
        s"""aggregate(slice(ax, 2, CAST(size(ax) - 1 AS INT)),
           |  named_struct('l', element_at(ax, 1).y * CAST($HoltScale AS BIGINT),
           |               'b', CAST(0 AS BIGINT)),
           |  (acc, x) -> named_struct(
           |    'l', (x.y * $HoltScale + acc.l + acc.b) div 2,
           |    'b', (((x.y * $HoltScale + acc.l + acc.b) div 2) - acc.l + acc.b)
           |      div 2))""".stripMargin).as("st"))
      .select(col("event_type"), col("n_days"),
        col("st.l").as("level_scaled"), col("st.b").as("trend_scaled"),
        (col("st.l") + col("st.b") * HoltHorizon).as("forecast_scaled"),
        (col("st.l").cast("double") / HoltScale).as("level"),
        (col("st.b").cast("double") / HoltScale).as("trend"),
        ((col("st.l") + col("st.b") * HoltHorizon).cast("double") / HoltScale)
          .as("forecast"))
      .orderBy(col("event_type"))
  }

  /** x146: maximum drawdown of the weekly revenue level per order
    * priority — the worst peak-to-trough decline from any past high
    * ("how bad did it get, from the best it ever was"): the risk metric
    * every level series should report next to its trend (x106) and its
    * change point (x97). Computed with the x137 reflection discipline
    * inverted: running MAX of the level, drawdown_t = runmax_t − y_t,
    * answer = max over t — two stacked windows over the weekly axis,
    * exact pennies end to end; the one double is the final ratio.
    * Deterministic argmax pick: (drawdown desc, week asc).
    *
    * Scale shape: one hash agg to the (priority, week) grain — the only
    * full-data shuffle — then windows over the |groups|×|weeks| axis. */
  val maxDrawdown = Q.withOracle(
    "x146_max_drawdown",
    "x146: worst peak-to-trough decline of weekly revenue per priority (exact pennies)",
    """WITH wk AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
      |  FROM orders GROUP BY 1, 2),
      |c AS (
      |  SELECT g, wk, y,
      |    MAX(y) OVER (PARTITION BY g ORDER BY wk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
      |  FROM wk),
      |d AS (
      |  SELECT g, wk, y, runmax, runmax - y AS dd,
      |    ROW_NUMBER() OVER (PARTITION BY g
      |      ORDER BY runmax - y DESC, wk) AS pick
      |  FROM c)
      |SELECT g, wk AS trough_wk, CAST(runmax AS BIGINT) AS peak_pennies,
      |  CAST(y AS BIGINT) AS trough_pennies, CAST(dd AS BIGINT) AS dd_pennies,
      |  CASE WHEN runmax > 0 THEN CAST(dd AS DOUBLE) / runmax END AS dd_frac
      |FROM d WHERE pick = 1 ORDER BY g""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wk = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("g"),
        Parity.week(col("o_orderdate")).as("wk"))
      .agg(sum(Parity.dec(col("o_totalprice")) * 100).cast("long").as("y"))
    val part = Window.partitionBy(col("g"))
    val c = wk.withColumn("runmax", max(col("y")).over(part.orderBy(col("wk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("dd", col("runmax") - col("y"))
    val d = c.withColumn("pick",
      row_number().over(part.orderBy(col("dd").desc, col("wk"))))
    d.filter(col("pick") === 1)
      .select(col("g"), col("wk").as("trough_wk"),
        col("runmax").cast("long").as("peak_pennies"),
        col("y").cast("long").as("trough_pennies"),
        col("dd").cast("long").as("dd_pennies"),
        when(col("runmax") > 0, col("dd").cast("double") / col("runmax"))
          .as("dd_frac"))
      .orderBy(col("g"))
  }

  /** x147: in-sample one-step backtest of the x139 Holt smoother — MASE
    * (mean absolute scaled error, Hyndman–Koehler 2006): the forecast
    * family's evaluation member, the x88/x143 "evaluate the estimator
    * with the engine itself" posture. For t ≥ 2 the smoother's one-step
    * forecast for day t is l_{t−1} + b_{t−1}; the scaled error sums
    *
    *   MASE = Σ|y_t·S − (l+b)_{t−1}| / Σ|y_t − y_{t−1}|·S
    *
    * are EXACT integers because the Holt state itself is exact integer
    * (x139), so the one float is the final division. MASE < 1 means the
    * smoother beats the naive carry-forward on the same data.
    *
    * Same fold machinery as x139 with a wider accumulator (state + both
    * error sums + previous y); oracle replays per-type chains WITH
    * RECURSIVE. */
  val holtBacktest = Q.withOracle(
    "x147_holt_backtest",
    "x147: one-step MASE of the Holt smoother vs naive carry-forward per event type",
    s"""WITH RECURSIVE d AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |ax AS MATERIALIZED (
       |  SELECT event_type, day, y,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
       |      AS BIGINT) AS k,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM d),
       |h AS (
       |  SELECT event_type, k, n, y AS py, y * $HoltScale AS l,
       |    CAST(0 AS BIGINT) AS b,
       |    CAST(0 AS BIGINT) AS sh, CAST(0 AS BIGINT) AS sn
       |  FROM ax WHERE k = 1
       |  UNION ALL
       |  SELECT a.event_type, a.k, a.n, a.y,
       |    (a.y * $HoltScale + h.l + h.b) // 2,
       |    (((a.y * $HoltScale + h.l + h.b) // 2) - h.l + h.b) // 2,
       |    h.sh + abs(a.y * $HoltScale - (h.l + h.b)),
       |    h.sn + abs(a.y - h.py) * $HoltScale
       |  FROM h JOIN ax a ON a.event_type = h.event_type AND a.k = h.k + 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n_days,
       |  CAST(sh AS BIGINT) AS sae_holt_scaled,
       |  CAST(sn AS BIGINT) AS sae_naive_scaled,
       |  CASE WHEN sn > 0 THEN CAST(sh AS DOUBLE) / sn END AS mase
       |FROM h WHERE k = n ORDER BY event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    d.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("ax"),
        count(lit(1)).cast("long").as("n_days"))
      .select(col("event_type"), col("n_days"), expr(
        s"""aggregate(slice(ax, 2, CAST(size(ax) - 1 AS INT)),
           |  named_struct(
           |    'py', element_at(ax, 1).y,
           |    'l', element_at(ax, 1).y * CAST($HoltScale AS BIGINT),
           |    'b', CAST(0 AS BIGINT),
           |    'sh', CAST(0 AS BIGINT), 'sn', CAST(0 AS BIGINT)),
           |  (acc, x) -> named_struct(
           |    'py', x.y,
           |    'l', (x.y * $HoltScale + acc.l + acc.b) div 2,
           |    'b', (((x.y * $HoltScale + acc.l + acc.b) div 2) - acc.l + acc.b)
           |      div 2,
           |    'sh', acc.sh + abs(x.y * $HoltScale - (acc.l + acc.b)),
           |    'sn', acc.sn + abs(x.y - acc.py) * $HoltScale))"""
          .stripMargin).as("st"))
      .select(col("event_type"), col("n_days"),
        col("st.sh").as("sae_holt_scaled"),
        col("st.sn").as("sae_naive_scaled"),
        when(col("st.sn") > 0,
          col("st.sh").cast("double") / col("st.sn")).as("mase"))
      .orderBy(col("event_type"))
  }

  /** x151: Theil–Sen robust slope of daily volume per event type — the
    * median of all pairwise slopes (y_j − y_i)/(x_j − x_i), the
    * breakdown-resistant alternative to x78's OLS (one wild outlier day
    * moves OLS arbitrarily, Theil–Sen tolerates ~29% contamination).
    * The pair set is O(|days|²) PER TYPE — quadratic only in the
    * calendar axis, never in events (435 pairs for a 30-day month), so
    * the robustness is free at any data scale.
    *
    * Determinism: the median pick is a rank over (slope double, num,
    * den, xi, xj) — the double is one division of exact integers
    * (bit-identical), and the integer tiebreak makes the rank total.
    * Lower median at even n (rank (n+1) div 2), stated. The reported
    * slope is picked-pair num/den — one exact division.
    *
    * Scale shape: one daily hash agg (the only full-data shuffle), a
    * per-type self-join and rank window over the calendar axis. */
  val theilSen = Q.withOracle(
    "x151_theil_sen",
    "x151: Theil-Sen median pairwise slope of daily volume per event type",
    """WITH d AS MATERIALIZED (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
      |    CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |pr AS MATERIALIZED (
      |  SELECT a.event_type, a.x AS xi, b.x AS xj,
      |    b.y - a.y AS num, CAST(b.x - a.x AS BIGINT) AS den
      |  FROM d a JOIN d b ON b.event_type = a.event_type AND b.x > a.x),
      |rk AS (
      |  SELECT event_type, num, den,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY CAST(num AS DOUBLE) / den, num, den, xi, xj) AS rn
      |  FROM pr)
      |SELECT event_type, n_pairs,
      |  CAST(num AS BIGINT) AS med_num, den AS med_den,
      |  CAST(num AS DOUBLE) / den AS theil_sen
      |FROM rk WHERE rn = (n_pairs + 1) // 2
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("x"))
      .agg(count(lit(1)).cast("long").as("y"))
    val a = d.select(col("event_type"), col("x").as("xi"), col("y").as("yi"))
    val b = d.select(col("event_type").as("et_b"), col("x").as("xj"),
      col("y").as("yj"))
    val pr = a.join(b, col("et_b") === col("event_type") && col("xj") > col("xi"))
      .select(col("event_type"), col("xi"), col("xj"),
        (col("yj") - col("yi")).as("num"), (col("xj") - col("xi")).as("den"))
    val part = Window.partitionBy(col("event_type"))
    val rk = pr
      .withColumn("n_pairs", count(lit(1)).over(part).cast("long"))
      .withColumn("rn", row_number().over(part.orderBy(
        col("num").cast("double") / col("den"), col("num"), col("den"),
        col("xi"), col("xj"))))
    rk.filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
      .select(col("event_type"), col("n_pairs"),
        col("num").cast("long").as("med_num"), col("den").as("med_den"),
        (col("num").cast("double") / col("den")).as("theil_sen"))
      .orderBy(col("event_type"))
  }

  /** x157: weighted isotonic regression (PAVA) of the daily mean event
    * value per event type — the monotone-calibration primitive ("fit the
    * best NON-DECREASING curve through this noisy series"), the same fit
    * ML pipelines use to calibrate classifier scores. Rather than the
    * sequential pool-adjacent-violators loop, the fit is computed through
    * the closed-form minimax identity of weighted isotonic L2 regression
    *
    *   fit_i = max_{a≤i} min_{b≥i} ( Σ_{a..b} sy ) / ( Σ_{a..b} sw )
    *
    * (sy = exact daily penny sum, sw = daily event count), which is
    * embarrassingly parallel: one pair self-join over the per-type day
    * axis, one running min, one grouped max — no sequential state. Every
    * segment mean is a single long→double division of exact integers
    * (both < 2^53: identical bits in both engines), and min/max over
    * doubles are value-based, so the whole fit replays bit-exactly in
    * DuckDB. Output stays in penny units (document-ed, no /100 noise).
    *
    * Scale shape: the ONLY corpus-bound stage is the daily hash agg (the
    * x97 posture); the pair join, running min, and grouped max all live
    * on the (type × day) calendar axis — |types|·|days|² rows, bounded by
    * the calendar regardless of input scale, and every window is
    * partitioned (per-type / per-(type, a)), never corpus-wide. */
  val isotonic = Q.withOracle(
    "x157_isotonic",
    "x157: weighted isotonic (PAVA minimax) fit of daily mean pennies per event type",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    COALESCE(CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT), 0) AS sy,
      |    CAST(COUNT(*) AS BIGINT) AS sw
      |  FROM events GROUP BY 1, 2),
      |pr AS (
      |  SELECT event_type, day,
      |    ROW_NUMBER() OVER w AS k,
      |    CAST(SUM(sy) OVER w AS BIGINT) AS pp,
      |    CAST(SUM(sw) OVER w AS BIGINT) AS ww, sy, sw
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |pair AS (
      |  SELECT a.event_type, a.k AS ka, b.k AS kb, b.day AS day,
      |    b.sy AS sy, b.sw AS sw,
      |    CAST(b.pp - (a.pp - a.sy) AS DOUBLE)
      |      / CAST(b.ww - (a.ww - a.sw) AS DOUBLE) AS seg
      |  FROM pr a JOIN pr b ON a.event_type = b.event_type AND b.k >= a.k),
      |rm AS (
      |  SELECT event_type, kb, day, sy, sw,
      |    MIN(seg) OVER (PARTITION BY event_type, ka ORDER BY kb DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      |  FROM pair)
      |SELECT event_type, day,
      |  CAST(sy AS DOUBLE) / CAST(sw AS DOUBLE) AS day_mean_pennies,
      |  MAX(m) AS fitted_pennies
      |FROM rm GROUP BY event_type, day, sy, sw
      |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), Parity.day(col("ts")).as("day"))
      .agg(coalesce((sum(Parity.dec(col("value"))) * 100).cast("long"), lit(0L))
          .as("sy"),
        count(lit(1)).as("sw"))
    val part = Window.partitionBy(col("event_type"))
    val cum = part.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pr = d
      .withColumn("k", row_number().over(part.orderBy(col("day"))))
      .withColumn("pp", sum(col("sy")).over(cum).cast("long"))
      .withColumn("ww", sum(col("sw")).over(cum).cast("long"))
    val a = pr.select(col("event_type"), col("k").as("ka"),
      (col("pp") - col("sy")).as("pp0"), (col("ww") - col("sw")).as("ww0"))
    val b = pr.select(col("event_type"), col("k").as("kb"), col("day"),
      col("sy"), col("sw"), col("pp"), col("ww"))
    val pair = a.join(b, Seq("event_type")).filter(col("kb") >= col("ka"))
      .select(col("event_type"), col("ka"), col("kb"), col("day"),
        col("sy"), col("sw"),
        ((col("pp") - col("pp0")).cast("double")
          / (col("ww") - col("ww0")).cast("double")).as("seg"))
    val rmw = Window.partitionBy(col("event_type"), col("ka"))
      .orderBy(col("kb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pair.withColumn("m", min(col("seg")).over(rmw))
      .groupBy(col("event_type"), col("day"), col("sy"), col("sw"))
      .agg(max(col("m")).as("fitted_pennies"))
      .select(col("event_type"), col("day"),
        (col("sy").cast("double") / col("sw").cast("double"))
          .as("day_mean_pennies"),
        col("fitted_pennies"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Conformal miscoverage α = 1/[[ConfAlphaDen]] (80% target band). */
  private val ConfAlphaDen = 5

  /** x161: split-conformal prediction interval for the Holt one-step
    * forecast — the distribution-free calibration step (Vovk et al.;
    * Papadopoulos' inductive form) that turns ANY point forecaster into
    * one with a finite-sample coverage guarantee: the calibration
    * scores are the |one-step residuals| the x147 backtest walks
    * (exact integers at [[HoltScale]], because the Holt state is exact
    * integer), and the radius is the ⌈(m+1)·(1−α)⌉-th SMALLEST score —
    * a pure order statistic, no distributional assumption. Under
    * exchangeability P(|y_{n+1} − f| ≤ q̂) ≥ 1−α = 80%. The ceil index
    * is integer arithmetic (((m+1)·(d−1) + d−1) div d); the only floats
    * are three final /[[HoltScale]] divisions of exact longs.
    *
    * Scale shape: x139/x147's — one daily hash agg (the corpus-bound
    * stage), then a per-type fold over the bounded calendar axis; the
    * residual array, its sort, and the order-statistic pick all live
    * on ≤|days| elements per key, map-side after the agg. */
  val conformalInterval = Q.withOracle(
    "x161_conformal_interval",
    s"x161: split-conformal 80% band around the Holt one-step forecast per event type",
    s"""WITH RECURSIVE d AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |ax AS MATERIALIZED (
       |  SELECT event_type, day, y,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
       |      AS BIGINT) AS k,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM d),
       |h AS (
       |  SELECT event_type, k, n, y * $HoltScale AS l,
       |    CAST(0 AS BIGINT) AS b, CAST(NULL AS BIGINT) AS r
       |  FROM ax WHERE k = 1
       |  UNION ALL
       |  SELECT a.event_type, a.k, a.n,
       |    (a.y * $HoltScale + h.l + h.b) // 2,
       |    (((a.y * $HoltScale + h.l + h.b) // 2) - h.l + h.b) // 2,
       |    abs(a.y * $HoltScale - (h.l + h.b))
       |  FROM h JOIN ax a ON a.event_type = h.event_type AND a.k = h.k + 1),
       |scores AS (
       |  SELECT event_type, n, r,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r, k) AS rn
       |  FROM h WHERE k >= 2),
       |qd AS (
       |  SELECT event_type, CAST(MIN(n) AS BIGINT) AS n_days,
       |    CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST((COUNT(*) + 1) * ${ConfAlphaDen - 1} AS BIGINT) AS num
       |  FROM scores GROUP BY event_type),
       |pick AS (
       |  SELECT qd.event_type, qd.n_days, qd.m,
       |    (qd.num + ${ConfAlphaDen - 1}) // $ConfAlphaDen AS idx,
       |    s.r AS qhat_scaled
       |  FROM qd LEFT JOIN scores s ON s.event_type = qd.event_type
       |    AND s.rn = (qd.num + ${ConfAlphaDen - 1}) // $ConfAlphaDen),
       |fc AS (
       |  SELECT event_type, l + b AS f_scaled FROM h WHERE k = n)
       |SELECT p.event_type, p.n_days, p.m, CAST(p.idx AS BIGINT) AS idx,
       |  p.qhat_scaled,
       |  CAST(fc.f_scaled AS DOUBLE) / $HoltScale AS forecast,
       |  CAST(fc.f_scaled - p.qhat_scaled AS DOUBLE) / $HoltScale AS lo,
       |  CAST(fc.f_scaled + p.qhat_scaled AS DOUBLE) / $HoltScale AS hi
       |FROM pick p JOIN fc ON fc.event_type = p.event_type
       |ORDER BY p.event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    d.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("ax"),
        count(lit(1)).cast("long").as("n_days"))
      .select(col("event_type"), col("n_days"), expr(
        s"""aggregate(slice(ax, 2, CAST(size(ax) - 1 AS INT)),
           |  named_struct(
           |    'l', element_at(ax, 1).y * CAST($HoltScale AS BIGINT),
           |    'b', CAST(0 AS BIGINT),
           |    'rs', CAST(array() AS ARRAY<BIGINT>)),
           |  (acc, x) -> named_struct(
           |    'l', (x.y * $HoltScale + acc.l + acc.b) div 2,
           |    'b', (((x.y * $HoltScale + acc.l + acc.b) div 2) - acc.l + acc.b)
           |      div 2,
           |    'rs', concat(acc.rs,
           |      array(abs(x.y * $HoltScale - (acc.l + acc.b))))))"""
          .stripMargin).as("st"))
      .select(col("event_type"), col("n_days"),
        size(col("st.rs")).cast("long").as("m"),
        expr(s"((size(st.rs) + 1) * ${ConfAlphaDen - 1} + ${ConfAlphaDen - 1})"
          + s" div $ConfAlphaDen").cast("long").as("idx"),
        expr("array_sort(st.rs)").as("sorted"),
        (col("st.l") + col("st.b")).as("f_scaled"))
      .select(col("event_type"), col("n_days"), col("m"), col("idx"),
        when(col("idx") <= col("m"),
          expr("element_at(sorted, CAST(idx AS INT))")).as("qhat_scaled"),
        (col("f_scaled").cast("double") / HoltScale).as("forecast"),
        ((col("f_scaled") - when(col("idx") <= col("m"),
            expr("element_at(sorted, CAST(idx AS INT))"))).cast("double")
          / HoltScale).as("lo"),
        ((col("f_scaled") + when(col("idx") <= col("m"),
            expr("element_at(sorted, CAST(idx AS INT))"))).cast("double")
          / HoltScale).as("hi"))
      .orderBy(col("event_type"))
  }

  /** x167: day-of-week seasonal profile of daily event volume per type —
    * the additive weekday effect (mean volume on this weekday minus the
    * type's overall daily mean) every traffic/ops dashboard carries and
    * every forecast residual check subtracts first. Days are weighted
    * equally (the daily agg is the unit, not the event), and the effect
    * is the exact rational (s_d·n − s·n_d)/(n_d·n) — the x97
    * multiply-through discipline, so no mean is ever materialized and
    * the one float per row is the final division. DOW convention:
    * 0 = Sunday — DuckDB's EXTRACT(dow) natively; Spark's extract(DOW)
    * is 1-based (an alias of dayofweek, measured), so the Spark side
    * computes dayofweek − 1.
    *
    * Scale shape: one daily hash agg (the x97/x157/x161 corpus stage),
    * then two aggs on the bounded calendar axis; output ≤ |types|·7. */
  val dowProfile = Q.withOracle(
    "x167_dow_profile",
    "x167: day-of-week volume profile per event type (exact additive effects)",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type, CAST(EXTRACT(dow FROM day) AS BIGINT) AS dow,
      |    CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(y) AS BIGINT) AS sd
      |  FROM d GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_all,
      |    CAST(SUM(y) AS BIGINT) AS s_all
      |  FROM d GROUP BY 1)
      |SELECT g.event_type, g.dow, g.n_days, g.sd AS sum_events,
      |  CAST(g.sd AS DOUBLE) / g.n_days AS dow_mean,
      |  CAST(g.sd * t.n_all - t.s_all * g.n_days AS DOUBLE)
      |    / (g.n_days * t.n_all) AS effect
      |FROM g JOIN t USING (event_type)
      |ORDER BY g.event_type, g.dow""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    val g = d.groupBy(col("event_type"),
        (dayofweek(col("day")) - 1).cast("long").as("dow"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("y")).cast("long").as("sd"))
    val t = d.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_all"),
        sum(col("y")).cast("long").as("s_all"))
    g.join(broadcast(t), "event_type")
      .select(col("event_type"), col("dow"), col("n_days"),
        col("sd").as("sum_events"),
        (col("sd").cast("double") / col("n_days")).as("dow_mean"),
        ((col("sd") * col("n_all") - col("s_all") * col("n_days"))
          .cast("double") / (col("n_days") * col("n_all"))).as("effect"))
      .orderBy(col("event_type"), col("dow"))
  }

  val all: Seq[Q] =
    Seq(groupRegression, timeWeightedPrice, decayedPopularity, weightedMedian,
      cusumChangePoint, rollingSlope, autocorrelation, holtForecast,
      maxDrawdown, holtBacktest, theilSen, isotonic, conformalInterval,
      dowProfile)
}
