package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for a training pipeline.
  *
  * `sample(fraction)` and `TABLESAMPLE` are seeded per-partition and
  * reshuffle-dependent — at 100 TB the "same" sample differs between
  * runs, cluster sizes, and engines, which poisons train/holdout
  * hygiene. The portable primitive is a hash split: bucket each row by
  * a stable content hash of its key and assign splits by bucket range.
  * Same rows land in the same split on every engine, at any
  * parallelism, forever — and membership is a pure map-side predicate
  * (no shuffle, no state). */
object Sampling {

  /** First hex nibble of md5(key) — 16 stable buckets. */
  private def bucket16(key: org.apache.spark.sql.Column) =
    substring(md5(key.cast("string")), 1, 1)

  /** x17: deterministic 1/8 holdout split of `documents` by md5 bucket.
    * The split column is reproducible anywhere md5 exists; sampling a
    * different fraction is just a different bucket range. */
  val hashSplit = Q.withOracle(
    "x17_hash_split",
    "x17: deterministic md5-bucket train/holdout split",
    """SELECT doc_id,
      |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
      |    THEN 'holdout' ELSE 'train' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val b = bucket16(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), b.as("bucket"),
        when(b.isin("0", "1"), "holdout").otherwise("train").as("split"))
      .orderBy(col("doc_id"))
  }

  /** x19: stratified deterministic sample — exactly ⌈n/4⌉ docs per
    * `lang` stratum, chosen by md5 rank so membership is stable across
    * engines and runs. The per-stratum quota arithmetic stays integral
    * ((n+3) div 4): no float compare anywhere. One window pass per
    * stratum — at scale this is a single shuffle on the stratum key,
    * and per-stratum state is one counter. */
  val stratified = Q.withOracle(
    "x19_stratified_sample",
    "x19: md5-ranked quarter sample per lang stratum",
    """WITH ranked AS (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang FROM ranked
      |WHERE rn <= (n + 3) // 4
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val ranked = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(
        w.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(w))
    ranked.filter(expr("rn <= (n + 3) DIV 4"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Target mixture for x39 as INTEGER quotas against a fixed budget of
    * 200 sampled docs (en 40% / de 20% / es 20% / fr 10% / zh 10%).
    * Integer doc counts rather than float shares: `round(share * B)`
    * would put an IEEE-vs-DECIMAL rounding boundary inside the selection
    * predicate; integers keep the cut exact on any engine. */
  private val MixQuotas: Seq[(String, Int)] =
    Seq("en" -> 80, "de" -> 40, "es" -> 40, "fr" -> 20, "zh" -> 20)

  /** x39: domain-mixture rebalance — the pretraining "data mixing"
    * stage. Where x19 takes the SAME fraction of every stratum, x39
    * samples each domain toward a TARGET share of the output mixture,
    * clamped by availability (a short domain yields what it has; at
    * scale the shortfall feeds an upsampling/epoch-repeat decision).
    * Selection is md5-rank per domain: deterministic across engines,
    * runs, and parallelism. One shuffle on the domain key; the quota
    * table is a broadcast value list. */
  val domainMix = Q.withOracle(
    "x39_domain_mix",
    "x39: rebalance corpus to a target per-lang mixture by md5-ranked quota",
    s"""WITH targets(lang, quota) AS (VALUES
      |  ${MixQuotas.map { case (l, n) => s"('$l', $n)" }.mkString(", ")}),
      |ranked AS (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT r.doc_id, r.lang FROM ranked r JOIN targets t USING (lang)
      |WHERE r.rn <= t.quota
      |ORDER BY r.doc_id""".stripMargin) { (s, dir) =>
    val targets = s.createDataFrame(MixQuotas).toDF("lang", "quota")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w))
      .join(broadcast(targets), "lang")
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** x44's uniform draw: x26's Knuth modular hash (see Curation.scala
    * for the overflow argument) — pure integer arithmetic, identical on
    * any engine at any parallelism. */
  private[ext] val SamplePrime = 1000003L
  private[ext] val KnuthModP = 2654435761L % SamplePrime // = 427799

  /** x44: temperature-based language rebalancing — the multinomial
    * smoothing of XLM-R / mC4 (sample languages ∝ p_l^α) expressed as a
    * per-document acceptance test. Where x39 hits integer TARGET quotas
    * and x19 takes the SAME fraction everywhere, x44 interpolates: at
    * α = 1 the corpus is untouched, at α = 0 every language is
    * equalized. With the largest-feasible scaling (the smallest
    * language kept whole), the per-language keep rate is
    * rate_l = (n_min / n_l)^(1-α); this query pins α = 1/2 — the common
    * production temperature — so rate_l = sqrt(n_min / n_l).
    *
    * Bit-reproducibility (why α = 1/2 and not a pow() knob): the rate
    * is one long-to-double division (correctly rounded, IEEE) and one
    * sqrt (the ONE transcendental IEEE 754 requires correctly rounded),
    * so Spark and DuckDB compute the identical double and the u < rate
    * cut falls on the identical side on both engines. pow(x, α) carries
    * no such guarantee — a 1-ulp libm divergence right at a doc's draw
    * would flip membership between engines. The uniform is x26's
    * integer Knuth hash: exact everywhere.
    *
    * Scale shape: language counts are one map-side-combined aggregate
    * on a ~10²-cardinality key; the rate table broadcasts; membership
    * is a map-side predicate — no shuffle touches the corpus itself. */
  val langTemperature = Q.withOracle(
    "x44_lang_temp_resample",
    "x44: temperature (alpha=0.5) language rebalancing, deterministic accept",
    s"""WITH n AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang),
       |r AS (SELECT lang,
       |        sqrt(CAST((SELECT MIN(nl) FROM n) AS DOUBLE) / nl) AS rate
       |      FROM n)
       |SELECT d.doc_id, d.lang, r.rate,
       |  (CAST(((d.doc_id % $SamplePrime) * $KnuthModP) % $SamplePrime AS DOUBLE)
       |     / $SamplePrime) < r.rate AS kept
       |FROM documents d JOIN r USING (lang)
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    temperaturePipeline(Tables.documents(s, dir))
  }

  /** The x44 pipeline over an arbitrary (doc_id, lang) frame — shared
    * with the property spec's plain-Scala model comparison. */
  private[graft] def temperaturePipeline(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    val nmin = n.agg(min(col("nl")).as("nmin"))
    val rates = n.crossJoin(broadcast(nmin))
      .select(col("lang"), sqrt(col("nmin").cast("double") / col("nl")).as("rate"))
    docs.join(broadcast(rates), "lang")
      .select(col("doc_id"), col("lang"), col("rate"),
        ((((col("doc_id") % SamplePrime) * lit(KnuthModP)) % SamplePrime)
          .cast("double") / lit(SamplePrime) < col("rate")).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** x86: hash-sampled quantiles — a17's scale tier. Exact per-group
    * percentiles sort every row into the percentile buffers; at 100 TB
    * the production pattern is a DETERMINISTIC sample (the x60b DOULION
    * trick applied to order statistics): keep a row iff its md5 lands
    * in 1/4 of the space, take EXACT percentiles of the sample. The
    * sample predicate is engine-portable, so unlike approx_percentile
    * (x25b, no_oracle) the whole estimator replays bit-exactly in
    * DuckDB — sampling error is the accuracy price (spec-bounded
    * against a17's exact values), determinism is NOT sacrificed.
    * n_total rides along exactly (counting is cheap; sorting is not).
    *
    * Scale shape: one pruned scan, 3/4 of rows dropped map-side before
    * any shuffle; the percentile agg sees only the sample. */
  val sampledQuantiles = Q.withOracle(
    "x86_sampled_quantiles",
    "x86: deterministic 1/4-sample percentiles per return flag (a17's scale tier)",
    """WITH s AS (
      |  SELECT l_returnflag, l_quantity,
      |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
      |      CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 4 = 0 AS keep
      |  FROM lineitem),
      |tot AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_total,
      |    CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_sample
      |  FROM s GROUP BY 1),
      |q AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_quantity, 0.25) AS p25,
      |    quantile_cont(l_quantity, 0.50) AS p50,
      |    quantile_cont(l_quantity, 0.75) AS p75
      |  FROM s WHERE keep GROUP BY 1)
      |SELECT l_returnflag, n_total, n_sample, p25, p50, p75
      |FROM tot JOIN q USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val keep = conv(substring(md5(concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))),
        1, 15), 16, 10).cast("long") % 4 === 0
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"), keep.as("keep"))
    val tot = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n_total"),
        count(when(col("keep"), 1)).cast("long").as("n_sample"))
    val q = li.filter(col("keep"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.50)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
    tot.join(q, "l_returnflag").orderBy(col("l_returnflag"))
  }

  /** Number of half-sample replicates for x144 (one per bit of the
    * 60-bit portable md5 hash; 32 ≤ 60). */
  private val BootB = 32

  /** Replicate-mean ranks picked as the subagging interval: the 4th and
    * 29th smallest of 32 (≈ the 10th/90th percentile order statistics). */
  private val BootLoRank = 4
  private val BootHiRank = 29

  /** x144: subagging (half-sample bootstrap) confidence interval for the
    * mean order value — the uncertainty quantification every reported
    * metric should ship with, made DETERMINISTIC: replicate b keeps the
    * orders whose portable 60-bit md5 hash has bit b set (32 independent
    * half-samples from ONE hash evaluation, no RNG, engine-portable), so
    * the interval is reproducible across engines, runs, and cluster
    * sizes. Replicate means are single divisions of exact penny sums;
    * the interval picks the ${BootLoRank}th/${BootHiRank}th smallest of
    * the $BootB replicate means — order statistics over a 32-row frame,
    * ties broken by replicate id.
    *
    * Scale shape: ONE scan with a 32-way conditional-sum aggregate
    * (constant state: 32×2 longs), then all ranking happens on the
    * 32-row replicate frame. Never 32 scans, never a shuffle of raw
    * rows beyond the single all-to-one agg.
    *
    * Statistical note (honest label): half-samples give the m = n/2
    * out of n bootstrap — replicate spread is √2 wider than the n-sample
    * sampling error; the interval is reported RAW (no √2 rescale) as the
    * conservative subagging band. */
  val bootstrapCi = Q.withOracle(
    "x144_subagging_ci",
    s"x144: deterministic half-sample bootstrap ($BootB replicates) CI for mean order value",
    s"""WITH h AS (
       |  SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hb,
       |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p
       |  FROM orders),
       |b AS (SELECT unnest(generate_series(0, ${BootB - 1})) AS rep),
       |reps AS MATERIALIZED (
       |  SELECT rep,
       |    CAST(SUM(CASE WHEN (hb >> rep) & 1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN (hb >> rep) & 1 = 1 THEN p ELSE 0 END) AS BIGINT) AS s_b
       |  FROM h CROSS JOIN b GROUP BY rep),
       |rm AS MATERIALIZED (
       |  SELECT rep, n_b, s_b, CAST(s_b AS DOUBLE) / n_b AS m_b,
       |    ROW_NUMBER() OVER (ORDER BY CAST(s_b AS DOUBLE) / n_b, rep) AS rk
       |  FROM reps WHERE n_b > 0),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(p) AS BIGINT) AS s FROM h)
       |SELECT tot.n AS n_orders,
       |  CAST(tot.s AS DOUBLE) / tot.n AS full_mean,
       |  CAST(${BootB} AS BIGINT) AS n_replicates,
       |  MIN(CASE WHEN rk = $BootLoRank THEN m_b END) AS boot_lo,
       |  MIN(CASE WHEN rk = $BootHiRank THEN m_b END) AS boot_hi,
       |  MIN(CASE WHEN rk = $BootHiRank THEN m_b END)
       |    - MIN(CASE WHEN rk = $BootLoRank THEN m_b END) AS boot_spread
       |FROM rm CROSS JOIN tot GROUP BY tot.n, tot.s""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val h = Tables.orders(s, dir).select(
      conv(substring(md5(col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long").as("hb"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("p"))
    val repAggs = (0 until BootB).flatMap { b =>
      Seq(
        sum(when(shiftright(col("hb"), b).bitwiseAND(1) === 1, 1L).otherwise(0L))
          .cast("long").as(s"n$b"),
        sum(when(shiftright(col("hb"), b).bitwiseAND(1) === 1, col("p")).otherwise(0L))
          .cast("long").as(s"s$b"))
    }
    val allAggs = Seq(count(lit(1)).cast("long").as("n"),
      sum(col("p")).cast("long").as("s")) ++ repAggs
    val one = h.agg(allAggs.head, allAggs.tail: _*)
    val reps = one.select(col("n"), col("s"), explode(array((0 until BootB).map { b =>
        struct(lit(b.toLong).as("rep"), col(s"n$b").as("n_b"), col(s"s$b").as("s_b"))
      }: _*)).as("r"))
      .select(col("n"), col("s"), col("r.rep"), col("r.n_b"), col("r.s_b"))
      .filter(col("n_b") > 0)
      .withColumn("m_b", col("s_b").cast("double") / col("n_b"))
      .withColumn("rk", row_number().over(Window.orderBy(col("m_b"), col("rep"))))
    reps.groupBy(col("n"), col("s"))
      .agg(min(when(col("rk") === BootLoRank, col("m_b"))).as("boot_lo"),
        min(when(col("rk") === BootHiRank, col("m_b"))).as("boot_hi"))
      .select(col("n").as("n_orders"),
        (col("s").cast("double") / col("n")).as("full_mean"),
        lit(BootB.toLong).as("n_replicates"),
        col("boot_lo"), col("boot_hi"),
        (col("boot_hi") - col("boot_lo")).as("boot_spread"))
  }

  /** Stratum sampling quota denominator for x145 (¼ per stratum, the
    * x19 rule). */
  private val HtQuotaDen = 4

  /** x145: Horvitz–Thompson stratified total estimation — the survey-
    * sampling estimator that makes x19's deterministic stratified sample
    * USEFUL: each priority stratum's revenue total is estimated from its
    * md5-ranked ¼ quota sample as ŝ_g = sampled_sum · n_g / q_g, and the
    * estimate is reported NEXT TO the true total with its signed
    * relative error — per stratum, so every arithmetic step is a single
    * IEEE op over exact integers (no cross-stratum float sum; consumers
    * combine strata with their own precision policy).
    *
    * Scale shape: one stratum-keyed rank window (the x19 shape — a
    * per-stratum shuffle any stratified sampler pays), one hash agg;
    * output is |strata| rows. */
  val horvitzThompson = Q.withOracle(
    "x145_ht_stratified_total",
    s"x145: per-stratum Horvitz-Thompson revenue total from the md5-ranked quarter sample",
    s"""WITH ranked AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p,
       |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
       |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn,
       |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
       |  FROM orders)
       |SELECT g, CAST(MIN(n) AS BIGINT) AS n_g,
       |  CAST((MIN(n) + ${HtQuotaDen - 1}) // $HtQuotaDen AS BIGINT) AS q_g,
       |  CAST(SUM(CASE WHEN rn <= (n + ${HtQuotaDen - 1}) // $HtQuotaDen
       |    THEN p ELSE 0 END) AS BIGINT) AS sampled_pennies,
       |  CAST(SUM(p) AS BIGINT) AS true_pennies,
       |  CAST(SUM(CASE WHEN rn <= (n + ${HtQuotaDen - 1}) // $HtQuotaDen
       |      THEN p ELSE 0 END) AS DOUBLE)
       |    * MIN(n) / ((MIN(n) + ${HtQuotaDen - 1}) // $HtQuotaDen)
       |    AS ht_estimate,
       |  (CAST(SUM(CASE WHEN rn <= (n + ${HtQuotaDen - 1}) // $HtQuotaDen
       |      THEN p ELSE 0 END) AS DOUBLE)
       |    * MIN(n) / ((MIN(n) + ${HtQuotaDen - 1}) // $HtQuotaDen)
       |    - CAST(SUM(p) AS DOUBLE)) / CAST(SUM(p) AS DOUBLE) AS rel_err
       |FROM ranked GROUP BY g ORDER BY g""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g"))
    val ranked = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("p"),
        col("o_orderkey"))
      .withColumn("rn", row_number().over(
        w.orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))))
      .withColumn("n", count(lit(1)).over(w))
    val quota = expr(s"(n + ${HtQuotaDen - 1}) DIV $HtQuotaDen")
    val agg = ranked.groupBy(col("g"))
      .agg(min(col("n")).cast("long").as("n_g"),
        sum(when(col("rn") <= quota, col("p")).otherwise(0L)).cast("long")
          .as("sampled_pennies"),
        sum(col("p")).cast("long").as("true_pennies"))
      .withColumn("q_g",
        expr(s"(n_g + ${HtQuotaDen - 1}) DIV $HtQuotaDen").cast("long"))
    val est = col("sampled_pennies").cast("double") * col("n_g") / col("q_g")
    agg.select(col("g"), col("n_g"), col("q_g"),
        col("sampled_pennies"), col("true_pennies"),
        est.as("ht_estimate"),
        ((est - col("true_pennies").cast("double"))
          / col("true_pennies").cast("double")).as("rel_err"))
      .orderBy(col("g"))
  }

  /** Priority-sample size (k); the threshold τ is the (k+1)-th
    * priority. Shared with [[graft.streaming.PrioritySampleFeed]]. */
  private[graft] val PriK = 64
  /** Hash-uniform modulus/multiplier — the x26 Knuth pair (prime P,
    * 2654435761 mod P), kept modular so the multiply never overflows
    * under ANSI at 100 TB key ranges. */
  private[graft] val PriP = 1000003L
  private[graft] val PriH = 2654435761L % PriP // = 427799

  /** Per-row priorities (o_orderkey, w, q) from an orders frame — stage
    * 1 of x159, shared with the incremental feed (identical expressions
    * ⇒ identical priorities ⇒ identical top-k whatever the batching). */
  private[graft] def prioritized(orders: DataFrame): DataFrame = {
    val base = orders.select(
      col("o_orderkey"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("w"),
      (((col("o_orderkey") % PriP) * PriH) % PriP + 1).as("m"))
    base.select(col("o_orderkey"), col("w"),
      ((col("w") * PriP).cast("double") / col("m")).as("q"))
  }

  /** Stage 2: the (k+1)-row priority shortlist — a TakeOrdered, the
    * ONLY state the sample needs (an order-statistic sketch: the global
    * top-(k+1) of a union is the top-(k+1) of the per-part
    * top-(k+1)s, which is what makes the feed's fold exact). */
  private[graft] def selectTop(pq: DataFrame): DataFrame =
    pq.orderBy(col("q").desc, col("o_orderkey")).limit(PriK + 1)

  /** Stage 3: rank the ≤(k+1)-row shortlist, stamp τ, emit the sample
    * frame (x159's output contract; empty when the shortlist has not
    * yet filled — no τ exists, so no estimator is defensible). */
  private[graft] def sampleFrame(top: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rk = top.withColumn("rn",
      row_number().over(Window.orderBy(col("q").desc, col("o_orderkey"))))
    val tau = rk.filter(col("rn") === PriK + 1).select(col("q").as("tau"))
    rk.filter(col("rn") <= PriK).crossJoin(broadcast(tau))
      .select(col("o_orderkey"), col("w").as("w_pennies"),
        col("q").as("priority"), col("tau"),
        greatest(col("w").cast("double"), col("tau")).as("w_hat"))
      .orderBy(col("priority").desc, col("o_orderkey"))
  }

  /** x159: priority sampling (Duffield–Lund–Thorup) — the fixed-size
    * weighted sample that supports UNBIASED subset-sum estimation:
    * each order draws a stable hash-uniform m ∈ [1, P], gets priority
    * q = w·P / m (w = exact totalprice pennies), and the sample is the
    * top-[[PriK]] priorities with threshold τ = the (k+1)-th. The
    * estimator ŵ = max(w, τ) satisfies E[Σ_S ŵ·1{i∈A}] = Σ_A w for any
    * item subset A — the sketch that answers "total spend of any
    * future predicate" from k rows. Everything before the final
    * max(w, τ) is exact integers; q is ONE division of exact
    * integer-valued doubles (w·P ≤ 5·10¹³ < 2⁵³), so both engines
    * compute identical priorities, identical top-k, identical τ.
    *
    * Scale shape: the selection is a TakeOrdered(k+1) — per-partition
    * heaps, no global sort, no corpus-wide window (the 65-row rank
    * window sits ABOVE the limit); weights and hashes are map-side. */
  val prioritySample = Q.withOracle(
    "x159_priority_sample",
    s"x159: top-$PriK priority sample of orders with threshold estimator max(w, tau)",
    s"""WITH base AS (
       |  SELECT o_orderkey,
       |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS w,
       |    ((o_orderkey % $PriP) * $PriH) % $PriP + 1 AS m
       |  FROM orders),
       |pq AS (
       |  SELECT o_orderkey, w, CAST(w * $PriP AS DOUBLE) / m AS q FROM base),
       |top AS (
       |  SELECT o_orderkey, w, q FROM pq
       |  ORDER BY q DESC, o_orderkey LIMIT ${PriK + 1}),
       |rk AS (
       |  SELECT o_orderkey, w, q,
       |    ROW_NUMBER() OVER (ORDER BY q DESC, o_orderkey) AS rn FROM top),
       |tau AS (SELECT q AS tau FROM rk WHERE rn = ${PriK + 1})
       |SELECT rk.o_orderkey, rk.w AS w_pennies, rk.q AS priority, tau.tau,
       |  GREATEST(CAST(rk.w AS DOUBLE), tau.tau) AS w_hat
       |FROM rk, tau WHERE rk.rn <= $PriK
       |ORDER BY rk.q DESC, rk.o_orderkey""".stripMargin) { (s, dir) =>
    // 65-row frame above sampleFrame's unpartitioned window: bounded by
    // the GlobalLimit below it (the PlanAuditSpec structural witness)
    sampleFrame(selectTop(prioritized(Tables.orders(s, dir))))
  }

  /** x185: the epochs table — the one-page plan a pretraining run is
    * actually configured from (Gao et al. 2020, "The Pile", table 1:
    * per-source size, mixture weight, and EPOCHS = how many passes over
    * the source the weighted mix implies). Weights are α = 1/2
    * temperature sampling over token mass (the multilingual-LM standard,
    * Arivazhagan et al. 2019; x44's √ discipline — IEEE sqrt is
    * correctly rounded, so it is oracle-safe where log is not):
    * w_s = √tokens_s / Σ √tokens_s, and at a one-total-token budget,
    * epochs_s = w_s · T / tokens_s — >1 means the mix up-samples the
    * source past a full pass (memorization risk), ≪1 means most of it
    * is never seen. The Σ runs as a pinned-order fold over the
    * ≤|sources|-row table, so every double replays bit-exactly.
    *
    * Scale shape: ONE (source, token-count) hash agg over the corpus
    * (map-side combined), then everything lives on the bounded source
    * axis with one 1-row broadcast scalar. */
  val epochPlan = Q.withOracle(
    "x185_epoch_plan",
    "x185: per-source temperature mix weights + implied training epochs",
    """WITH per AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      |  FROM documents GROUP BY 1),
      |den AS (
      |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(sqrt(CAST(toks AS DOUBLE)) ORDER BY source)),
      |      (a, x) -> a + x) AS den,
      |    CAST(SUM(toks) AS BIGINT) AS t
      |  FROM per)
      |SELECT source, n_docs, toks AS n_tokens,
      |  CAST(toks AS DOUBLE) / t AS token_share,
      |  sqrt(CAST(toks AS DOUBLE)) / den AS mix_weight,
      |  sqrt(CAST(toks AS DOUBLE)) / den * CAST(t AS DOUBLE)
      |    / CAST(toks AS DOUBLE) AS epochs
      |FROM per CROSS JOIN den
      |ORDER BY source""".stripMargin) { (s, dir) =>
    val per = Tables.documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("tk")).cast("long").as("toks"))
    // pinned-order √-mass fold over the bounded source axis + totals
    val den = per.agg(
      array_sort(collect_list(struct(col("source"),
        sqrt(col("toks").cast("double")).as("sq")))).as("xs"),
      sum(col("toks")).cast("long").as("t"))
      .select(aggregate(col("xs"), lit(0.0),
        (acc, x) => acc + x.getField("sq")).as("den"), col("t"))
    per.crossJoin(broadcast(den)) // one scalar row
      .select(col("source"), col("n_docs"), col("toks").as("n_tokens"),
        (col("toks").cast("double") / col("t").cast("double")).as("token_share"),
        (sqrt(col("toks").cast("double")) / col("den")).as("mix_weight"),
        (sqrt(col("toks").cast("double")) / col("den") * col("t").cast("double")
          / col("toks").cast("double")).as("epochs"))
      .orderBy(col("source"))
  }

  /** x190 epoch cap: no language's allocation may exceed this many
    * passes over its own data (UniMax's one knob — repeating a
    * low-resource language too often memorizes it). */
  private val UniEpochCap = 2L

  /** x190 token budget in corpus passes — DYADIC on purpose (1.5·T is
    * one exact IEEE multiply), and strictly below [[UniEpochCap]] so at
    * least one language is always uncapped and the budget always
    * allocates fully. ONE constant interpolated into both engines. */
  private val UniBudgetPasses = 1.5

  /** x190: UniMax language-budget allocation (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining") — the alternative to x44/
    * x185's temperature sampling: spread the training-token budget as
    * UNIFORMLY across languages as possible, subject to a per-language
    * epoch cap. Languages small enough that `cap·tokens` is below the
    * uniform share are capped at [[UniEpochCap]] epochs; the freed
    * budget redistributes uniformly over the rest (water-filling with
    * per-item caps). Budget = 1.5 corpus passes (dyadic, so
    * `B = 1.5·T` is ONE exact IEEE multiply).
    *
    * Closed form instead of an iterative loop: sort languages by cap
    * ascending; with exclusive prefix-cap sum P_i, the candidate
    * uniform share t_i = (B − P_{i−1})/(L − i + 1) assumes languages
    * 1..i−1 are capped — language i is capped IFF t_i > cap_i (once
    * t_i ≤ cap_i, t_{i+1} ≤ cap_i ≤ cap_{i+1} inductively, so the rule
    * is per-row-correct with no fixpoint). The final share every
    * uncapped language receives is t at the FIRST uncapped row. Since
    * budget ≤ cap·T, at least one language is always uncapped, and the
    * full budget is allocated exactly.
    *
    * Exactness: token counts and caps are exact BIGINT; prefix sums
    * exact; each t_i is one double subtraction (exact: both ≤ 2⁵³) and
    * one IEEE division — the identical expression tree in DuckDB.
    *
    * Scale shape: ONE (lang, token-count) hash agg over the corpus
    * (map-side combined); everything after lives on the bounded
    * language axis — the unpartitioned windows sit ABOVE that
    * aggregate (the registry audit's structural-witness rule), and the
    * 1-row first-uncapped-share scalar joins back on a constant key
    * (broadcast hash join, not a cross join). */
  val unimaxMix = Q.withOracle(
    "x190_unimax_mix",
    s"x190: UniMax epoch-capped uniform language allocation (cap=$UniEpochCap epochs, budget=$UniBudgetPasses corpus passes)",
    s"""WITH per AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
       |  FROM documents GROUP BY 1),
       |pc AS (SELECT *, $UniEpochCap * toks AS cap FROM per),
       |w AS (
       |  SELECT *,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cap, lang) AS BIGINT) AS rnk,
       |    CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, lang
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS lcnt,
       |    CAST(SUM(toks) OVER () AS BIGINT) AS t
       |  FROM pc),
       |w2 AS (SELECT *, ($UniBudgetPasses * t - p) / (lcnt - rnk + 1) AS ti FROM w),
       |ts AS (SELECT ti AS tstar FROM w2 WHERE ti <= cap ORDER BY rnk LIMIT 1),
       |a AS (
       |  SELECT w2.*, CASE WHEN w2.ti > w2.cap THEN CAST(w2.cap AS DOUBLE)
       |    ELSE ts.tstar END AS alloc
       |  FROM w2 LEFT JOIN ts ON TRUE)
       |SELECT lang, n_docs, toks AS n_tokens, CAST(cap AS BIGINT) AS cap_tokens,
       |  CAST(CASE WHEN ti > cap THEN 1 ELSE 0 END AS BIGINT) AS capped,
       |  alloc AS alloc_tokens, alloc / toks AS epochs
       |FROM a ORDER BY lang""".stripMargin) { (s, dir) =>
    val per = Tables.documents(s, dir)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("tk"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("tk")).cast("long").as("toks"))
      .withColumn("cap", lit(UniEpochCap) * col("toks"))
    waterfill(per, UniBudgetPasses)
  }

  /** The closed-form capped water-filling over a bounded
    * (lang, n_docs, toks, cap) table at `budgetPasses`·Σtoks budget —
    * factored so the all-capped branch (budget ≥ Σcaps, unreachable from
    * the registered query since [[UniBudgetPasses]] < [[UniEpochCap]])
    * stays testable on crafted tables (SamplingSpec): there the LEFT
    * join's 1-row share table is EMPTY and every language allocates its
    * cap, leaving budget unspent. Every window runs over the bounded
    * per-language aggregate. */
  private[graft] def waterfill(per: DataFrame, budgetPasses: Double): DataFrame = {
    val ordW = Window.orderBy(col("cap"), col("lang"))
    val totW = Window.partitionBy()
    val w2 = per
      .withColumn("rnk", row_number().over(ordW).cast("long"))
      .withColumn("p", coalesce(
        sum(col("cap")).over(ordW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).cast("long"))
      .withColumn("lcnt", count(lit(1)).over(totW).cast("long"))
      .withColumn("t", sum(col("toks")).over(totW).cast("long"))
      .withColumn("ti",
        (lit(budgetPasses) * col("t") - col("p")) / (col("lcnt") - col("rnk") + 1))
    val ts = w2.filter(col("ti") <= col("cap")).orderBy(col("rnk")).limit(1)
      .select(col("ti").as("tstar")).withColumn("__k", lit(1))
    w2.withColumn("__k", lit(1))
      .join(broadcast(ts), Seq("__k"), "left")
      .withColumn("alloc",
        when(col("ti") > col("cap"), col("cap").cast("double"))
          .otherwise(col("tstar")))
      .select(col("lang"), col("n_docs"), col("toks").as("n_tokens"),
        col("cap").as("cap_tokens"),
        when(col("ti") > col("cap"), 1L).otherwise(0L).as("capped"),
        col("alloc").as("alloc_tokens"),
        (col("alloc") / col("toks")).as("epochs"))
      .orderBy(col("lang"))
  }

  val all: Seq[Q] =
    Seq(hashSplit, stratified, domainMix, langTemperature, sampledQuantiles,
      bootstrapCi, horvitzThompson, prioritySample, epochPlan, unimaxMix)
}
