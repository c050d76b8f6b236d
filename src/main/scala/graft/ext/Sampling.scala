package graft.ext

import graft.{Q, Tables}
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
  private val SamplePrime = 1000003L
  private val KnuthModP = 2654435761L % SamplePrime // = 427799

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

  val all: Seq[Q] =
    Seq(hashSplit, stratified, domainMix, langTemperature, sampledQuantiles)
}
