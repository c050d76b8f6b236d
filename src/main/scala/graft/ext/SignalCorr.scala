package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** x191: quality-signal rank-correlation panel — the filter-redundancy
  * analysis a production curation pipeline runs before composing gates
  * (the FineWeb/Dolma ablation question: "are my quality signals
  * measuring the same thing, and is any of them secretly just a length
  * filter?"). Pairwise Spearman rank correlation over one joined panel
  * of four per-document signals, each reused from its own operator so
  * the panel can never drift from the signals it correlates:
  *
  *   - `len`  — token count (the confound every length-biased filter
  *     degenerates into; FineWeb's ablations check exactly this),
  *   - `heur` — x8/x25's distinct-token-ratio heuristic
  *     ([[Curation.qualityScore]]),
  *   - `lm`   — x172's Kneser–Ney mean bigram probability
  *     ([[Corpus.knScored]]),
  *   - `dsir` — x177's hashed-bigram importance ratio ([[Dsir.scored]]).
  *
  * Universe: documents with ≥2 tokens (the LM and DSIR signals are
  * defined over bigrams; Spearman needs complete cases). Ranks follow
  * the repo's x117 convention — exact permutations under the
  * deterministic (signal, doc_id) tiebreak, so the classic
  * 1 − 6·Σd²/(n(n²−1)) closed form applies verbatim and every output
  * double is one identical expression over exact BIGINT inputs.
  *
  * Scale shape: each signal is its own linear pass (x172's three keyed
  * LM shuffles dominate; DSIR's explode feeds bounded bucket aggs); the
  * four exact global ranks run as [[SegmentedRank]] segmented scans (no
  * single-partition corpus sort — at 100 TB a global ROW_NUMBER window
  * is the one forbidden shape); the finale is ONE keyless agg (map-side
  * combined) carrying all six Σd² terms, unpivoted over a 6-row literal
  * axis. Σd² < n³ fits BIGINT to n ≈ 2.1e6 ranked docs (the x117
  * headroom note); past that, emit decimal(38,0) and finish client-side. */
object SignalCorr {

  /** The signal pairs, alphabetical within and across — the ONE list
    * both the Spark aggregation and the oracle SQL are generated from
    * (the r14-advice discipline: a shared list cannot desynchronize). */
  private val Pairs = Seq(
    ("dsir", "heur"), ("dsir", "len"), ("dsir", "lm"),
    ("heur", "len"), ("heur", "lm"), ("len", "lm"))

  private def rhoSql(n: String, d2: String): String =
    s"""CASE WHEN $n > 1 THEN
       |    1.0 - 6.0 * CAST($d2 AS DOUBLE)
       |      / (CAST($n AS DOUBLE)
       |         * (CAST($n AS DOUBLE) * CAST($n AS DOUBLE) - 1.0))
       |  END""".stripMargin

  /** The signal-panel oracle CTE prefix (`u`..`r`: the joined 4-signal
    * panel with exact tie-broken ranks and the panel size `n`) — shared
    * by x191 and x191b so the two views of the panel can never drift. */
  private def panelOracleCtes: String =
    s"""u AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
       |    ${Curation.qualityScoreSql} AS heur
       |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
       |lmq AS (SELECT doc_id, score AS lm FROM
       |  (WITH ${Corpus.knOracleCtes}
       |   SELECT doc_id, sp / n_bigrams AS score FROM s)),
       |dsq AS (SELECT doc_id, score AS dsir FROM
       |  (WITH ${Dsir.dsirOracleCtes}
       |   SELECT doc_id, score FROM sc)),
       |j AS (SELECT u.doc_id, u.len, u.heur, lmq.lm, dsq.dsir
       |      FROM u JOIN lmq USING (doc_id) JOIN dsq USING (doc_id)),
       |r AS (SELECT
       |    ROW_NUMBER() OVER (ORDER BY len, doc_id) AS r_len,
       |    ROW_NUMBER() OVER (ORDER BY heur, doc_id) AS r_heur,
       |    ROW_NUMBER() OVER (ORDER BY lm, doc_id) AS r_lm,
       |    ROW_NUMBER() OVER (ORDER BY dsir, doc_id) AS r_dsir,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n
       |  FROM j)""".stripMargin

  private def signalCorrOracle: String = {
    val d2Terms = Pairs.map { case (a, b) =>
      s"""CAST(SUM(CAST(r_$a - r_$b AS DECIMAL(18,0))
         |      * CAST(r_$a - r_$b AS DECIMAL(18,0))) AS BIGINT) AS d2_${a}_$b"""
        .stripMargin
    }.mkString(",\n    ")
    val unions = Pairs.map { case (a, b) =>
      s"SELECT '${a}_vs_$b' AS pair, n_docs, d2_${a}_$b AS sum_d2 FROM a"
    }.mkString("\n  UNION ALL ")
    s"""WITH $panelOracleCtes,
       |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    $d2Terms
       |  FROM r),
       |p AS (
       |  $unions)
       |SELECT pair, n_docs, sum_d2,
       |  ${rhoSql("n_docs", "sum_d2")} AS rho
       |FROM p ORDER BY pair""".stripMargin
  }

  val signalCorrelation: Q = Q.withOracle(
    "x191_signal_correlation",
    "x191: pairwise Spearman panel over the len/heuristic/LM/DSIR quality signals (segmented exact ranks, one keyless agg)",
    signalCorrOracle) { (s, dir) =>
    val ranked = rankedPanel(s, dir)
    // ONE keyless agg carries n and all six Σd² terms
    val d2Aggs = Pairs.map { case (a, b) =>
      val d = (col(s"r_$a") - col(s"r_$b")).cast("decimal(18,0)")
      sum(d * d).cast("long").as(s"d2_${a}_$b")
    }
    val aggRow = ranked.agg(
      count(lit(1)).cast("long").as("n_docs"), d2Aggs: _*)
    val nD = col("n_docs").cast("double")
    aggRow
      .select(col("n_docs"), explode(array(Pairs.map { case (a, b) =>
        struct(lit(s"${a}_vs_$b").as("pair"),
          col(s"d2_${a}_$b").as("sum_d2"))
      }: _*)).as("p"))
      .select(col("p.pair").as("pair"), col("n_docs"),
        col("p.sum_d2").as("sum_d2"),
        when(col("n_docs") > 1,
          lit(1.0) - lit(6.0) * col("p.sum_d2").cast("double")
            / (nD * (nD * nD - 1.0))).as("rho"))
      .orderBy(col("pair"))
  }

  /** The joined 4-signal panel with exact tie-broken ranks (`r_len`,
    * `r_heur`, `r_lm`, `r_dsir`) and the panel size `n` (the same value
    * on every row, from the bounded offsets table — not a corpus-wide
    * window). Shared by x191 and x191b. */
  private def rankedPanel(s: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val base = Tables.documents(s, dir)
      .filter(size(t) >= 2)
      .select(col("doc_id"), size(t).cast("long").as("len"),
        Curation.qualityScore.as("heur"))
    val lm = Corpus.knScored(s, dir)
      .select(col("doc_id"), col("score").as("lm"))
    val ds = Dsir.scored(s, dir)
      .select(col("doc_id"), col("score").as("dsir"))
    val joined = base.join(lm, "doc_id").join(ds, "doc_id")
    // exact global rank per signal — one segmented scan each, never a
    // single-partition window. Segments: len is its own (data-bounded)
    // segment; heur/lm live in (0,1] → floor(v·4096) (the x25 grain);
    // dsir is bounded by (nr+B)/(nt+B) → floor(v·1024) (the x177 grain).
    def rank(df: DataFrame, sig: String, seg: Column, keepN: Boolean) = {
      val r = SegmentedRank.withGlobalRank(df, seg, Seq(col(sig), col("doc_id")))
        .withColumnRenamed("r", s"r_$sig")
      if (keepN) r else r.drop("n")
    }
    rank(rank(rank(rank(
      joined, "len", col("len"), keepN = false),
      "heur", floor(col("heur") * 4096).cast("long"), keepN = false),
      "lm", floor(col("lm") * 4096).cast("long"), keepN = false),
      "dsir", floor(col("dsir") * 1024).cast("long"), keepN = true)
  }

  private def topOverlapOracle: String = {
    val ovTerms = Pairs.map { case (a, b) =>
      s"""CAST(SUM(CASE WHEN r_$a > n - (n + 3) // 4
         |      AND r_$b > n - (n + 3) // 4 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ov_${a}_$b""".stripMargin
    }.mkString(",\n    ")
    val unions = Pairs.map { case (a, b) =>
      s"SELECT '${a}_vs_$b' AS pair, n_docs, quota, ov_${a}_$b AS overlap FROM a"
    }.mkString("\n  UNION ALL ")
    s"""WITH $panelOracleCtes,
       |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST((MAX(n) + 3) // 4 AS BIGINT) AS quota,
       |    $ovTerms
       |  FROM r),
       |p AS (
       |  $unions)
       |SELECT pair, n_docs, quota, overlap,
       |  CAST(overlap AS DOUBLE) / (2 * quota - overlap) AS jaccard,
       |  CAST(overlap AS DOUBLE) * n_docs / (quota * quota) AS lift
       |FROM p ORDER BY pair""".stripMargin
  }

  /** x191b: top-quartile keep-set overlap between the signal pairs —
    * the ACTIONABLE half of x191: rank correlation says two signals
    * agree globally; gating composition cares whether they keep the
    * SAME documents. For each pair, the top-⌈n/4⌉ keep sets (x177's
    * quota rule, applied per signal over the shared ranked panel) are
    * intersected: `overlap` (exact count), `jaccard`
    * (overlap/(2k−overlap)), and `lift` (overlap·n/k² — observed over
    * the k²/n expected under independent signals; 1.0 = unrelated
    * filters, 4.0 = identical keep sets at quarter quotas).
    *
    * Scale shape: x191's panel + ranks verbatim (shared frame), then
    * ONE keyless agg carrying all six overlap counts (per-row keep
    * flags are integer comparisons against the broadcast-derived `n`)
    * and the 6-row literal unpivot. */
  val topOverlap: Q = Q.withOracle(
    "x191b_signal_top_overlap",
    "x191b: top-quartile keep-set overlap/jaccard/lift between the x191 signal pairs (shared ranked panel, one keyless agg)",
    topOverlapOracle) { (s, dir) =>
    val ranked = rankedPanel(s, dir)
    def keep(sig: String) =
      col(s"r_$sig") > col("n") - expr("(n + 3) div 4")
    val ovAggs = Pairs.map { case (a, b) =>
      sum(when(keep(a) && keep(b), 1L).otherwise(0L)).cast("long")
        .as(s"ov_${a}_$b")
    }
    val aggCols = count(lit(1)).cast("long").as("n_docs") +:
      expr("CAST((max(n) + 3) div 4 AS BIGINT)").as("quota") +: ovAggs
    val aggRow = ranked.agg(aggCols.head, aggCols.tail: _*)
    aggRow
      .select(col("n_docs"), col("quota"),
        explode(array(Pairs.map { case (a, b) =>
          struct(lit(s"${a}_vs_$b").as("pair"),
            col(s"ov_${a}_$b").as("overlap"))
        }: _*)).as("p"))
      .select(col("p.pair").as("pair"), col("n_docs"), col("quota"),
        col("p.overlap").as("overlap"),
        (col("p.overlap").cast("double") /
          (lit(2) * col("quota") - col("p.overlap"))).as("jaccard"),
        (col("p.overlap").cast("double") * col("n_docs") /
          (col("quota") * col("quota"))).as("lift"))
      .orderBy(col("pair"))
  }

  val all: Seq[Q] = Seq(signalCorrelation, topOverlap)
}
