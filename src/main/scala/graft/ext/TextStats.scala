package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM-data pipeline over `documents`:
  * language ID, quality scoring, token counting, and document
  * fingerprinting. All pure Column expressions (whole-stage codegen'd, no
  * UDFs) — at 100 TB these run as a single scan-project with no shuffle at
  * all; only the optional per-corpus rollups aggregate.
  */
object TextStats {

  private def toks(c: Column): Column = split(c, " ")

  /** Marker-stopword counts per language. The heuristic is deliberately
    * simple and fully deterministic: count exact-token hits against small
    * marker sets, argmax with a fixed priority order for ties. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et"))

  private def markerCount(c: Column, words: Seq[String]): Column =
    size(filter(toks(c), t => words.map(w => t === w).reduce(_ || _)))

  private def markerCountSql(words: Seq[String]): String = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> t IN ($inList)))"
  }

  /** Language ID via n-gram/stopword heuristic. At scale this is a pure
    * map — no shuffle; the rollup here groups by (lang, predicted) so the
    * oracle can check the whole confusion matrix compactly. */
  val langId = Q.withOracle(
    "x7_lang_id",
    "language-ID heuristic: marker-token scoring + deterministic argmax",
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    ${markers.map { case (l, ws) => s"${markerCountSql(ws)} AS c_$l" }.mkString(",\n    ")}
       |  FROM documents),
       |pred AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
       |         WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
       |         WHEN c_es >= c_fr THEN 'es'
       |         ELSE 'fr' END AS predicted
       |  FROM scored)
       |SELECT lang, predicted, COUNT(*) AS n FROM pred
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
    val scored = d.select(col("doc_id") +: col("lang") +:
      markers.map { case (l, ws) => markerCount(col("text"), ws).as(s"c_$l") }: _*)
    val predicted = when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es") &&
        col("c_en") >= col("c_fr"), "en")
      .when(col("c_de") >= col("c_es") && col("c_de") >= col("c_fr"), "de")
      .when(col("c_es") >= col("c_fr"), "es")
      .otherwise("fr")
    scored.withColumn("predicted", predicted)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Quality scoring: length/uniqueness/stopword ratios combined into a
    * deterministic score — the filter stage of a pretraining pipeline. */
  val quality = Q.withOracle(
    "x8_quality_score",
    "doc quality: token stats + stopword ratio + composite score",
    """SELECT doc_id,
      |  length(text) AS n_chars,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS uniq_ratio,
      |  CAST(len(list_filter(string_split(text, ' '),
      |    t -> t IN ('the', 'a', 'and', 'of'))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stop_ratio
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val t = toks(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_uniq"),
      (size(array_distinct(t)) * lit(1.0) / size(t)).as("uniq_ratio"),
      (markerCount(col("text"), markers.head._2) * lit(1.0) / size(t)).as("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenizer
    * (letter runs / digit runs / single non-space symbols). */
  val tokenCount = Q.withOracle(
    "x9_token_counts",
    "whitespace + regex (BPE-ish) token counts per doc",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).cast("long").as("n_re_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: rolling polynomial hash folded over tokens,
    * modulus kept small enough that no step overflows a 64-bit signed int
    * in either engine. Order-sensitive by design (unlike a set hash). */
  val fingerprint = Q.withOracle(
    "x10_fingerprint",
    "rolling polynomial hash over the token stream",
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ' '),
      |        t -> CAST(length(t) * 97 + ascii(substring(t, 1, 1)) AS BIGINT))),
      |    (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      aggregate(toks(col("text")), lit(0L),
        (acc, t) => pmod(acc * lit(131L) + length(t) * lit(97L) + ascii(substring(t, 1, 1)),
          lit(1000000007L))).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** x18: TF-IDF top term per document. The idf here is the raw ratio
    * N/df rather than log(N/df): ranking is unchanged (log is
    * monotonic) and the score stays in exactly-reproducible IEEE
    * arithmetic — `tf * (N/df)` is one division and one multiply,
    * bit-identical on any engine, where libm log can differ in the last
    * ulp between runtimes. Two aggregations (term-frequency, doc-
    * frequency) and one window top-1 — each a single key shuffle. */
  val tfidfTop = Q.withOracle(
    "x18_tfidf_topterm",
    "x18: top TF-IDF term per doc (ratio idf, exact arithmetic)",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |    tf * (CAST(n_docs AS DOUBLE) / df) AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tf, df, score FROM scored
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
      |  ORDER BY score DESC, term) = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val toksDf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toksDf.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toksDf.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * (col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"))
  }

  /** Pseudo-line / pseudo-paragraph window sizes for x175. The corpus's
    * documents are single-line token streams (no '\n' structure), so the
    * Gopher line/paragraph rules are applied to DISJOINT token windows:
    * a "line" is 10 consecutive tokens, a "paragraph" 30 — deterministic,
    * content-independent segmentation that preserves exactly what the
    * rules measure (verbatim repeated runs of text within a document). */
  private[ext] val LineLen = 10
  private val ParaLen = 30

  /** Word n-gram orders for the repetition battery: top-gram char share
    * at n = 2, 3, 4 (Gopher's "fraction of characters contained in the
    * most frequent n-gram") and all-duplicate char share at n = 5. */
  private val TopGramNs = Seq(2, 3, 4)
  private val DupGramN = 5

  /** Disjoint w-token windows of `ts`, each tagged with its window size —
    * one flattened explode feeds both the line and paragraph stats. */
  private def lineStructs(w: Int): Column =
    transform(
      sequence(lit(0),
        ((size(col("ts")) + lit(w - 1)) / lit(w)).cast("int") - 1),
      k => struct(lit(w).as("w"),
        array_join(slice(col("ts"), k * w + 1, lit(w)), " ").as("line")))

  /** All n-grams of `ts` (space-joined strings) tagged with n. Positions
    * are generated 1..|ts| then filtered to i ≤ |ts|−n+1 — `sequence`
    * with stop < start would count DOWN, so the guard lives in the
    * filter, not the bounds. */
  private def gramStructs(n: Int): Column =
    transform(
      filter(sequence(lit(1), size(col("ts"))),
        i => i <= size(col("ts")) - lit(n - 1)),
      i => struct(lit(n).as("n"),
        array_join(slice(col("ts"), i, lit(n)), " ").as("gram")))

  /** x175: the Gopher-rule repetition battery — the quality filters a
    * production pretraining pipeline runs FIRST, before any dedup
    * (Rae et al. 2021, "Scaling Language Models: ... Gopher", table A1):
    * per document,
    *   - duplicate-line / duplicate-paragraph fraction (count and char
    *     mass of repeated pseudo-lines — see [[LineLen]]/[[ParaLen]]),
    *   - top-2/3/4-gram character share (chars covered by the single
    *     most frequent word n-gram, ties broken lexicographically),
    *   - duplicate-5-gram character share (chars covered by ALL 5-grams
    *     occurring more than once; overlap not deduplicated, the
    *     standard implementation shortcut),
    *   - symbol-to-word ratio (chars outside [a-z0-9 space] per token).
    * The x101/x8 exactness discipline: every numerator and denominator
    * is an exact integer count or char sum; the ONLY floating-point step
    * is one correctly-rounded division per output ratio, so the DuckDB
    * oracle is bit-exact.
    *
    * Scale shape: two explode→agg passes (windows, n-grams), both keyed
    * by doc_id(+gram) — all of a document's exploded rows are generated
    * from its one input row, so map-side partial aggregation collapses
    * them to per-(doc, gram) counts BEFORE the shuffle; nothing corpus-
    * crossing, no window wider than a document, output one row per doc. */
  val repetition = Q.withOracle(
    "x175_repetition_quality",
    "x175: Gopher repetition battery (dup line/para fractions, top n-gram char share, symbol ratio)",
    s"""WITH d AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ts,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |lw AS (
       |  SELECT doc_id, w,
       |    unnest(generate_series(0, (len(ts) + w - 1) // w - 1)) AS k, ts
       |  FROM d CROSS JOIN (SELECT unnest([$LineLen, $ParaLen]) AS w)),
       |lines AS (
       |  SELECT doc_id, w, array_to_string(ts[k*w+1 : k*w+w], ' ') AS line
       |  FROM lw),
       |lc AS (
       |  SELECT doc_id, w, line, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    CAST(length(line) AS BIGINT) AS clen
       |  FROM lines GROUP BY 1, 2, 3),
       |lstats AS (
       |  SELECT doc_id, w,
       |    CAST(SUM(cnt) AS BIGINT) AS n_lines,
       |    CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
       |      / CAST(SUM(cnt) AS DOUBLE) AS dup_frac,
       |    CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * clen ELSE 0 END) AS DOUBLE)
       |      / CAST(SUM(cnt * clen) AS DOUBLE) AS dup_char_frac
       |  FROM lc GROUP BY 1, 2),
       |gp AS (
       |  SELECT doc_id, n, unnest(generate_series(1, len(ts) - n + 1)) AS i, ts
       |  FROM d CROSS JOIN (SELECT unnest([${(TopGramNs :+ DupGramN).mkString(", ")}]) AS n)
       |  WHERE len(ts) >= n),
       |g AS (SELECT doc_id, n, array_to_string(ts[i : i+n-1], ' ') AS gram FROM gp),
       |gc AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM g GROUP BY 1, 2, 3),
       |top AS (
       |  SELECT doc_id, n, cnt * CAST(length(gram) AS BIGINT) AS cover
       |  FROM gc WHERE n < $DupGramN
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id, n
       |    ORDER BY cnt DESC, gram) = 1),
       |tshare AS (
       |  SELECT doc_id,
       |    ${TopGramNs.map(n => s"MAX(CASE WHEN n = $n THEN cover END) AS cov$n").mkString(",\n    |    ")}
       |  FROM top GROUP BY 1),
       |dup5 AS (
       |  SELECT doc_id, CAST(SUM(cnt * length(gram)) AS BIGINT) AS cov5
       |  FROM gc WHERE n = $DupGramN AND cnt >= 2 GROUP BY 1),
       |sym AS (
       |  SELECT doc_id, n_chars, n_tok,
       |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
       |      AS BIGINT) AS n_sym
       |  FROM d)
       |SELECT s.doc_id, l10.n_lines,
       |  l10.dup_frac AS dup_line_frac,
       |  l10.dup_char_frac AS dup_line_char_frac,
       |  l30.dup_frac AS dup_para_frac,
       |  l30.dup_char_frac AS dup_para_char_frac,
       |  ${TopGramNs.map(n => s"CAST(COALESCE(t.cov$n, 0) AS DOUBLE) / CAST(s.n_chars AS DOUBLE) AS top${n}_share").mkString(",\n    |  ")},
       |  CAST(COALESCE(d5.cov5, 0) AS DOUBLE) / CAST(s.n_chars AS DOUBLE)
       |    AS dup5_char_frac,
       |  CAST(s.n_sym AS DOUBLE) / CAST(s.n_tok AS DOUBLE) AS symbol_ratio
       |FROM sym s
       |JOIN lstats l10 ON l10.doc_id = s.doc_id AND l10.w = $LineLen
       |JOIN lstats l30 ON l30.doc_id = s.doc_id AND l30.w = $ParaLen
       |LEFT JOIN tshare t ON t.doc_id = s.doc_id
       |LEFT JOIN dup5 d5 ON d5.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
    val base = Tables.documents(s, dir).select(
      col("doc_id"), col("text"), toks(col("text")).as("ts"),
      length(col("text")).cast("long").as("n_chars_d"),
      size(toks(col("text"))).cast("long").as("n_tok"))
    // window (pseudo-line/paragraph) repetition: one explode, one
    // (doc, w, line)-keyed count, one per-(doc, w) rollup
    val lc = base
      .select(col("doc_id"),
        explode(flatten(array(lineStructs(LineLen), lineStructs(ParaLen)))).as("lw"))
      .select(col("doc_id"), col("lw.w").as("w"), col("lw.line").as("line"))
      .groupBy(col("doc_id"), col("w"), col("line"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("clen", length(col("line")).cast("long"))
    val lstats = lc.groupBy(col("doc_id"), col("w")).agg(
      sum(col("cnt")).cast("long").as("n_lines"),
      (sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).cast("double") /
        sum(col("cnt")).cast("double")).as("dup_frac"),
      (sum(when(col("cnt") >= 2, col("cnt") * col("clen")).otherwise(0L)).cast("double") /
        sum(col("cnt") * col("clen")).cast("double")).as("dup_char_frac"))
    def lcols(w: Int, tag: String) = lstats.filter(col("w") === w).select(
      col("doc_id"), col("n_lines").as(s"n_lines_$tag"),
      col("dup_frac").as(s"dup_${tag}_frac"),
      col("dup_char_frac").as(s"dup_${tag}_char_frac"))
    // n-gram repetition: one explode over all orders, one
    // (doc, n, gram)-keyed count; top-1 via a per-(doc, n) window
    val gc = base
      .select(col("doc_id"),
        explode(flatten(array((TopGramNs :+ DupGramN).map(gramStructs): _*))).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
      .groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val byDocN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("n"))
      .orderBy(col("cnt").desc, col("gram"))
    val tshare = gc.filter(col("n") < DupGramN)
      .withColumn("rn", row_number().over(byDocN)).filter(col("rn") === 1)
      .withColumn("cover", col("cnt") * length(col("gram")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(TopGramNs.map(n =>
        max(when(col("n") === n, col("cover"))).as(s"cov$n")).head,
        TopGramNs.map(n =>
          max(when(col("n") === n, col("cover"))).as(s"cov$n")).tail: _*)
    val dup5 = gc.filter(col("n") === DupGramN && col("cnt") >= 2)
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * length(col("gram")).cast("long")).cast("long").as("cov5"))
    val sym = base.select(col("doc_id"), col("n_chars_d"), col("n_tok"),
      // strip the KEPT classes; what remains IS the symbol mass
      length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long").as("n_sym"))
    sym
      .join(lcols(LineLen, "line"), "doc_id")
      .join(lcols(ParaLen, "para"), "doc_id")
      .join(tshare, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(Seq(
        col("doc_id"), col("n_lines_line").as("n_lines"),
        col("dup_line_frac"), col("dup_line_char_frac"),
        col("dup_para_frac"), col("dup_para_char_frac")) ++
        TopGramNs.map(n =>
          (coalesce(col(s"cov$n"), lit(0L)).cast("double") /
            col("n_chars_d").cast("double")).as(s"top${n}_share")) ++ Seq(
        (coalesce(col("cov5"), lit(0L)).cast("double") /
          col("n_chars_d").cast("double")).as("dup5_char_frac"),
        (col("n_sym").cast("double") / col("n_tok").cast("double")).as("symbol_ratio")): _*)
      .orderBy(col("doc_id"))
  }

  /** C4 rule parameters for x176. The line-keep threshold is C4's ≥5
    * words; the blocklist stands in for C4's bad-word / "javascript"
    * line lists (parameterized — `dup` is the one rare marker token the
    * corpus actually contains, so the drop path is exercised end-to-end
    * on real data, not only in the spec's crafted docs). */
  private[ext] val MinLineWords = 5
  private[ext] val MinKeptLines = 3
  private[ext] val BlockWords = Seq("dup")

  /** Disjoint pseudo-line strings of a token array (the x175 [[LineLen]]
    * segmentation), as a plain string array — per-row, no explode. */
  private[ext] def lineArrayOf(ts: Column, w: Int = LineLen): Column =
    transform(
      sequence(lit(0),
        ((size(ts) + lit(w - 1)) / lit(w)).cast("int") - 1),
      k => array_join(slice(ts, k * w + 1, lit(w)), " "))

  private def lineArray(w: Int): Column = lineArrayOf(col("ts"), w)

  /** The x176 page-keep verdict as one boolean Column over a doc's
    * `text` and its [[lineArrayOf]] line array — shared by
    * [[c4KeepFlags]] and the x187 composed front-end (which must compute
    * it inside the one-scan projection, not via a join). */
  private[ext] def c4KeepExpr(text: Column, lines: Column): Column = {
    def words(l: Column): Column = split(l, " ")
    def blocked(l: Column): Column =
      BlockWords.map(w => array_contains(words(l), w)).reduce(_ || _)
    size(filter(lines,
      l => size(words(l)) >= MinLineWords && !blocked(l))) >= MinKeptLines &&
      size(filter(lines, l => blocked(l))) === 0 &&
      !text.contains("{") && !text.contains("lorem ipsum")
  }

  /** DuckDB twin of [[c4KeepExpr]]: a boolean SQL predicate over columns
    * named `text` and `lines`. */
  private[ext] def c4KeepPredSql: String = {
    val blockPred = BlockWords
      .map(w => s"list_contains(string_split(x, ' '), '$w')").mkString(" OR ")
    s"""len(list_filter(lines,
       |        x -> len(string_split(x, ' ')) >= $MinLineWords
       |          AND NOT ($blockPred))) >= $MinKeptLines
       |      AND len(list_filter(lines, x -> $blockPred)) = 0
       |      AND NOT contains(text, '{') AND NOT contains(text, 'lorem ipsum')""".stripMargin
  }

  /** x176: the C4 heuristic cleaning battery (Raffel et al. 2020,
    * "Exploring the Limits of Transfer Learning with a Unified
    * Text-to-Text Transformer" §2.2 — the rules the C4 corpus was
    * actually built with), applied to x175's pseudo-line segmentation:
    * per document,
    *   - line census: short lines (< [[MinLineWords]] words), blocklist
    *     lines (any [[BlockWords]] token — C4's bad-word/"javascript"
    *     rule), terminal-punctuation lines (C4 keeps only lines ending
    *     `.`/`!`/`?` — reported, not gated, since the corpus carries no
    *     punctuation; the spec exercises it with crafted docs),
    *   - kept lines = neither short nor blocklisted, and the kept
    *     fraction,
    *   - page flags: `{` anywhere (C4's code heuristic), literal
    *     "lorem ipsum" (placeholder-text heuristic),
    *   - the page-level verdict `keep`: ≥ [[MinKeptLines]] kept lines,
    *     zero blocklist lines, no brace, no lorem — C4's document drop
    *     rule with its ≥3-sentence floor.
    * Every column is an exact integer count or 0/1 flag; the single
    * ratio is one correctly-rounded division (the x175 discipline).
    *
    * Scale shape: a pure scan-project — the whole battery is per-row
    * array expressions over the line array (no explode, no shuffle, no
    * window); at 100 TB this runs embarrassingly parallel at scan
    * speed, which is exactly why C4-class filters run FIRST in a
    * production pipeline, before anything that shuffles. */
  val c4Quality = Q.withOracle(
    "x176_c4_quality",
    "x176: C4 heuristic cleaning battery (line census, page flags, keep verdict)",
    s"""WITH d AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
       |l AS (
       |  SELECT doc_id, text,
       |    list_transform(generate_series(0, (len(ts) + ${LineLen - 1}) // $LineLen - 1),
       |      k -> array_to_string(ts[k*$LineLen+1 : k*$LineLen+$LineLen], ' ')) AS lines
       |  FROM d),
       |c AS (
       |  SELECT doc_id,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(lines,
       |      x -> len(string_split(x, ' ')) < $MinLineWords)) AS BIGINT) AS short_lines,
       |    CAST(len(list_filter(lines,
       |      x -> ${BlockWords.map(w => s"list_contains(string_split(x, ' '), '$w')").mkString(" OR ")}))
       |      AS BIGINT) AS block_lines,
       |    CAST(len(list_filter(lines,
       |      x -> substr(x, length(x), 1) IN ('.', '!', '?'))) AS BIGINT) AS punct_lines,
       |    CAST(len(list_filter(lines,
       |      x -> len(string_split(x, ' ')) >= $MinLineWords AND NOT (
       |        ${BlockWords.map(w => s"list_contains(string_split(x, ' '), '$w')").mkString(" OR ")})))
       |      AS BIGINT) AS kept_lines,
       |    CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS has_brace,
       |    CASE WHEN contains(text, 'lorem ipsum') THEN 1 ELSE 0 END AS has_lorem
       |  FROM l)
       |SELECT doc_id, n_lines, short_lines, block_lines, punct_lines, kept_lines,
       |  CAST(kept_lines AS DOUBLE) / n_lines AS kept_frac,
       |  CAST(has_brace AS BIGINT) AS has_brace,
       |  CAST(has_lorem AS BIGINT) AS has_lorem,
       |  CAST(CASE WHEN kept_lines >= $MinKeptLines AND block_lines = 0
       |    AND has_brace = 0 AND has_lorem = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    def words(l: Column): Column = split(l, " ")
    def blocked(l: Column): Column =
      BlockWords.map(w => array_contains(words(l), w)).reduce(_ || _)
    val c = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), toks(col("text")).as("ts"))
      .withColumn("lines", lineArray(LineLen))
      .select(
        col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(filter(col("lines"), l => size(words(l)) < MinLineWords))
          .cast("long").as("short_lines"),
        size(filter(col("lines"), l => blocked(l))).cast("long").as("block_lines"),
        size(filter(col("lines"),
          l => l.substr(length(l), lit(1)).isin(".", "!", "?")))
          .cast("long").as("punct_lines"),
        size(filter(col("lines"),
          l => size(words(l)) >= MinLineWords && !blocked(l)))
          .cast("long").as("kept_lines"),
        when(col("text").contains("{"), 1L).otherwise(0L).as("has_brace"),
        when(col("text").contains("lorem ipsum"), 1L).otherwise(0L).as("has_lorem"))
    c.withColumn("kept_frac",
        col("kept_lines").cast("double") / col("n_lines").cast("double"))
      .withColumn("keep",
        when(col("kept_lines") >= MinKeptLines && col("block_lines") === 0 &&
          col("has_brace") === 0 && col("has_lorem") === 0, 1L).otherwise(0L))
      .select(col("doc_id"), col("n_lines"), col("short_lines"),
        col("block_lines"), col("punct_lines"), col("kept_lines"),
        col("kept_frac"), col("has_brace"), col("has_lorem"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** The x176 page-keep verdict as a reusable (doc_id, keep) frame —
    * x186's label proxy trains against it, so classifier labels can
    * never drift from the registered C4 battery. */
  private[ext] def c4KeepFlags(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), toks(col("text")).as("ts"))
      .withColumn("lines", lineArray(LineLen))
      .select(col("doc_id"),
        when(c4KeepExpr(col("text"), col("lines")), 1L).otherwise(0L).as("keep"))

  /** DuckDB twin of [[c4KeepFlags]]: CTE chain ending in `c4k`
    * (doc_id, keep) — the same predicates the x176/x181 oracles carry. */
  private[ext] def c4KeepCtes: String =
    s"""c4l AS (
       |  SELECT doc_id, text,
       |    list_transform(generate_series(0, (len(ts) + ${LineLen - 1}) // $LineLen - 1),
       |      k -> array_to_string(ts[k*$LineLen+1 : k*$LineLen+$LineLen], ' ')) AS lines
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents)),
       |c4k AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN $c4KeepPredSql
       |    THEN 1 ELSE 0 END AS keep
       |  FROM c4l)""".stripMargin

  /** Minimum whitespace-token count for x181's length filter — the
    * "too short to train on" floor every curation recipe carries. */
  private val MinDocTokens = 20

  /** x181: filter ablation grid — BEFORE wiring a battery of quality
    * filters into a pipeline (x175 Gopher, x176 C4, the x8/x26 uniq-ratio
    * cut, a length floor), a curation team asks which filters agree:
    * near-identical drop sets mean a redundant (and latency-costing)
    * stage; disjoint ones mean each earns its keep. Per unordered filter
    * pair: each side's drop count, the intersection, union, and drop-set
    * Jaccard. All four filters evaluate as per-row expressions in ONE
    * projection (the x170b gate form of Gopher; x176's verdict; integer
    * 2·distinct<total for the uniq cut; a token floor), so the whole
    * grid is one corpus scan + ONE global aggregate (map-side combined
    * to a single row) + a literal 6-row unpivot — no join, no shuffle
    * beyond the 1-row agg. Exactness: counts are exact longs; Jaccard is
    * one guarded division (NULL on the empty union in both engines). */
  val filterAblation = Q.withOracle(
    "x181_filter_ablation",
    "x181: drop-set agreement grid (counts, intersection, union, Jaccard) across 4 quality filters",
    s"""WITH f AS (
       |  SELECT
       |    CASE WHEN 10 * len(list_filter(generate_series(1, len(ls)),
       |        i -> ls[i] = ls[i-1] OR ls[i] = ls[i+1])) > 3 * len(ls)
       |      THEN 1 ELSE 0 END AS gopher,
       |    CASE WHEN NOT (
       |        len(list_filter(lines, x -> len(string_split(x, ' ')) >= $MinLineWords
       |          AND NOT (${BlockWords.map(w => s"list_contains(string_split(x, ' '), '$w')").mkString(" OR ")}))) >= $MinKeptLines
       |        AND len(list_filter(lines,
       |          x -> ${BlockWords.map(w => s"list_contains(string_split(x, ' '), '$w')").mkString(" OR ")})) = 0
       |        AND NOT contains(text, '{') AND NOT contains(text, 'lorem ipsum'))
       |      THEN 1 ELSE 0 END AS c4,
       |    CASE WHEN 2 * len(list_distinct(ts)) < len(ts) THEN 1 ELSE 0 END AS uniq,
       |    CASE WHEN len(ts) < $MinDocTokens THEN 1 ELSE 0 END AS short
       |  FROM (
       |    SELECT text, ts, lines, list_sort(lines) AS ls FROM (
       |      SELECT text, ts,
       |        list_transform(generate_series(0, (len(ts) + ${LineLen - 1}) // $LineLen - 1),
       |          k -> array_to_string(ts[k*$LineLen+1 : k*$LineLen+$LineLen], ' ')) AS lines
       |      FROM (SELECT text, string_split(text, ' ') AS ts FROM documents)))),
       |a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(c4) AS BIGINT) AS s_c4, CAST(SUM(gopher) AS BIGINT) AS s_gopher,
       |    CAST(SUM(short) AS BIGINT) AS s_short, CAST(SUM(uniq) AS BIGINT) AS s_uniq,
       |    CAST(SUM(c4 * gopher) AS BIGINT) AS b_c4_gopher,
       |    CAST(SUM(c4 * short) AS BIGINT) AS b_c4_short,
       |    CAST(SUM(c4 * uniq) AS BIGINT) AS b_c4_uniq,
       |    CAST(SUM(gopher * short) AS BIGINT) AS b_gopher_short,
       |    CAST(SUM(gopher * uniq) AS BIGINT) AS b_gopher_uniq,
       |    CAST(SUM(short * uniq) AS BIGINT) AS b_short_uniq
       |  FROM f),
       |g AS (
       |  ${Seq(("c4", "gopher"), ("c4", "short"), ("c4", "uniq"),
              ("gopher", "short"), ("gopher", "uniq"), ("short", "uniq"))
           .map { case (x, y) =>
             s"""SELECT '$x' AS filter_a, '$y' AS filter_b, n_docs,
                |    s_$x AS n_a, s_$y AS n_b, b_${x}_$y AS n_both,
                |    s_$x + s_$y - b_${x}_$y AS n_union FROM a""".stripMargin }
           .mkString("\n  UNION ALL\n  ")})
       |SELECT filter_a, filter_b, n_docs, n_a, n_b, n_both,
       |  CAST(n_union AS BIGINT) AS n_union,
       |  CASE WHEN n_union = 0 THEN NULL
       |    ELSE CAST(n_both AS DOUBLE) / n_union END AS jaccard
       |FROM g ORDER BY filter_a, filter_b""".stripMargin) { (s, dir) =>
    def words(l: Column): Column = split(l, " ")
    def blocked(l: Column): Column =
      BlockWords.map(w => array_contains(words(l), w)).reduce(_ || _)
    // LAYERED projections, each expensive array computed once and then
    // referenced as an attribute: higher-order functions run interpreted
    // (outside codegen), so a single collapsed projection would RE-expand
    // every `ls` reference into its own split→window→sort evaluation per
    // lambda element — measured 6× slower. CollapseProject keeps these
    // layers apart precisely because the producers are non-cheap and
    // multiply referenced.
    val base = Tables.documents(s, dir)
      .select(col("text"), toks(col("text")).as("ts"))
      .select(col("text"), col("ts"), lineArrayOf(col("ts"), LineLen).as("lines"))
      .select(col("text"), col("ts"), col("lines"),
        array_sort(col("lines")).as("ls"))
    // the x170b Gopher gate over the shared sorted-lines attribute:
    // an element is a duplicate iff it equals a sorted neighbor
    val dupLines = size(filter(sequence(lit(1), size(col("ls"))),
      i => get(col("ls"), i - 1) === get(col("ls"), i - 2) ||
        get(col("ls"), i - 1) === get(col("ls"), i)))
    val keptLines = size(filter(col("lines"),
      l => size(words(l)) >= MinLineWords && !blocked(l)))
    val blockLines = size(filter(col("lines"), l => blocked(l)))
    val c4Drop = !(keptLines >= MinKeptLines && blockLines === 0 &&
      !col("text").contains("{") && !col("text").contains("lorem ipsum"))
    val flags = base.select(
      when(lit(10) * dupLines > lit(3) * size(col("ls")), 1L).otherwise(0L).as("gopher"),
      when(c4Drop, 1L).otherwise(0L).as("c4"),
      when(lit(2) * size(array_distinct(col("ts"))) < size(col("ts")), 1L)
        .otherwise(0L).as("uniq"),
      when(size(col("ts")) < MinDocTokens, 1L).otherwise(0L).as("short"))
    val names = Seq("c4", "gopher", "short", "uniq")
    val pairs = Seq(("c4", "gopher"), ("c4", "short"), ("c4", "uniq"),
      ("gopher", "short"), ("gopher", "uniq"), ("short", "uniq"))
    val aggs = count(lit(1)).cast("long").as("n_docs") +:
      (names.map(n => sum(col(n)).cast("long").as(s"s_$n")) ++
        pairs.map { case (x, y) =>
          sum(col(x) * col(y)).cast("long").as(s"b_${x}_$y") })
    val a = flags.agg(aggs.head, aggs.tail: _*)
    // literal 6-row unpivot of the single agg row — no join anywhere
    a.select(col("n_docs"), explode(array(pairs.map { case (x, y) =>
        struct(lit(x).as("filter_a"), lit(y).as("filter_b"),
          col(s"s_$x").as("n_a"), col(s"s_$y").as("n_b"),
          col(s"b_${x}_$y").as("n_both"),
          (col(s"s_$x") + col(s"s_$y") - col(s"b_${x}_$y")).as("n_union"))
      }: _*)).as("p"))
      .select(col("p.filter_a"), col("p.filter_b"), col("n_docs"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"),
        col("p.n_both").as("n_both"), col("p.n_union").as("n_union"),
        when(col("p.n_union") === 0, lit(null).cast("double"))
          .otherwise(col("p.n_both").cast("double") / col("p.n_union").cast("double"))
          .as("jaccard"))
      .orderBy(col("filter_a"), col("filter_b"))
  }

  val all: Seq[Q] = Seq(langId, quality, tokenCount, fingerprint, tfidfTop,
    repetition, c4Quality, filterAblation)
}
