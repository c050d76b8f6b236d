package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.Column
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

  val all: Seq[Q] = Seq(langId, quality, tokenCount, fingerprint, tfidfTop)
}
