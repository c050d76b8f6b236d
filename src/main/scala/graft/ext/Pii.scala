package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction stage every released training corpus
  * runs (emails / phone numbers / SSNs / IP addresses → typed
  * placeholder tokens). Pure map work: at 100 TB this is the cheapest
  * stage in the pipeline — no shuffle, no state, fused into whatever
  * scan feeds it.
  *
  * This object is the SINGLE pattern table and redaction chain for the
  * repo (round-8 unification): the batch x46 query and the curation
  * scrub ([[Curation.piiScrubbed]] / [[Curation.piiRedactions]]) both
  * build from the patterns and fold helpers here, so the two families
  * cannot drift. Two rule LISTS remain, because their contracts differ:
  *
  *  - [[OracleRules]] (email / strict phone / IP) uses only the regex
  *    subset with identical semantics in Java's engine (Spark) and RE2
  *    (DuckDB) — character classes, bounded/unbounded repetition,
  *    literal dots; no backreferences, no lookaround, no \\b
  *    (word-boundary is a Java/RE2 divergence). This is the set x46's
  *    cross-engine oracle can gate.
  *  - [[CurationRules]] (email / SSN / loose phone) is the broader
  *    Java-side net a real scrub casts — \\b anchors and optional
  *    country/area punctuation — correctness carried by CurationSpec's
  *    crafted rows rather than a DuckDB oracle.
  *
  * Chain ORDER matters and is part of each list: earlier classes mask
  * before later classes match (an IP-shaped fragment inside a
  * yet-unredacted email must not double-count; an SSN also matches the
  * looser phone shape, so SSN redacts first). */
object Pii {

  // ---- The pattern table (one definition per PII class) ---------------

  /** RE2 ∩ Java portable. */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** RE2 ∩ Java portable: the plain NNN-NNN-NNNN form. */
  val PhoneStrict = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** RE2 ∩ Java portable. */
  val Ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Java-only (\\b): SSN-shaped triple. */
  val Ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Java-only (\\b): optional country code / parens / space-dot-dash
    * separators. No leading \\b: it cannot anchor before an opening
    * paren, and for PII the failure mode of a looser left edge is
    * over-redaction — the safe direction. */
  val PhoneLoose = "(\\+?[0-9]{1,2}[ .-]?)?(\\(?[0-9]{3}\\)?[ .-]?)[0-9]{3}[ .-][0-9]{4}\\b"

  // ---- The redaction chain (one fold, every call site) ----------------

  /** Ordered (pattern → placeholder) rules for the oracle-gated x46. */
  val OracleRules: Seq[(String, String)] =
    Seq(Email -> "<EMAIL>", PhoneStrict -> "<PHONE>", Ip -> "<IP>")

  /** Ordered rules for the curation scrub (crafted-row spec gate). */
  val CurationRules: Seq[(String, String)] =
    Seq(Email -> "<EMAIL>", Ssn -> "<SSN>", PhoneLoose -> "<PHONE>")

  /** Apply an ordered rule list: each class replaces on text with every
    * EARLIER class already masked. Spark's regexp_replace is global by
    * default; the DuckDB oracle passes the 'g' flag explicitly. */
  def redactChain(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (c, (re, tok)) => regexp_replace(c, re, tok) }

  /** Per-class match counts under chain precedence: class i counts on
    * text with classes 0..i-1 already masked — mirroring the replace
    * chain exactly, so sum(counts) == number of replacements the chain
    * performs. */
  def categoryCounts(text: Column, rules: Seq[(String, String)]): Seq[Column] = {
    val prefixMasked = rules.indices.map(i => redactChain(text, rules.take(i)))
    rules.zip(prefixMasked).map { case ((re, _), prior) =>
      size(regexp_extract_all(prior, lit(re), lit(0))).cast("long")
    }
  }

  /** Total redaction count for a rule list (the [[categoryCounts]] sum). */
  def redactionCount(text: Column, rules: Seq[(String, String)]): Column =
    categoryCounts(text, rules).reduce(_ + _).cast("long")

  /** The x46 chain over a text column (shared by the query and PiiSpec). */
  def redact(c: Column): Column = redactChain(c, OracleRules)

  /** The synthetic corpus contains no PII, which would make a redaction
    * oracle vacuous (hashing text == redacted proves nothing about the
    * regexes). The query therefore PLANTS deterministic doc_id-derived
    * PII — an email, a phone, an IP per document, built with identical
    * string arithmetic on both engines — then redacts. The oracle compare
    * genuinely exercises match/replace semantics cross-engine on every
    * row, and the emitted counts pin exactly one match per category (the
    * planted one) on the PII-free corpus. */
  val piiRedact = Q.withOracle(
    "x46_pii_redact",
    "x46: plant deterministic PII per doc, redact it, count matches per category",
    s"""WITH planted AS MATERIALIZED (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@mail.example.com or 555-' ||
       |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4242 from 10.0.' ||
       |      CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$Email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(t, '$Email', '<EMAIL>', 'g'),
       |    '$PhoneStrict')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(regexp_replace(t, '$Email', '<EMAIL>', 'g'),
       |                   '$PhoneStrict', '<PHONE>', 'g'),
       |    '$Ip')) AS BIGINT) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '$Email', '<EMAIL>', 'g'),
       |    '$PhoneStrict', '<PHONE>', 'g'),
       |    '$Ip', '<IP>', 'g') AS redacted
       |FROM planted
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-4242 from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7")).as("t"))
    // Per-category counts under chain precedence — phone counts with
    // emails already masked, IPs with both masked (an IP-shaped fragment
    // inside a yet-unredacted email would double-count).
    val Seq(nEmails, nPhones, nIps) = categoryCounts(col("t"), OracleRules)
    planted.select(col("doc_id"),
        nEmails.as("n_emails"),
        nPhones.as("n_phones"),
        nIps.as("n_ips"),
        redact(col("t")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(piiRedact)
}
