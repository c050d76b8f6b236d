package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction stage every released training corpus
  * runs (emails / phone numbers / IP addresses → typed placeholder
  * tokens). Pure map work: at 100 TB this is the cheapest stage in the
  * pipeline — no shuffle, no state, fused into whatever scan feeds it.
  *
  * Portability: the patterns use only the regex subset with identical
  * semantics in Java's engine (Spark) and RE2 (DuckDB) — character
  * classes, bounded/unbounded repetition, literal dots — no
  * backreferences, no lookaround, no \\b (word-boundary is a Java/RE2
  * divergence). Spark's regexp_replace is global by default; the DuckDB
  * side passes the 'g' flag explicitly.
  *
  * The synthetic corpus contains no PII, which would make a redaction
  * oracle vacuous (hashing text == redacted proves nothing about the
  * regexes). The query therefore PLANTS deterministic doc_id-derived
  * PII — an email, a phone, an IP per document, built with identical
  * string arithmetic on both engines — then redacts. The oracle compare
  * genuinely exercises match/replace semantics cross-engine on every
  * row, and the emitted counts pin exactly one match per category (the
  * planted one) on the PII-free corpus. */
object Pii {

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redaction chain order matters: the IP pattern would match inside a
    * phone-like or email-like digit run if those were still present —
    * emails first (they can contain dots and digits), then phones, then
    * IPs. Shared by the query and the spec. */
  def redact(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

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
       |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |                   '$PhoneRe', '<PHONE>', 'g'),
       |    '$IpRe')) AS BIGINT) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g'),
       |    '$IpRe', '<IP>', 'g') AS redacted
       |FROM planted
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-4242 from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7")).as("t"))
    planted.select(col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phones"),
        // IPs are counted AFTER the email/phone passes — same reason as
        // the replace order: an IP-shaped fragment inside a yet-unredacted
        // email would double-count.
        regexp_count(
          regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          lit(IpRe)).cast("long").as("n_ips"),
        redact(col("t")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(piiRedact)
}
