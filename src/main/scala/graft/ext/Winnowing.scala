package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Winnowing (MOSS) document fingerprinting — the dedup family's
  * index-size lever: x2's MinHash answers "how similar", x10's single
  * fingerprint answers "byte-identical?"; winnowing answers "do these
  * documents SHARE A PASSAGE of at least w+2 tokens" with a fingerprint
  * index ~w× smaller than the full shingle set (density 2/(w+1)) and a
  * GUARANTEE, not a probability: every sufficiently long match shares at
  * least one selected fingerprint (Schleimer et al., SIGMOD'03 — the
  * plagiarism-detection workhorse).
  *
  * Scale shape: fingerprint selection is the codegen'd
  * [[graft.functions.Winnow3]] expression — a pure map, no shuffle, no
  * per-doc window sort (the SQL-window spelling pays a doc-keyed
  * shuffle + sort just to align gram positions; the array is already
  * aligned). The candidate join is fingerprint-keyed with a max-df
  * guard: a fingerprint shared by > MaxDf docs is boilerplate (license
  * headers, templates) and would quadratically explode its bucket — the
  * same hot-key bound every LSH band join here enforces. Output is
  * bounded top-k.
  */
object Winnowing {

  /** Winnow window (in grams): matches of ≥ W+2 tokens are guaranteed
    * caught. */
  private val W = 4
  /** Hot-fingerprint bound: fingerprints in more docs than this are
    * dropped from pairing (boilerplate; quadratic bucket). */
  private val MaxDf = 20
  /** Minimum shared fingerprints for a reported pair. */
  private val MinShared = 2
  private val TopK = 20

  val fingerprintPairs = Q.withOracle(
    "x104_winnow_pairs",
    s"x104: top-$TopK document pairs by shared winnowed fingerprints (w=$W)",
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |gr AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 15))::BIGINT AS h
       |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) r),
       |wm AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS m,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS ng
       |  FROM gr),
       |fp AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, m AS fp FROM wm
       |  WHERE i <= GREATEST(1, ng - $W + 1)),
       |keep AS MATERIALIZED (
       |  SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM fp GROUP BY 1)
       |  WHERE df <= $MaxDf),
       |cnt AS MATERIALIZED (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nfp FROM fp GROUP BY 1),
       |pr AS MATERIALIZED (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS shared
       |  FROM fp a JOIN keep k ON a.fp = k.fp
       |  JOIN fp b ON b.fp = a.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT pr.doc_a, pr.doc_b, pr.shared, ca.nfp AS n_a, cb.nfp AS n_b,
       |  CAST(pr.shared AS DOUBLE) / LEAST(ca.nfp, cb.nfp) AS containment
       |FROM pr
       |JOIN cnt ca ON ca.doc_id = pr.doc_a
       |JOIN cnt cb ON cb.doc_id = pr.doc_b
       |WHERE pr.shared >= $MinShared
       |ORDER BY pr.shared DESC, pr.doc_a, pr.doc_b LIMIT $TopK""".stripMargin) { (s, dir) =>
    graft.functions.Winnow3.register(s)
    val docs = Tables.documents(s, dir)
    val fp = docs.select(col("doc_id"),
        explode(graft.functions.Winnow3.winnow3(
          split(col("text"), " "), lit(W))).as("fp"))
    val keep = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxDf).select(col("fp"))
    val cnt = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    val a = fp.join(keep, "fp").select(col("fp"), col("doc_id").as("doc_a"))
    val b = fp.select(col("fp"), col("doc_id").as("doc_b"))
    val pr = a.join(b, Seq("fp")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= MinShared)
    pr.join(cnt.select(col("doc_id").as("doc_a"), col("nfp").as("n_a")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("nfp").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared").cast("long").as("shared"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        (col("shared").cast("double") / least(col("n_a"), col("n_b")))
          .as("containment"))
      .orderBy(col("shared").desc, col("doc_a"), col("doc_b")).limit(TopK)
  }

  /** Diagnostic for the scale probe (not registered): the candidate-join
    * volume x104 actually pays, as one row — fingerprint rows, distinct
    * fingerprints, candidate pairs under the max-df guard, and the df
    * tail. Gram hashes are md5 of the raw 3-token text, so the probe's
    * token-renamed copies produce copy-DISJOINT fingerprints (cross-copy
    * collisions ~2⁻⁶⁰); if candidates scale linearly with the factor
    * while wall does not, the superlinear wall segment is memory/shuffle
    * pressure, not candidate growth. */
  def candidateStats(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    graft.functions.Winnow3.register(s)
    val fp = Tables.documents(s, dir).select(col("doc_id"),
        explode(graft.functions.Winnow3.winnow3(
          split(col("text"), " "), lit(W))).as("fp"))
      .localCheckpoint()
    val df = fp.groupBy(col("fp")).agg(count(lit(1)).as("df")).localCheckpoint()
    val cand = df.filter(col("df") <= MaxDf)
      .agg(sum(expr("df * (df - 1) div 2")).as("n_cand_pairs"))
    val stats = df.agg(count(lit(1)).as("n_distinct_fp"),
      sum(col("df")).as("n_fp_rows"),
      max(col("df")).as("max_df"),
      sum(when(col("df") > MaxDf, 1L).otherwise(0L)).as("n_hot_fp"))
    stats.crossJoin(cand)
  }

  val all: Seq[Q] = Seq(fingerprintPairs)
}
