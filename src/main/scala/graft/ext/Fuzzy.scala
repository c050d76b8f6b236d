package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string join (entity resolution) — the missing join type
  * when keys are TYPED BY HUMANS: facility names, product labels,
  * author strings. The naive form is an all-pairs Levenshtein scan —
  * |labels|² comparisons, a cross join no cluster survives. The
  * deployed shape (FastSS, Bocek et al. 2007) turns it into an
  * equi-join: every label emits its 1-deletion neighborhood (the label
  * plus each single-character deletion — ≤ len+1 variants), candidates
  * are labels SHARING a variant, and only candidates pay the exact
  * Levenshtein verify. Completeness is a theorem, not a hope: two
  * strings at edit distance ≤ 1 always share a variant (equality →
  * the string itself; insert/delete → the deletion at that position;
  * substitution at i → both i-deletions coincide), so blocking loses
  * NOTHING against the all-pairs semantics — which is exactly why the
  * DuckDB oracle can state the contract as the naive all-pairs query.
  *
  * Scale shape: the label table is the DISTINCT of the corpus column
  * (one hash agg over the 100 TB scan — the corpus never self-joins);
  * the variant table is |labels| × avg_len rows, shuffled once on the
  * variant string; candidate groups are variant-equality buckets
  * (bounded by how many labels share a deletion — the data's real
  * ambiguity, not an artifact); the verify touches candidates only.
  * Edit distance ≤ k generalizes with k-deletion neighborhoods
  * (O(len^k) variants — the standard FastSS tradeoff).
  */
object Fuzzy {

  /** The 1-deletion neighborhood of a string column, self included. */
  private[graft] def deletionVariants(s: Column): Column =
    concat(array(s), transform(sequence(lit(1), length(s)), i =>
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** Distinct (name_a, name_b) candidate pairs sharing a variant. */
  private[graft] def candidatePairs(names: DataFrame, col0: String): DataFrame = {
    // two-step select: a generator referencing a same-select alias trips
    // Spark 4's LateralColumnAliasReference check (INTERNAL_ERROR)
    val vr = names.select(col(col0).as("name"))
      .select(col("name"), explode(deletionVariants(col("name"))).as("v"))
    vr.as("a").join(vr.as("b"),
        col("a.v") === col("b.v") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
  }

  private def fuzzyOracle: String =
    s"""WITH names AS MATERIALIZED (
       |  SELECT p_name AS name, COUNT(*) AS n FROM part GROUP BY p_name)
       |SELECT a.name AS name_a, b.name AS name_b,
       |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
       |FROM names a JOIN names b ON a.name < b.name
       |WHERE levenshtein(a.name, b.name) <= 1
       |ORDER BY name_a, name_b""".stripMargin

  /** x55: fuzzy label pairs — distinct part names at edit distance ≤ 1,
    * with corpus frequencies (the resolution signal: the heavier
    * spelling is the canonical one). Engine: FastSS deletion-variant
    * blocking + Levenshtein verify on candidates; oracle: the naive
    * all-pairs semantics the blocking provably preserves. */
  val fuzzyNamePairs = Q.withOracle(
    "x55_fuzzy_name_pairs",
    "x55: distinct labels at edit distance <= 1 (FastSS blocking + verify)",
    fuzzyOracle) { (s, dir) =>
    val names = Tables.part(s, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
    val verified = candidatePairs(names.select(col("p_name")), "p_name")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
    verified
      .join(names.select(col("p_name").as("name_a"), col("n").as("n_a")), "name_a")
      .join(names.select(col("p_name").as("name_b"), col("n").as("n_b")), "name_b")
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  val all: Seq[Q] = Seq(fuzzyNamePairs)
}
