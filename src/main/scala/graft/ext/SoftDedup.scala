package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** x193: SoftDeDup — data reweighting instead of data removal (Xia et
  * al. 2024, "SoftDedup: an Efficient Data Reweighting Method for
  * Speeding Up Language Model Pretraining"): rather than DROP documents
  * whose content is common (the x1/x2/x43 hard-dedup family), DOWN-WEIGHT
  * them in the sampling mix, preserving corpus diversity while still
  * de-emphasizing boilerplate. Per document, "commonness" is the mean
  * corpus-wide occurrence count of its trigram shingles; the sampling
  * weight is `cmin / commonness` — the rarest document keeps weight 1,
  * a document whose trigrams are 10× as common trains 10× less often.
  *
  * Fidelity vs exactness (the standing discipline): the paper scores
  * commonness with an n-gram LM probability PRODUCT (logs); libm log is
  * not bit-portable across engines (the x18/x40/x172 rule), so the score
  * here is the mean occurrence count — exact-INTEGER sums all the way
  * (per-doc Σ c(g) is a sum of longs, not doubles), one correctly-rounded
  * division for the mean, one for the weight, and a double MIN (exact and
  * order-independent, unlike a double sum) for the normalizer — no global
  * double accumulation anywhere, which is also why the paper's
  * expected-token renormalization (a corpus-wide Σ w·tokens of doubles)
  * is deliberately replaced by the min-anchored form.
  *
  * Universe: documents with ≥3 tokens (shorter docs have no trigrams).
  *
  * Scale shape: ONE (gram) hash agg over the trigram explode (map-side
  * combined — all of a doc's grams come from its one row), one keyed
  * join back to the occurrence stream, one (doc) agg of exact longs,
  * and the 1-row min scalar broadcast onto the result. Two corpus
  * shuffles, both on keys the corpus bounds; at 100 TB this is x71's
  * cost class. */
object SoftDedup {

  /** Trigram structs of `ts` (space-joined), one per position — x175's
    * gram pattern at the dedup family's shingle grain n=3. */
  private def grams3 = transform(
    filter(sequence(lit(1), size(col("ts"))),
      i => i <= size(col("ts")) - lit(2)),
    i => array_join(slice(col("ts"), i, lit(3)), " "))

  val softDedup: Q = Q.withOracle(
    "x193_soft_dedup",
    "x193: SoftDeDup commonness reweighting - per-doc mean trigram corpus count, weight = cmin/commonness (exact-integer sums, min-anchored)",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |g AS (
      |  SELECT doc_id, array_to_string(ts[i : i + 2], ' ') AS gram
      |  FROM d, unnest(generate_series(1, len(ts) - 2)) t(i)
      |  WHERE len(ts) >= 3),
      |c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1),
      |s AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |    CAST(SUM(c.c) AS BIGINT) AS sum_c
      |  FROM g JOIN c USING (gram) GROUP BY 1),
      |sc AS (
      |  SELECT doc_id, n_grams, sum_c,
      |    CAST(sum_c AS DOUBLE) / n_grams AS commonness
      |  FROM s),
      |m AS (SELECT MIN(commonness) AS cmin FROM sc)
      |SELECT doc_id, n_grams, sum_c, commonness,
      |  m.cmin / commonness AS weight
      |FROM sc CROSS JOIN m ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val g = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(grams3).as("gram"))
    val c = g.groupBy(col("gram")).agg(count(lit(1)).cast("long").as("c"))
    val sc = g.join(c, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(col("c")).cast("long").as("sum_c"))
      .withColumn("commonness",
        col("sum_c").cast("double") / col("n_grams"))
    val m = sc.agg(min(col("commonness")).as("cmin"))
    sc.crossJoin(broadcast(m)) // one scalar row
      .select(col("doc_id"), col("n_grams"), col("sum_c"), col("commonness"),
        (col("cmin") / col("commonness")).as("weight"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(softDedup)
}
