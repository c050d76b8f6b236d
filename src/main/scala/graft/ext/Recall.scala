package graft.ext

import graft.Q
import org.apache.spark.sql.functions._

/** ANN quality evaluation — recall@k of the approximate index against
  * the brute-force ground truth, as a first-class QUERY. The ANN family
  * (x5 brute, x6 LSH, x12 IVF, x50 PQ, x51 IVF-PQ) ships speed tiers;
  * this is the measurement a deployment runs before trusting one: both
  * pipelines are deterministic (md5 seeds, integer Lloyd, fixed tie
  * rules), so even the RECALL itself replays bit-exactly in the oracle
  * — the accuracy evaluation is as hash-verifiable as the operators it
  * evaluates.
  *
  * Scale shape: the composition of its two inputs (each already
  * scale-audited); the join/agg on top touches only 2·queries·k rows of
  * id pairs — evaluation metadata, never the corpus.
  */
object Recall {

  /** x88: per-query recall@5 of IVF (x12) against exact brute force
    * (x5) — n_hits = |IVF top-k ∩ exact top-k|, recall = n_hits/k. */
  val annRecall = Q.withOracle(
    "x88_ann_recall",
    "x88: recall@5 of the x12 IVF index vs the x5 exact top-k, per query",
    s"""WITH exact AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |${Similarity.bruteForceKnn.oracle.get})),
       |cand AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |${Ivf.ivfAnn.oracle.get}))
       |SELECT e.query_id,
       |  CAST(COUNT(c.neighbor_id) AS BIGINT) AS n_hits,
       |  CAST(COUNT(c.neighbor_id) AS DOUBLE) / ${Similarity.TopK} AS recall
       |FROM exact e LEFT JOIN cand c
       |  ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin) { (s, dir) =>
    val exact = Similarity.bruteForceKnn.fn(s, dir)
      .select(col("query_id"), col("neighbor_id"))
    val cand = Ivf.ivfAnn.fn(s, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(cand, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("hit")).cast("long").as("n_hits"),
        (count(col("hit")).cast("double") / Similarity.TopK).as("recall"))
      .orderBy(col("query_id"))
  }

  /** lcm(1..5)·TopK — the exact-rational AP denominator: AP@5 · 300 is
    * an INTEGER (60/i is integral for every rank i ≤ 5), so the
    * rank-weighted metric needs no float sum at all. */
  private val ApDenom = 60 * Similarity.TopK

  /** x156: average precision@5 of the IVF index vs the exact top-k —
    * recall (x88) ignores WHERE in the list the hits land; AP weights
    * early hits more (precision-at-each-relevant-rank, the MAP
    * constituent every retrieval eval reports next to recall). All
    * arithmetic exact: rel ∈ {0,1} from the id join, the prefix count
    * is a 5-row partitioned window, and AP·300 = Σ rel_i·cum_i·(60/i)
    * is an integer sum — ONE double division at the end, so the oracle
    * replays the metric bit-for-bit (the x88 posture: the evaluation
    * is as hash-verifiable as the operators it evaluates).
    *
    * Scale: joins/windows touch only queries·k id rows — evaluation
    * metadata, never the corpus. */
  val annAp = Q.withOracle(
    "x156_ann_ap",
    s"x156: average precision@${Similarity.TopK} of x12 IVF vs x5 exact, per query",
    s"""WITH exact AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |${Similarity.bruteForceKnn.oracle.get})),
       |cand AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, rank FROM (
       |${Ivf.ivfAnn.oracle.get})),
       |rel AS MATERIALIZED (
       |  SELECT c.query_id, c.rank,
       |    CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END AS rel
       |  FROM cand c LEFT JOIN exact e
       |    ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id),
       |pre AS MATERIALIZED (
       |  SELECT query_id, rank, rel,
       |    SUM(rel) OVER (PARTITION BY query_id ORDER BY rank) AS cum
       |  FROM rel)
       |SELECT query_id,
       |  CAST(SUM(rel) AS BIGINT) AS n_hits,
       |  CAST(SUM(rel * cum * (60 // rank)) AS BIGINT) AS ap_num,
       |  CAST(SUM(rel * cum * (60 // rank)) AS DOUBLE) / $ApDenom.0 AS ap
       |FROM pre GROUP BY query_id ORDER BY query_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val exact = Similarity.bruteForceKnn.fn(s, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    val cand = Ivf.ivfAnn.fn(s, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val rel = cand.join(exact, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("rank"),
        when(col("hit").isNull, 0L).otherwise(1L).as("rel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    rel.withColumn("cum", sum(col("rel")).over(w))
      .groupBy(col("query_id"))
      .agg(sum(col("rel")).cast("long").as("n_hits"),
        sum(col("rel") * col("cum") * expr("60 div rank")).cast("long").as("ap_num"),
        (sum(col("rel") * col("cum") * expr("60 div rank")).cast("double")
          / lit(ApDenom.toDouble)).as("ap"))
      .orderBy(col("query_id"))
  }

  val all: Seq[Q] = Seq(annRecall, annAp)
}
