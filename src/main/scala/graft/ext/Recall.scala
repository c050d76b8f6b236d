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

  val all: Seq[Q] = Seq(annRecall)
}
