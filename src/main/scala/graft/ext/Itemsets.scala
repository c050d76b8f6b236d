package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Association-rule mining over order baskets — the frequent-itemset
  * primitive (A-Priori's 2-itemset core) shaped for Spark: basket
  * construction is one orderkey-keyed self-join whose per-order fan-out
  * is bounded by basket size (≤7 lines in TPC-H-shaped data), pair
  * supports are one hash aggregation at pair grain, and the two
  * item-support joins attach |parts|-sized tables that AQE broadcasts at
  * any SF where they fit (and shuffle-joins by part key where they
  * don't). No candidate-generation loop, no driver-side itemset state —
  * the frequent-pair lattice level IS the pair aggregate.
  *
  * Rule metrics (confidence, lift) are each ONE IEEE division/multiply
  * chain over exact integer supports, with the identical expression
  * shape in the DuckDB oracle, so the float columns hash-match exactly.
  */
object Itemsets {

  /** Bounded output: top rules by support with deterministic tiebreak. */
  private val TopN = 100

  private val rulesOracle: String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |n AS MATERIALIZED (SELECT COUNT(DISTINCT ok) AS n_orders FROM b),
       |sup AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY 1),
       |pairs AS MATERIALIZED (
       |  SELECT a.p AS p1, c.p AS p2, CAST(COUNT(*) AS BIGINT) AS n_both
       |  FROM b a JOIN b c ON a.ok = c.ok AND a.p < c.p
       |  GROUP BY 1, 2)
       |SELECT p.p1, p.p2, p.n_both,
       |  CAST(p.n_both AS DOUBLE) / s1.s AS conf,
       |  (CAST(p.n_both AS DOUBLE) * n.n_orders) / (s1.s * s2.s) AS lift
       |FROM pairs p
       |JOIN sup s1 ON s1.p = p.p1
       |JOIN sup s2 ON s2.p = p.p2
       |CROSS JOIN n
       |ORDER BY p.n_both DESC, p.p1, p.p2 LIMIT $TopN""".stripMargin

  /** x61: top-$TopN frequent part pairs with rule confidence and lift —
    * bounded basket self-join, pair-grain aggregation, item-support
    * joins sized to the part dimension. */
  val rules = Q.withOracle(
    "x61_association_rules",
    s"x61: top-$TopN frequent part pairs with confidence and lift",
    rulesOracle) { (s, dir) =>
    val b = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint() // read by supports, pair join, and the order count
    val nOrders = b.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val sup = b.groupBy(col("p")).agg(count(lit(1)).cast("long").as("s"))
    val pairs = b.as("a").join(b.as("c"),
        col("a.ok") === col("c.ok") && col("a.p") < col("c.p"))
      .groupBy(col("a.p").as("p1"), col("c.p").as("p2"))
      .agg(count(lit(1)).cast("long").as("n_both"))
    pairs
      .join(sup.select(col("p").as("p1"), col("s").as("s1")), "p1")
      .join(sup.select(col("p").as("p2"), col("s").as("s2")), "p2")
      .crossJoin(nOrders) // 1-row scalar
      .select(col("p1"), col("p2"), col("n_both"),
        (col("n_both").cast("double") / col("s1")).as("conf"),
        ((col("n_both").cast("double") * col("n_orders")) / (col("s1") * col("s2"))).as("lift"))
      .orderBy(col("n_both").desc, col("p1"), col("p2"))
      .limit(TopN)
  }

  val all: Seq[Q] = Seq(rules)
}
