package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** x68: snapshot reconciliation — the batch diff of two table versions
  * (added / removed / changed / unchanged per key). The regression-test
  * primitive of a data pipeline: "what did the new pipeline version do
  * to the corpus?" is this query over (yesterday's output, today's),
  * and the reference's weekly re-loads (load-data.py re-ingesting a
  * week) implicitly pose it every run. [[graft.streaming.Cdc]] answers
  * the INCREMENTAL form from a changelog; this is the from-scratch form
  * when all you have is two snapshots.
  *
  * Scale shape: ONE full-outer join co-partitioned on the key, null-safe
  * struct comparison for change detection (no per-column join, no
  * row-count × column-count blowup) — at 100 TB both snapshots bucket by
  * the same key and the join is shuffle-free. The registered query emits
  * the bounded per-class rollup; the row-level frame is the library
  * function below.
  */
object Diff {

  /** Row-level diff: keys + `change` ∈ added|removed|changed|unchanged.
    * Snapshots must share a schema; comparison is null-safe over all
    * non-key columns at once (one struct <=> struct). */
  def snapshotDiff(old: DataFrame, nw: DataFrame, keys: Seq[String]): DataFrame = {
    require(old.columns.toSeq == nw.columns.toSeq,
      s"snapshot schemas differ: ${old.columns.toSeq} vs ${nw.columns.toSeq}")
    val valueCols = old.columns.filterNot(keys.contains).toSeq
    val o = old.select(keys.map(col) :+ struct(valueCols.map(col): _*).as("_o"): _*)
    val n = nw.select(keys.map(col) :+ struct(valueCols.map(col): _*).as("_n"): _*)
    o.join(n, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("_o").isNull, "added")
          .when(col("_n").isNull, "removed")
          .when(!(col("_o") <=> col("_n")), "changed")
          .otherwise("unchanged").as("change"): _*)
  }

  private def diffOracle: String =
    """WITH o AS MATERIALIZED (
      |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |n AS MATERIALIZED (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS st,
      |    o_totalprice AS tp
      |  FROM orders WHERE o_orderkey % 11 <> 0),
      |d AS (
      |  SELECT CASE WHEN o.k IS NULL THEN 'added'
      |              WHEN n.k IS NULL THEN 'removed'
      |              WHEN (o.st, o.tp) IS DISTINCT FROM (n.st, n.tp) THEN 'changed'
      |              ELSE 'unchanged' END AS change
      |  FROM o FULL OUTER JOIN n ON o.k = n.k)
      |SELECT change, CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM d GROUP BY change ORDER BY change""".stripMargin

  /** x68: reconciliation rollup between two deterministically-derived
    * versions of `orders` — old drops key%7=0, new drops key%11=0 and
    * rewrites o_orderstatus on key%5=0 — so all four change classes are
    * populated and the oracle replays the exact classification. */
  val snapshotDiffRollup = Q.withOracle(
    "x68_snapshot_diff",
    "x68: snapshot reconciliation rollup (added/removed/changed/unchanged)",
    diffOracle) { (s, dir) =>
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("tp"))
    val old = base.filter(col("k") % 7 =!= 0)
    val nw = base.filter(col("k") % 11 =!= 0)
      .select(col("k"),
        when(col("k") % 5 === 0, "X").otherwise(col("st")).as("st"),
        col("tp"))
    snapshotDiff(old, nw, Seq("k"))
      .groupBy(col("change")).agg(count(lit(1)).cast("long").as("n_rows"))
      .orderBy(col("change"))
  }

  val all: Seq[Q] = Seq(snapshotDiffRollup)
}
