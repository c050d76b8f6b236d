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

  // ---- x74: order-independent table checksum ------------------------

  /** Sub-checksum buckets — 64 longs localize a divergence to 1/64 of
    * the key-hash space before any row moves (the merkle-root idea at
    * depth 1; deeper trees are this same query over one bucket). */
  private val ChecksumBuckets = 64
  /** Fold modulus 2^61: keeps the bucket checksum in a positive long;
    * the decimal(38) running sum holds ~8×10^19 max-hash rows exact. */
  private val Mod = 2305843009213693952L

  private def checksumOracle: String =
    s"""WITH h AS MATERIALIZED (
       |  SELECT CAST(concat('0x', substr(md5(
       |      concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
       |        CAST(floor(o_totalprice * 100) AS BIGINT),
       |        epoch_us(o_orderdate), o_orderpriority)), 1, 15)) AS BIGINT) AS h
       |  FROM orders)
       |SELECT CAST(h % $ChecksumBuckets AS BIGINT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(h) % $Mod AS BIGINT) AS checksum
       |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin

  /** x74: bucketed order-independent checksum of `orders` — x68's
    * reconciliation when only metadata can move (cross-cluster replica
    * verification ships 64 longs, not the table). Every ingredient is
    * cross-engine canonical: integer/string columns print identically,
    * the double canonicalizes to exact cents (`floor(x·100)` on the
    * identical IEEE product), the timestamp to epoch-µs, and the row
    * hash is md5's first 60 bits. Integer sums are order-independent
    * (and commutative across partitions), carried in decimal(38) so
    * ANSI mode cannot overflow, folded mod 2^61.
    *
    * Scale shape: a pure-map hash projection plus one 64-cell hash
    * aggregate with map-side partials — the cheapest possible full-scan
    * QA pass, and the bucket granularity is the recursion knob (diverged
    * bucket → rerun over that bucket with a deeper split). */
  val tableChecksum = Q.withOracle(
    "x74_table_checksum",
    s"x74: bucketed order-independent md5 checksum of orders ($ChecksumBuckets buckets)",
    checksumOracle) { (s, dir) =>
    val canonical = concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      floor(col("o_totalprice") * 100).cast("long"),
      unix_micros(col("o_orderdate")), col("o_orderpriority"))
    val h = Tables.orders(s, dir)
      .select(conv(substring(md5(canonical), 1, 15), 16, 10).cast("long").as("h"))
    h.groupBy((col("h") % ChecksumBuckets).as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        (sum(col("h").cast("decimal(38,0)")) % Mod).cast("long").as("checksum"))
      .orderBy(col("bucket"))
  }

  val all: Seq[Q] = Seq(snapshotDiffRollup, tableChecksum)
}
