package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood dedup (Hernández & Stolfo, SIGMOD'95) — the
  * SEQUENTIAL blocking family, complementing the engine's hash-blocking
  * near-dup stack (x2 MinHash-LSH, x3 SimHash, x104 winnowing): sort
  * records by a discriminating key, then compare only records within a
  * sliding window of the sort order. Candidates are O(n·w) — linear —
  * regardless of how skewed any particular blocking value is, which is
  * SNM's selling point when hash blocks go degenerate (a boilerplate
  * header shared by 10% of a crawl makes that LSH bucket quadratic;
  * the sort window never exceeds w comparisons per record).
  *
  * Distributed form: a global sort is replaced by (block, in-block
  * rank) — records block on a short key prefix, rank within the block
  * by (longer key, doc_id), and window pairs materialize as an
  * EQUI-join of the ranked table with itself on (block, rank + d),
  * d ∈ 1..w−1 (the probe side explodes the d offsets — the x119
  * neighbor-cell trick on a 1-D axis). Windows do not cross block
  * boundaries — the standard parallel-SNM tradeoff, and the reason
  * multi-pass SNM exists: x123 runs a SECOND pass over the REVERSED
  * text (prefix-divergent but suffix-similar records land adjacent
  * there), unions the two candidate sets, and scores once — recall is
  * a superset of either single pass at the same O(n·w) asymptotics.
  *
  * Pair similarity is exact distinct-token Jaccard, computed ONLY for
  * the O(n·w) window candidates: two doc-keyed equi-joins against the
  * token table, one (pair)-keyed count — every shuffle keyed, output
  * filtered to jac ≥ [[MinJac]] and deterministically ordered. */
object Snm {

  /** Window width: each record is compared to the next w−1 records in
    * its block's sort order. */
  private val W = 3

  /** Blocking prefix (chars of the sort key) — coarse enough that true
    * near-dups rarely split, fine enough that blocks stay parallel. */
  private val BlockPfx = 8

  /** In-block sort key length (chars of the sort key). */
  private val SortPfx = 64

  private val MinJac = 0.5

  /** One SNM pass over an arbitrary key expression: normalized
    * (doc_a < doc_b) window-candidate pairs. */
  private def windowPairs(docs: DataFrame, key: Column): DataFrame = {
    val ranked = docs
      .select(col("doc_id"), substring(key, 1, BlockPfx).as("blk"),
        substring(key, 1, SortPfx).as("sk"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("blk")).orderBy(col("sk"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("blk"), col("rn"))
    val probes = ranked
      .withColumn("d", explode(array((1 until W).map(d => lit(d.toLong)): _*)))
      .select(col("doc_id").as("id_a"), col("blk"), (col("rn") + col("d")).as("rn"))
    probes
      .join(ranked.select(col("doc_id").as("id_b"), col("blk"), col("rn")),
        Seq("blk", "rn"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"))
  }

  /** Exact distinct-token Jaccard for a candidate pair set, filtered to
    * ≥ [[MinJac]] and deterministically ordered. */
  private def score(docs: DataFrame, cand: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(toks.select(col("doc_id").as("doc_a"), col("tok")), Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"),
        (col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
          .as("jac"))
      .filter(col("jac") >= MinJac)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Shared oracle fragments: one ranked/cand CTE pair per pass key. */
  private def candSql(tag: String, keySql: String): String =
    s"""ranked$tag AS MATERIALIZED (
       |  SELECT doc_id, substr($keySql, 1, $BlockPfx) AS blk,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY substr($keySql, 1, $BlockPfx)
       |      ORDER BY substr($keySql, 1, $SortPfx), doc_id) AS BIGINT) AS rn
       |  FROM documents),
       |cand$tag AS MATERIALIZED (
       |  SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
       |    GREATEST(a.doc_id, b.doc_id) AS doc_b
       |  FROM ranked$tag a JOIN ranked$tag b
       |    ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + ${W - 1})""".stripMargin

  private def scoreSql(candRel: String): String =
    s"""toks AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |sizes AS MATERIALIZED (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1),
       |inter AS MATERIALIZED (
       |  SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
       |  FROM $candRel c
       |  JOIN toks ta ON ta.doc_id = c.doc_a
       |  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common, za.n AS n_a, zb.n AS n_b,
       |  CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) AS jac
       |FROM inter
       |JOIN sizes za ON doc_a = za.doc_id
       |JOIN sizes zb ON doc_b = zb.doc_id
       |WHERE CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) >= $MinJac
       |ORDER BY doc_a, doc_b""".stripMargin

  /** x120: single forward pass. */
  val snmPairs = Q.withOracle(
    "x120_snm_pairs",
    s"x120: sorted-neighborhood near-dup pairs (w=$W window over a prefix sort, O(n*w) candidates)",
    s"""WITH ${candSql("", "text")},
       |${scoreSql("cand")}""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    score(docs, windowPairs(docs, col("text")))
  }

  /** x123: two passes — forward text and reversed text — unioned before
    * scoring; the classic multi-pass recall fix at unchanged O(n·w). */
  val snmMultipass = Q.withOracle(
    "x123_snm_multipass",
    s"x123: multi-pass SNM (forward + reversed-key passes, unioned candidates)",
    s"""WITH ${candSql("F", "text")},
       |${candSql("R", "reverse(text)")},
       |cand AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM candF
       |  UNION
       |  SELECT doc_a, doc_b FROM candR),
       |${scoreSql("cand")}""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val cand = windowPairs(docs, col("text"))
      .unionByName(windowPairs(docs, reverse(col("text"))))
      .distinct()
    score(docs, cand)
  }

  val all: Seq[Q] = Seq(snmPairs, snmMultipass)
}
