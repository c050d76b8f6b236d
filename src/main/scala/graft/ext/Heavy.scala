package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters with sketch-bounded state — the two-pass
  * candidates-then-recount shape production counters use when the key
  * space is too big to groupBy (URLs, n-grams, session keys: a full
  * `groupBy(token).count` shuffles the ENTIRE vocabulary; at 100 TB of
  * 8-grams that shuffle IS the job):
  *
  *  1. CANDIDATES — each partition streams its tokens through a
  *     [[SpaceSaving]] summary with k counters (Metwally et al. 2005,
  *     the stream-summary structure). Guarantee (pigeonhole + the SS
  *     bound): any token with GLOBAL frequency ≥ φ has LOCAL frequency
  *     ≥ φ in at least one partition (a weighted mean can't exceed its
  *     max), and SS with k ≥ 1/φ retains every token with local
  *     frequency > 1/(k+1) — so the union of per-partition candidate
  *     sets is a SUPERSET of the true heavy hitters at any
  *     parallelism. The shuffle carries ≤ k rows per partition.
  *  2. RECOUNT — exact counts for the ≤ k·P candidate tokens only
  *     (semi-join filter, then a hash agg whose key space is the
  *     candidate set, not the vocabulary), and the exact integer
  *     threshold `n·500 ≥ N` (φ = 1/500) decides.
  *
  * The output is EXACT and DETERMINISTIC even though pass 1 is
  * partitioning-dependent: extra candidates are filtered by the exact
  * threshold, missing ones are impossible by the superset guarantee
  * (HeavySpec pins both halves adversarially). That is what makes a
  * sketch-fronted query oracle-able: DuckDB just runs the naive
  * GROUP BY + HAVING.
  *
  * Why `mapPartitions` (the documented last resort, SURVEY.md §2.8
  * preference order): the summary needs count-ordered access to its
  * counters (O(1) replace-min), which an immutable typed-Aggregator
  * buffer can't provide without an O(k) scan per miss, and a Catalyst
  * expression has no per-group state at all. The iterator form holds
  * ONE O(k) structure per partition and emits ≤ k rows — exactly the
  * memory contract the technique exists for.
  */
object Heavy {

  /** Counters per partition summary. Must be ≥ 1/φ for the superset
    * guarantee; 2× headroom cheapens nothing at this state size. */
  val K = 1000
  /** Heaviness threshold φ = 1/[[Denom]] of all tokens. */
  val Denom = 500L

  /** Space-Saving stream summary: at most `k` (token, count) counters;
    * a miss when full REPLACES the minimum counter, inheriting its
    * count + 1 (the overestimate is what buys the retention bound).
    * O(1) amortized per token via count-bucketed LRU order: counters
    * live in a LinkedHashMap per count value, so the minimum bucket's
    * eldest entry is O(1) to find and evict. */
  final class SpaceSaving(k: Int) {
    require(k > 0)
    private val counts = new java.util.HashMap[String, Long](k * 2)
    // count value -> insertion-ordered tokens at that count
    private val buckets = new java.util.TreeMap[Long, java.util.LinkedHashSet[String]]()

    private def bucketAdd(c: Long, t: String): Unit =
      buckets.computeIfAbsent(c, _ => new java.util.LinkedHashSet[String]()).add(t)

    private def bucketRemove(c: Long, t: String): Unit = {
      val b = buckets.get(c)
      b.remove(t)
      if (b.isEmpty) buckets.remove(c)
    }

    def offer(t: String): Unit = {
      val cur = counts.get(t)
      if (cur != 0L || counts.containsKey(t)) {
        counts.put(t, cur + 1); bucketRemove(cur, t); bucketAdd(cur + 1, t)
      } else if (counts.size < k) {
        counts.put(t, 1L); bucketAdd(1L, t)
      } else {
        val minEntry = buckets.firstEntry()
        val victim = minEntry.getValue.iterator().next()
        val minC = minEntry.getKey
        counts.remove(victim); bucketRemove(minC, victim)
        counts.put(t, minC + 1); bucketAdd(minC + 1, t)
      }
    }

    /** The retained tokens (counts are overestimates; callers recount). */
    def tokens: Iterator[String] = {
      import scala.jdk.CollectionConverters._
      counts.keySet().iterator().asScala
    }
  }

  /** Candidate tokens: the union of per-partition summaries. */
  private[graft] def candidates(tokens: DataFrame, k: Int = K): DataFrame = {
    import tokens.sparkSession.implicits._
    tokens.select(col("tk")).as[String].mapPartitions { it =>
      val ss = new SpaceSaving(k)
      it.foreach(ss.offer)
      ss.tokens
    }.toDF("tk").distinct()
  }

  /** Exact heavy hitters over a single-column `tk` frame. */
  private[graft] def heavyHitters(tokens: DataFrame, k: Int = K): DataFrame = {
    val total = tokens.groupBy().agg(count(lit(1)).as("n_total"))
    tokens.join(broadcast(candidates(tokens, k)), "tk")
      .groupBy(col("tk")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * Denom >= col("n_total"))
      .select(col("tk").as("token"), col("n"),
        (col("n").cast("double") / col("n_total")).as("frac"))
      .orderBy(col("token"))
  }

  private def heavyOracle: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
       |tot AS (SELECT COUNT(*) AS n_total FROM toks)
       |SELECT tk AS token, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(COUNT(*) AS DOUBLE) / (SELECT n_total FROM tot) AS frac
       |FROM toks GROUP BY tk
       |HAVING COUNT(*) * $Denom >= (SELECT n_total FROM tot)
       |ORDER BY token""".stripMargin

  /** x54: corpus heavy hitters — tokens with frequency ≥ 1/[[Denom]],
    * computed sketch-first (per-partition Space-Saving candidates +
    * exact recount) but EXACT by construction; the oracle is the naive
    * GROUP BY + HAVING. */
  val heavyTokens = Q.withOracle(
    "x54_heavy_hitters",
    s"x54: tokens with freq ≥ 1/$Denom via Space-Saving candidates + exact recount",
    heavyOracle) { (s, dir) =>
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tk"))
    heavyHitters(toks)
  }

  val all: Seq[Q] = Seq(heavyTokens)
}
