package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key salting for skewed shuffle joins — the technique a 1000-executor
  * job needs when a big–big join's key distribution is Zipf: the hottest
  * keys land entire partitions on single reducers, and one straggler owns
  * the stage's wall clock. Salting splits ONLY the hot keys' rows across
  * `Salts` sub-partitions (fact side: deterministic hash of a unique row
  * id; dim side: replicate each hot row once per salt), joins on
  * (key, salt), and leaves the long tail untouched — so dim replication
  * cost is `hot_keys × Salts`, not `|dim| × Salts`.
  *
  * Relationship to AQE: `spark.sql.adaptive.skewJoin` re-splits oversized
  * sort-merge partitions at runtime and is the first line of defense
  * (enabled in this engine's sessions); explicit salting is the plan-level
  * form that also covers shuffled-hash joins and aggregation feeding
  * stages AQE can't re-split (e.g. a skewed key feeding a window). The
  * operator here is the explicit form, with the AQE knob documented as
  * the runtime complement (SCALING.md).
  *
  * Correctness contract: salting is semantics-preserving — the registered
  * query's oracle is the PLAIN join in ANSI SQL; SkewSpec additionally
  * pins row-level equivalence against the unsalted join and the plan
  * posture (no broadcast on the dim side — the hint keeps the shuffled
  * join the technique exists for; hot fact rows actually spread over ≥ 2
  * salts; tail dim rows not replicated).
  *
  * At this SF every dim fits in a broadcast, which would make the whole
  * question moot — the registered query pins the shuffled-join posture
  * via a SHUFFLE_HASH hint exactly so the salted shape stays under test,
  * the same "registered form exercises the scale path" contract as
  * x32/x51.
  */
object Skew {

  /** Salt fan-out for hot keys. */
  val Salts = 8

  /** Keys owning more fact rows than `threshold` — the per-key count is
    * one partial-aggregated pass; the result is bounded by
    * |fact| / threshold keys, which is what makes it broadcastable by
    * construction (a key can exceed the threshold only |fact|/threshold
    * times). */
  def hotKeys(fact: DataFrame, key: String, threshold: Long): DataFrame =
    fact.groupBy(col(key)).agg(count(lit(1)).as("hot_n"))
      .filter(col("hot_n") > threshold)
      .select(col(key), col("hot_n"))

  /** Inner-join `fact` ⋈ `dim` on `key`, salting hot keys `Salts` ways.
    * `rowId` is any fact column unique per row — the deterministic salt
    * source (no rand(): replays identically at any parallelism).
    * `hot` is a [[hotKeys]] frame; both its joins broadcast (bounded by
    * construction). The main join is pinned SHUFFLE_HASH: dim side
    * builds hash maps per (key, salt) partition — no sort, no broadcast. */
  private def hotSet(hot: DataFrame, key: String): DataFrame =
    broadcast(hot.select(col(key), lit(true).as("is_hot")))

  /** Fact side: hot rows get a deterministic salt in [0, Salts); the
    * tail keeps salt 0. */
  private[graft] def saltFact(fact: DataFrame, key: String, rowId: String,
      hot: DataFrame): DataFrame =
    fact.join(hotSet(hot, key), Seq(key), "left")
      .withColumn("salt",
        when(col("is_hot"), pmod(xxhash64(col(rowId)), lit(Salts.toLong)).cast("int"))
          .otherwise(lit(0)))
      .drop("is_hot")

  /** Dim side: hot rows replicate once per salt; the tail stays single. */
  private[graft] def saltDim(dim: DataFrame, key: String, hot: DataFrame): DataFrame =
    dim.join(hotSet(hot, key), Seq(key), "left")
      .withColumn("salt", explode(
        when(col("is_hot"), sequence(lit(0), lit(Salts - 1)))
          .otherwise(array(lit(0)))))
      .drop("is_hot")

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, rowId: String,
      hot: DataFrame): DataFrame =
    saltFact(fact, key, rowId, hot)
      .join(saltDim(dim, key, hot).hint("shuffle_hash"), Seq(key, "salt"))
      .drop("salt")

  /** Decimal view of the double `value` — deterministic cross-engine
    * arithmetic: the cast rounds identically in Spark and DuckDB, and
    * decimal sums are exact and order-independent (the repo-wide rule
    * that keeps double-sum partition order out of oracle hashes). */
  private def valDec(c: Column): Column = c.cast("decimal(25,10)")

  private def aboveAvgOracle: String =
    s"""WITH prof AS MATERIALIZED (
       |  SELECT user_id, COUNT(*) AS cnt,
       |    SUM(CAST(value AS DECIMAL(25,10))) AS total
       |  FROM events GROUP BY user_id),
       |joined AS MATERIALIZED (
       |  SELECT e.event_type, e.value, p.cnt, p.total
       |  FROM events e JOIN prof p USING (user_id))
       |SELECT event_type, COUNT(*) AS n_above
       |FROM joined
       |WHERE CAST(value AS DECIMAL(25,10)) * cnt > total
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** x52: per-event "above this user's average value" flag computed by a
    * hot-key-salted shuffled join of the events fact against the
    * per-user profile dim (cnt, exact decimal total), aggregated to a
    * per-type count. The above-average test is `value·cnt > total` in
    * exact decimals — no division, no double accumulation. Hot keys =
    * users with > 1.25× the mean event count. The ORACLE is the plain
    * join: salting must be invisible in the result. */
  val saltedAboveAvg = Q.withOracle(
    "x52_salted_skew_join",
    s"x52: hot-key-salted ($Salts salts) fact⋈dim join, plain-join oracle",
    aboveAvgOracle) { (s, dir) =>
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"))
    val prof = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(valDec(col("value"))).as("total"))
    // mean rows/key × 1.25 — a deterministic integer-ish threshold; the
    // 1-row scalar broadcast-crossjoins like every scalar in the repo.
    val thr = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg((avg(col("c")) * 1.25).cast("long").as("thr"))
    val hot = hotKeys(ev, "user_id", 0L) // placeholder threshold; filtered below
      .crossJoin(broadcast(thr)).filter(col("hot_n") > col("thr"))
      .select(col("user_id"))
    saltedJoin(ev, prof, key = "user_id", rowId = "event_id", hot = hot)
      .filter(valDec(col("value")) * col("cnt") > col("total"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_above"))
      .orderBy(col("event_type"))
  }

  val all: Seq[Q] = Seq(saltedAboveAvg)
}
