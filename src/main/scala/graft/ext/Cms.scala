package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min sketch — the third sketch family next to HLL (a1b, distinct
  * count) and KMV (x66, mergeable distinct count): CMS answers point
  * FREQUENCY queries from a fixed d×W counter grid with one-sided error
  * (never underestimates, overestimates by ≤ εN with probability 1−δ).
  *
  * Lane family is the portable md5 recipe (x2's MinHash discipline):
  * `h_j(t) = (hi + j·lo) mod 2^32 mod W` over ONE md5 per token, so the
  * whole sketch — build AND estimate — replays exactly in the DuckDB
  * oracle; an xxhash64 family is what a Spark-only deployment would swap
  * in, same plumbing.
  *
  * Scale shape (100 TB): token counts are ONE map-side-combined hash
  * aggregation (the same shuffle any vocabulary pass pays); the counter
  * grid is a d×W-row aggregate of the vocab table (counters are SUMS, so
  * the grid is mergeable across partitions/streams — the incremental-feed
  * property CMS exists for); estimation joins the vocab against the
  * BROADCAST grid (d·W rows, bounded by construction) and takes a
  * packed-long min per token. Nothing proportional to the corpus is ever
  * shuffled twice, collected, or sorted.
  */
object Cms {

  /** Sketch depth (independent lanes). */
  private[graft] val Depth = 3
  /** Sketch width (counters per lane) — sized BELOW the corpus vocab so
    * collisions are real and the one-sided-error property is exercised,
    * not vacuous. Production sizing is W = ⌈e/ε⌉ for εN additive error. */
  private[graft] val Width = 16
  private val Mod32 = 4294967296L

  /** The [[Depth]] lane buckets of any string key as an array column —
    * the one hash recipe shared by the batch queries, the DuckDB
    * oracles, and [[graft.streaming.CmsFeed]]. */
  private[graft] def laneBuckets(c: org.apache.spark.sql.Column,
      width: Int = Width): org.apache.spark.sql.Column = {
    val m = md5(c)
    val hi = conv(substring(m, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(m, 9, 8), 16, 10).cast("long")
    array((0 until Depth).map(j => (hi + lit(j.toLong) * lo) % Mod32 % width): _*)
  }

  private def cmsOracle: String = {
    val laneRows = (0 until Depth).map { j =>
      s"SELECT tok, n, $j AS lane, (hi + $j * lo) % $Mod32 % $Width AS bucket FROM lanes"
    }.mkString("\nUNION ALL\n")
    s"""WITH cnt AS MATERIALIZED (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM (
       |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok),
       |lanes AS MATERIALIZED (
       |  SELECT tok, n,
       |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
       |    ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
       |  FROM cnt),
       |lr AS MATERIALIZED ($laneRows),
       |grid AS MATERIALIZED (
       |  SELECT lane, bucket, SUM(n) AS c FROM lr GROUP BY 1, 2),
       |est AS MATERIALIZED (
       |  SELECT lr.tok, MIN(lr.n) AS n_exact, CAST(MIN(g.c) AS BIGINT) AS n_cms
       |  FROM lr JOIN grid g ON lr.lane = g.lane AND lr.bucket = g.bucket
       |  GROUP BY lr.tok)
       |SELECT tok, n_exact, n_cms
       |FROM est ORDER BY n_exact DESC, tok LIMIT 20""".stripMargin
  }

  /** The vocab with exact counts and md5 (hi, lo) lanes. */
  private[graft] def vocabLanes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .withColumn("m", md5(col("tok")))
      .select(col("tok"), col("n"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("hi"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("lo"))

  /** Per-token lane rows: (tok, n, lane, bucket) × Depth. */
  private[graft] def laneRows(vocab: DataFrame): DataFrame =
    vocab.select(col("tok"), col("n"),
        explode(array((0 until Depth).map { j =>
          struct(lit(j).as("lane"),
            ((col("hi") + lit(j.toLong) * col("lo")) % Mod32 % Width).as("bucket"))
        }: _*)).as("lb"))
      .select(col("tok"), col("n"), col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))

  /** x82: CMS build + point estimates for the 20 most frequent tokens —
    * each output row carries the exact count next to the sketch estimate,
    * so the oracle pins the full one-sided-error behavior, not just the
    * grid. */
  val cmsFreq = Q.withOracle(
    "x82_cms_freq",
    s"x82: Count-Min sketch ($Depth×$Width, md5 lanes) vs exact token counts",
    cmsOracle) { (s, dir) =>
    val lr = laneRows(vocabLanes(s, dir))
    val grid = lr.groupBy(col("lane"), col("bucket")).agg(sum(col("n")).as("c"))
    lr.join(broadcast(grid), Seq("lane", "bucket"))
      .groupBy(col("tok"))
      .agg(min(col("n")).as("n_exact"), min(col("c")).cast("long").as("n_cms"))
      .orderBy(col("n_exact").desc, col("tok")).limit(20)
  }

  /** Grid width for the x85 join-size estimator — much wider than
    * [[Width]] because here collisions inflate a SUM of products, not a
    * min of counts: the per-lane overestimate is ~|A|·|B|/W, so sizing
    * W against the ROW-COUNT PRODUCT (not the key cardinality) is what
    * makes the estimate usable — measured here: W=256 inflated 7×/59×
    * at sf0.01/0.1, W=2^16 lands at 1.0–1.2×. The grid is 3×65536
    * longs ≈ 1.5 MB — still broadcast metadata, the planner-statistics
    * trade. */
  private val JoinWidth = 65536

  private def joinSizeOracle: String = {
    def laneRows(table: String, key: String) = (0 until Depth).map { j =>
      s"""SELECT $j AS lane,
         |  (('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT
         |   + $j * ('0x' || substr(md5(CAST($key AS VARCHAR)), 9, 8))::BIGINT)
         |  % $Mod32 % $JoinWidth AS bucket
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH g1 AS MATERIALIZED (
       |  SELECT lane, bucket, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (${laneRows("events", "user_id")}) GROUP BY 1, 2),
       |g2 AS MATERIALIZED (
       |  SELECT lane, bucket, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (${laneRows("orders", "o_custkey")}) GROUP BY 1, 2),
       |lanes AS (
       |  SELECT g1.lane, CAST(SUM(g1.c * g2.c) AS BIGINT) AS est
       |  FROM g1 JOIN g2 USING (lane, bucket) GROUP BY 1),
       |est AS (SELECT CAST(MIN(est) AS BIGINT) AS est_cms FROM lanes),
       |ex AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
       |  FROM events e JOIN orders o ON e.user_id = o.o_custkey)
       |SELECT est.est_cms, ex.n_exact,
       |  CAST(est.est_cms AS DOUBLE) / ex.n_exact AS inflation
       |FROM est, ex""".stripMargin
  }

  /** x85: join-size estimation from two CMS grids — the AMS inner
    * product (Alon–Gibbons–Matias–Szegedy): |A ⋈ B| on a shared key is
    * Σ_k a_k·b_k, estimated per lane as Σ_bucket g_A[b]·g_B[b] and
    * min'd across lanes (each collision only ADDS, so the estimate is
    * one-sided like the point query). This is the cardinality-planner
    * primitive: both grids are Depth×[[JoinWidth]] longs built with ONE
    * aggregation per side — the estimate costs two metadata-sized
    * sketches where the exact answer costs the join itself. The many-
    * to-many events.user_id ⋈ orders.o_custkey pair is exactly the case
    * where a planner needs it. Exact join count computed alongside so
    * the oracle pins estimate AND inflation. */
  val cmsJoinSize = Q.withOracle(
    "x85_cms_join_size",
    s"x85: AMS/CMS join-size estimate ($Depth×$JoinWidth grids) vs the exact join",
    joinSizeOracle) { (s, dir) =>
    def grid(df: DataFrame, key: String): DataFrame =
      df.select(posexplode(laneBuckets(col(key).cast("string"), JoinWidth)))
        .select(col("pos").as("lane"), col("col").as("bucket"))
        .groupBy(col("lane"), col("bucket")).agg(count(lit(1)).as("c"))
    val ev = Tables.events(s, dir)
    val or = Tables.orders(s, dir)
    val est = grid(ev, "user_id").as("a")
      .join(grid(or, "o_custkey").as("b"), Seq("lane", "bucket"))
      .groupBy(col("lane"))
      .agg(sum(col("a.c") * col("b.c")).as("est"))
      .agg(min(col("est")).cast("long").as("est_cms"))
    val exact = ev.join(or, col("user_id") === col("o_custkey"))
      .agg(count(lit(1)).cast("long").as("n_exact"))
    est.crossJoin(exact)
      .select(col("est_cms"), col("n_exact"),
        (col("est_cms").cast("double") / col("n_exact")).as("inflation"))
  }

  val all: Seq[Q] = Seq(cmsFreq, cmsJoinSize)
}
