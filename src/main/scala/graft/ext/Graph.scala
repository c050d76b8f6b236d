package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over a DERIVED co-occurrence graph — the two classic
  * whole-graph operators a relational engine is usually assumed to be bad
  * at, each shaped for a 1000-executor cluster:
  *
  *   - x59 PageRank: Pregel-style synchronous iteration expressed as K
  *     rounds of (edge ⋈ rank) + dst-keyed aggregation. The edge and
  *     degree tables are materialized ONCE (localCheckpoint) and re-read
  *     every round, so the per-round cost is one keyed shuffle join plus
  *     one aggregation — never a growing lineage. All arithmetic is
  *     integer-scaled (rank fixed-point at 1e12) so a DuckDB replay is
  *     bit-exact: contributions use integer division by out-degree, and
  *     the damping step is (85·sum) div 100 — order-independent integer
  *     sums, no IEEE reassociation hazard.
  *   - x60 triangle counting: the MapReduce-clusters algorithm of Suri &
  *     Vassilvitskii (WWW'11) — orient every undirected edge from the
  *     lower to the higher endpoint in the (degree, id) total order, then
  *     count wedge closures. Orientation bounds every node's out-degree
  *     by O(√m), so the wedge join's per-key fan-out — the term that
  *     explodes on power-law graphs when wedges pivot on raw high-degree
  *     hubs — is provably bounded; all three steps are equi-joins on
  *     node keys (no cross product anywhere).
  *
  * The graph itself: parts are linked when they co-occur in an order
  * (lineitem self-join on l_orderkey). Per-order fan-out is bounded by
  * the order's line count (≤7 in TPC-H-shaped data), so edge
  * construction is linear in lineitem with one orderkey-keyed shuffle.
  */
object Graph {

  /** Fixed-point scale for PageRank ranks (1.0 ≡ 1e12).
    *
    * Headroom bound (the LPA PackBase discipline): total rank mass is
    * conserved at N·RScale. Since round 12 the in-neighbor contribution
    * sum and the `85·sum` damping multiply are carried in decimal(38,0)
    * — matching DuckDB's silent SUM→HUGEINT widening, so the two
    * engines stay in lockstep instead of loud-vs-silent diverging. The
    * remaining ceiling is the final rank VALUE's cast back to BIGINT:
    * a single hub would need ~1.08e7 nodes' ENTIRE conserved mass in
    * its in-neighborhood before r exceeds 2^63 — two orders beyond the
    * old 85·sum long bound, and unreachable for any graph whose hubs
    * hold a bounded mass share. If even that bound bites, drop RScale
    * to 1e9 (headroom ~1e10 full-mass nodes at 1e-9 resolution). */
  private val RScale = 1000000000000L
  /** Damping = 85/100 in exact integer arithmetic. */
  private val DampNum = 85L
  /** PageRank rounds — enough to differentiate hub structure while the
    * oracle replay stays a bounded CTE chain; the Spark side takes K as
    * a parameter. */
  private val Rounds = 3

  /** Distinct (order, part) pairs — collapses duplicate lines of the same
    * part inside one order before the self-join. */
  private def orderParts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()

  /** Directed co-occurrence edges (both directions), deduplicated. */
  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val li = orderParts(s, dir)
    li.as("a").join(li.as("b"), col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      .distinct()
  }

  private def pagerankOracle: String = {
    // r_{k+1}(v) = 0.15 + 0.85 * sum_{u->v} r_k(u)/outdeg(u), fixed-point
    // integers throughout; LEFT JOIN keeps isolated-direction nodes (none
    // exist in a symmetrized graph, but the shape is total regardless).
    val rounds = (1 to Rounds).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT d.src AS v,
         |    ${RScale * 15 / 100} + ($DampNum * COALESCE(s.m, 0)) // 100 AS r
         |  FROM deg d LEFT JOIN (
         |    SELECT p.dst, SUM(r.r // g.d) AS m
         |    FROM pairs p JOIN r${k - 1} r ON p.src = r.v
         |    JOIN deg g ON g.src = p.src
         |    GROUP BY p.dst) s ON d.src = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |pairs AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |  GROUP BY 1, 2),
       |deg AS MATERIALIZED (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM pairs GROUP BY 1),
       |r0 AS MATERIALIZED (
       |  SELECT src AS v, CAST($RScale AS BIGINT) AS r FROM deg),
       |$rounds
       |SELECT v AS part, CAST(r AS BIGINT) AS pr
       |FROM r$Rounds ORDER BY pr DESC, part LIMIT 100""".stripMargin
  }

  /** Full (part, pr) rank table after [[Rounds]] synchronous rounds —
    * the registered query takes its deterministic top-100; specs read the
    * whole table (mass conservation is a global invariant). */
  def pagerankFull(s: SparkSession, dir: String): DataFrame = {
    val pairs = coEdges(s, dir).localCheckpoint() // read K+1 times: once per round + degree
    val deg = pairs.groupBy(col("src")).agg(count(lit(1)).as("d")).localCheckpoint()
    var ranks = deg.select(col("src").as("v"), lit(RScale).as("r"))
    for (_ <- 1 to Rounds) {
      val contrib = pairs
        .join(deg, "src")
        .join(ranks, col("src") === col("v"))
        .select(col("dst"), expr("r div d").as("c"))
        // decimal(38,0) carry (round 12): the long path threw on the
        // 85·sum damping multiply once ~1.08e5 nodes' mass funneled
        // into one hub's in-neighbor sum; DuckDB widens SUM to HUGEINT
        // silently, so decimal is also the parity-preserving choice.
        .groupBy(col("dst")).agg(sum(col("c").cast("decimal(38,0)")).as("m"))
      ranks = deg
        .select(col("src").as("v"))
        .join(contrib, col("v") === col("dst"), "left")
        .select(col("v"),
          (lit(RScale * 15 / 100) + expr(
            s"CAST(($DampNum * coalesce(m, CAST(0 AS DECIMAL(38,0)))) div 100 AS BIGINT)"))
            .as("r"))
    }
    // Materialize the final ranks (N rows) and release the edge/degree
    // checkpoints (E rows) they were built from: repeated invocations —
    // a probe's warm+timed runs, a bench's reps — otherwise ACCUMULATE
    // E-row block-manager generations per call, the storage-pressure
    // tail the round-11 20× probe OOM'ed on. One N-row block per
    // invocation remains for the ContextCleaner.
    val out = ranks.select(col("v").as("part"), col("r").as("pr")).localCheckpoint()
    pairs.unpersist()
    deg.unpersist()
    out
  }

  /** x59: K-round integer-fixed-point PageRank over the part
    * co-occurrence graph; edges + degrees checkpointed once, each round
    * is one keyed join + one dst aggregation. */
  val pagerank = Q.withOracle(
    "x59_pagerank",
    s"x59: $Rounds-round fixed-point PageRank on the part co-occurrence graph",
    pagerankOracle) { (s, dir) =>
    pagerankFull(s, dir).orderBy(col("pr").desc, col("part")).limit(100)
  }

  private def triangleOracle: String =
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p < b.p
       |  GROUP BY 1, 2),
       |deg AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS d
       |  FROM (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e)
       |  GROUP BY 1),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN ku.d * 4294967296 + e.u < kv.d * 4294967296 + e.v
       |              THEN e.u ELSE e.v END AS src,
       |         CASE WHEN ku.d * 4294967296 + e.u < kv.d * 4294967296 + e.v
       |              THEN e.v ELSE e.u END AS dst,
       |         GREATEST(ku.d * 4294967296 + e.u, kv.d * 4294967296 + e.v) AS kdst
       |  FROM e JOIN deg ku ON ku.p = e.u JOIN deg kv ON kv.p = e.v)
       |SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       |       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       |       CAST((SELECT COUNT(*)
       |             FROM o a JOIN o b ON a.src = b.src AND a.kdst < b.kdst
       |             JOIN o c ON c.src = a.dst AND c.dst = b.dst) AS BIGINT)
       |         AS n_triangles""".stripMargin

  /** Undirected edges (u < v), checkpointed — shared by the degree count
    * and the orientation join. */
  private def undirected(s: SparkSession, dir: String): DataFrame = {
    val li = orderParts(s, dir)
    li.as("a").join(li.as("b"), col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .localCheckpoint()
  }

  /** Orient an undirected (u, v) edge set low→high in the packed
    * (degree, id) total order, degrees computed ON THAT edge set — ids
    * are distinct so ties are impossible and the orientation is a DAG
    * with O(√m)-bounded out-degrees. */
  private def orientEdgeSet(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("p")).unionAll(e.select(col("v").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("d"))
    val ku = deg.select(col("p").as("u"), (col("d") * lit(4294967296L) + col("p")).as("kukey"))
    val kv = deg.select(col("p").as("v"), (col("d") * lit(4294967296L) + col("p")).as("kvkey"))
    e.join(ku, "u").join(kv, "v")
      .select(
        when(col("kukey") < col("kvkey"), col("u")).otherwise(col("v")).as("src"),
        when(col("kukey") < col("kvkey"), col("v")).otherwise(col("u")).as("dst"),
        greatest(col("kukey"), col("kvkey")).as("kdst"))
  }

  /** Closed-wedge (triangle) count of an oriented edge table as a 1-row
    * scalar — the wedge join + closure probe shared by x60 and x60b. */
  private def countTriangles(o: DataFrame): DataFrame = {
    val wedges = o.as("a").join(o.as("b"),
        col("a.src") === col("b.src") && col("a.kdst") < col("b.kdst"))
      .select(col("a.dst").as("wu"), col("b.dst").as("wv"))
    wedges.join(o.as("c"), col("wu") === col("c.src") && col("wv") === col("c.dst"))
      .agg(count(lit(1)).cast("long").as("t"))
  }

  /** The full graph's oriented edges. Exposed for the fan-out-bound
    * spec. */
  def orientedEdges(s: SparkSession, dir: String): DataFrame =
    orientEdgeSet(undirected(s, dir))

  /** x60: exact triangle count via degree-ordered edge orientation
    * (out-degree bounded by O(√m)) — wedge join + closure join, all
    * node-keyed equi-joins. */
  val triangles = Q.withOracle(
    "x60_triangle_count",
    "x60: degree-oriented exact triangle count on the part co-occurrence graph",
    triangleOracle) { (s, dir) =>
    // oriented edges are a bijection of the undirected set, so node and
    // edge counts read off o directly - ONE edge construction total
    val e = undirected(s, dir)
    val o = orientEdgeSet(e)
      .localCheckpoint() // pivot of both wedge sides, the closure probe, and the counts
    e.unpersist() // o is materialized; keep ONE edge generation, not two
    val tri = countTriangles(o).select(col("t").as("n_triangles"))
    val nn = o.select(explode(array(col("src"), col("dst"))).as("p")).distinct()
      .agg(count(lit(1)).cast("long").as("n_nodes"))
    val ne = o.agg(count(lit(1)).cast("long").as("n_edges"))
    nn.crossJoin(ne).crossJoin(tri) // three 1-row scalars
  }

  // ---- x60b: DOULION sampled-approximate triangle count -------------

  /** Edge-keep nibbles for the DOULION sparsifier: first hex nibble of
    * md5("u_v") in {0,1,2,3} → keep probability p = 1/4, estimator
    * multiplier 1/p³ = 64. md5 of the canonical "u_v" string is the
    * x17/x19 determinism pattern — the SAME edges survive on every
    * engine, at any parallelism, so the DuckDB oracle replays the
    * estimate EXACTLY (the approximation is vs x60's truth, never vs
    * the oracle). */
  private val TriSampleNibbles = Seq("0", "1", "2", "3")
  private val TriSampleInvP3 = 64L

  private def doulionOracle: String =
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p < b.p
       |  GROUP BY 1, 2),
       |es AS MATERIALIZED (
       |  SELECT u, v FROM e
       |  WHERE substr(md5(CAST(u AS VARCHAR) || '_' || CAST(v AS VARCHAR)), 1, 1)
       |    IN (${TriSampleNibbles.map(n => s"'$n'").mkString(", ")})),
       |deg AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS d
       |  FROM (SELECT u AS p FROM es UNION ALL SELECT v AS p FROM es)
       |  GROUP BY 1),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN ku.d * 4294967296 + es.u < kv.d * 4294967296 + es.v
       |              THEN es.u ELSE es.v END AS src,
       |         CASE WHEN ku.d * 4294967296 + es.u < kv.d * 4294967296 + es.v
       |              THEN es.v ELSE es.u END AS dst,
       |         GREATEST(ku.d * 4294967296 + es.u, kv.d * 4294967296 + es.v) AS kdst
       |  FROM es JOIN deg ku ON ku.p = es.u JOIN deg kv ON kv.p = es.v),
       |t AS MATERIALIZED (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS st
       |  FROM o a JOIN o b ON a.src = b.src AND a.kdst < b.kdst
       |  JOIN o c ON c.src = a.dst AND c.dst = b.dst)
       |SELECT CAST((SELECT COUNT(*) FROM es) AS BIGINT) AS n_sampled_edges,
       |       st AS n_sampled_triangles,
       |       CAST(st * $TriSampleInvP3 AS BIGINT) AS est_triangles
       |FROM t""".stripMargin

  /** x60b: DOULION-style approximate triangle count (Tsourakakis et
    * al., KDD'09) — sparsify the edge set by a DETERMINISTIC hash
    * predicate (keep iff md5("u_v") starts 0–3, p = 1/4), run x60's
    * degree-oriented exact count on the survivors, scale by 1/p³. The
    * scale tier for the one probe row that is inherently linear in
    * wedge work: wedges on the sampled graph carry ~p² the join rows
    * and triangles survive at p³, so the closure probe pays ~1/16 of
    * x60's shuffle at p = 1/4 — and p is the lever (est. relative
    * error ~ 1/√(p³·T) shrinks as triangles T grow, so LARGER graphs
    * afford SMALLER p; measured −2.3% at sf0.01, −0.35% at sf0.1).
    * Orientation degrees are computed on the SAMPLED graph — the
    * estimator counts sampled-graph triangles exactly, and any
    * orientation of the same edge set counts the same triangles. */
  val trianglesApprox = Q.withOracle(
    "x60b_triangle_doulion",
    "x60b: DOULION p=1/4 hash-sampled approximate triangle count",
    doulionOracle) { (s, dir) =>
    // Sample BELOW the edge-dedup: the keep predicate commutes with
    // DISTINCT (it reads only the (u, v) key), so filtering the raw
    // self-join pairs first sends ~p of the rows through the dedup
    // shuffle — the oracle's post-dedup filter is the same edge set.
    val li = orderParts(s, dir)
    val keep = substring(
      md5(concat(col("a.p").cast("string"), lit("_"), col("b.p").cast("string"))),
      1, 1).isin(TriSampleNibbles: _*)
    val sampled = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .filter(keep)
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .localCheckpoint() // orientation reads it three times (degrees + both join sides)
    val o = orientEdgeSet(sampled)
      .localCheckpoint() // pivot of both wedge sides + the closure probe
    sampled.unpersist() // o is materialized; keep ONE edge generation
    val tri = countTriangles(o)
    val ne = o.agg(count(lit(1)).cast("long").as("n_sampled_edges"))
    ne.crossJoin(tri) // two 1-row scalars
      .select(col("n_sampled_edges"),
        col("t").as("n_sampled_triangles"),
        (col("t") * lit(TriSampleInvP3)).cast("long").as("est_triangles"))
  }

  /** BFS depth — bounded frontier expansion rounds; hop-3 closure is the
    * registered contract (deeper scans are the same loop longer). */
  private val Hops = 3
  /** Deterministic seed predicate: ~1% of parts. */
  private val SeedMod = 97L

  private def bfsOracle: String = {
    val rounds = (1 to Hops).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT v, MIN(hop) AS hop FROM (
         |    SELECT v, hop FROM d${k - 1}
         |    UNION ALL
         |    SELECT p.dst AS v, $k AS hop
         |    FROM d${k - 1} d JOIN pairs p ON p.src = d.v
         |    WHERE d.hop = ${k - 1})
         |  GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |pairs AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |  GROUP BY 1, 2),
       |d0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS v, 0 AS hop FROM pairs WHERE src % $SeedMod = 0),
       |$rounds
       |SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM d$Hops GROUP BY hop ORDER BY hop""".stripMargin
  }

  /** x63: multi-source BFS hop histogram — [[Hops]] rounds of frontier
    * join + min-hop aggregation over the co-occurrence graph; only the
    * CURRENT frontier joins edges each round, never the full label
    * table. */
  val bfs = Q.withOracle(
    "x63_bfs_hops",
    s"x63: $Hops-hop multi-source BFS reach histogram (seeds: part % $SeedMod = 0)",
    bfsOracle) { (s, dir) =>
    val pairs = coEdges(s, dir).localCheckpoint() // read once per round
    // the edge set is symmetrized, so src alone covers every node
    var dist = pairs.select(col("src").as("v")).distinct()
      .filter(col("v") % SeedMod === 0)
      .select(col("v"), lit(0).as("hop"))
      .localCheckpoint()
    for (k <- 1 to Hops) {
      val reached = dist.filter(col("hop") === k - 1)
        .join(pairs, col("v") === col("src"))
        .select(col("dst").as("v"), lit(k).as("hop"))
      val prev = dist
      dist = dist.unionAll(reached)
        .groupBy(col("v")).agg(min(col("hop")).as("hop"))
        .localCheckpoint() // each round's labels feed the next frontier
      prev.unpersist() // superseded generation — the x73 block-manager hygiene
    }
    pairs.unpersist() // final dist is materialized; edges no longer needed
    dist.groupBy(col("hop")).agg(count(lit(1)).cast("long").as("n_nodes"))
      .orderBy(col("hop"))
  }

  // ---- x155: effective diameter (sampled hop-plot) -------------------

  /** Seed panel size for x155 — FIXED, so the per-seed BFS costs
    * K·|V| pair-labels at any graph size (a fraction-of-nodes seed rule
    * would make the pair table quadratic). */
  private val DiamSeeds = 16
  /** Hop horizon: co-occurrence graphs are shallow; 4 rounds bounds the
    * oracle CTE chain and the hop axis. */
  private val DiamHops = 4

  /** The shared seed-panel BFS CTE prefix (edges, [[DiamSeeds]] seeds,
    * [[DiamHops]] exact min-hop rounds ending in `d$DiamHops`) — the
    * oracle-side twin of [[seedPanelDist]], consumed by both x155's
    * hop-plot and x158's harmonic scores. */
  private def panelCtes: String = {
    val rounds = (1 to DiamHops).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT s, v, MIN(hop) AS hop FROM (
         |    SELECT s, v, hop FROM d${k - 1}
         |    UNION ALL
         |    SELECT d.s, p.dst AS v, $k AS hop
         |    FROM d${k - 1} d JOIN pairs p ON p.src = d.v
         |    WHERE d.hop = ${k - 1})
         |  GROUP BY s, v)""".stripMargin
    }.mkString(",\n")
    s"""li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |pairs AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |  GROUP BY 1, 2),
       |seeds AS MATERIALIZED (
       |  SELECT p FROM (SELECT DISTINCT src AS p FROM pairs)
       |  ORDER BY md5(CAST(p AS VARCHAR)), p LIMIT $DiamSeeds),
       |d0 AS MATERIALIZED (
       |  SELECT p AS s, p AS v, 0 AS hop FROM seeds),
       |$rounds""".stripMargin
  }

  /** Exact (seed, node, min-hop) labels for the [[DiamSeeds]]-seed panel
    * after [[DiamHops]] frontier rounds — the shared walk behind x155
    * (hop-plot) and x158 (harmonic scores). Returned frame is
    * localCheckpointed; intermediate generations and the edge cache are
    * released before returning (the x73 hygiene). */
  private def seedPanelDist(s: SparkSession, dir: String): DataFrame = {
    val pairs = coEdges(s, dir).localCheckpoint() // read once per round
    val seeds = pairs.select(col("src").as("p")).distinct()
      .orderBy(md5(col("p").cast("string")), col("p")).limit(DiamSeeds)
    var dist = seeds.select(col("p").as("s"), col("p").as("v"), lit(0).as("hop"))
      .localCheckpoint()
    for (k <- 1 to DiamHops) {
      val reached = dist.filter(col("hop") === k - 1)
        .join(pairs, col("v") === col("src"))
        .select(col("s"), col("dst").as("v"), lit(k).as("hop"))
      val prev = dist
      dist = dist.unionAll(reached)
        .groupBy(col("s"), col("v")).agg(min(col("hop")).as("hop"))
        .localCheckpoint() // each round's labels feed the next frontier
      prev.unpersist() // superseded generation — the x73 hygiene
    }
    pairs.unpersist() // final dist is materialized; edges no longer needed
    dist
  }

  private def diameterOracle: String = {
    s"""WITH $panelCtes,
       |hist AS MATERIALIZED (
       |  SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_pairs
       |  FROM d$DiamHops GROUP BY 1),
       |cum AS MATERIALIZED (
       |  SELECT hop, n_pairs,
       |    CAST(SUM(n_pairs) OVER (ORDER BY hop) AS BIGINT) AS cum_pairs,
       |    CAST(SUM(n_pairs) OVER () AS BIGINT) AS total
       |  FROM hist),
       |d90 AS (
       |  SELECT CAST(MIN(hop) AS BIGINT) AS eff_diameter
       |  FROM cum WHERE cum_pairs * 10 >= total * 9)
       |SELECT CAST(cum.hop AS BIGINT) AS hop, cum.n_pairs, cum.cum_pairs,
       |  CAST(cum.cum_pairs AS DOUBLE) / CAST(cum.total AS DOUBLE) AS cum_frac,
       |  d90.eff_diameter
       |FROM cum, d90 ORDER BY hop""".stripMargin
  }

  /** x155: sampled hop-plot + effective diameter — "how many hops until
    * 90% of reachable pairs are covered" (Palmer et al.'s ANF question,
    * answered here with an EXACT per-seed BFS over a FIXED
    * [[DiamSeeds]]-seed panel instead of probabilistic counters, so the
    * DuckDB oracle replays it bit-for-bit). Seeds are the
    * [[DiamSeeds]] lowest (md5, id) nodes — the x12/x60b deterministic
    * sampling pattern; the d90 threshold compares exact integers
    * (cum·10 ≥ total·9), never floats.
    *
    * Scale: per round one frontier⋈edges equi-join keyed on the node —
    * the x63 regime with a (seed, node) composite label; the pair table
    * is K·|V| with K FIXED, so the whole walk is K× a single-source
    * BFS, shuffles on node keys, histogram axis bounded by
    * [[DiamHops]]. */
  val effectiveDiameter = Q.withOracle(
    "x155_effective_diameter",
    s"x155: $DiamSeeds-seed exact hop-plot + 90% effective diameter (≤ $DiamHops hops)",
    diameterOracle) { (s, dir) =>
    val dist = seedPanelDist(s, dir)
    val hist = dist.groupBy(col("hop")).agg(count(lit(1)).cast("long").as("n_pairs"))
    // ≤ DiamHops+1 rows: the bounded-axis windows the plan audit allows
    val wCum = Window.orderBy(col("hop"))
    val cum = hist
      .withColumn("cum_pairs", sum(col("n_pairs")).over(wCum).cast("long"))
      .withColumn("total", sum(col("n_pairs")).over(Window.partitionBy()).cast("long"))
    val d90 = cum.filter(col("cum_pairs") * 10 >= col("total") * 9)
      .agg(min(col("hop")).cast("long").as("eff_diameter"))
    cum.crossJoin(broadcast(d90))
      .select(col("hop").cast("long").as("hop"), col("n_pairs"), col("cum_pairs"),
        (col("cum_pairs").cast("double") / col("total").cast("double")).as("cum_frac"),
        col("eff_diameter"))
      .orderBy(col("hop"))
  }

  /** Per-hop harmonic weight, scaled by LCM(1..[[DiamHops]]) = 12 so
    * every 1/d term is an INTEGER (12/1=12, 12/2=6, 12/3=4, 12/4=3) —
    * the sum never touches floats, dodging the order-dependent
    * double-sum trap outright. */
  private val HarmonicLcm = 12L

  /** x158: harmonic centrality, panel-estimated (Boldi–Vigna's
    * centrality, Eppstein–Wang's pivot-sampling idea made EXACT over the
    * same FIXED [[DiamSeeds]]-seed panel x155 walks): for each node v,
    * score(v) = Σ over panel seeds s (d(s,v) ≥ 1) of 1/d(s,v). The sum
    * is computed in integers scaled by [[HarmonicLcm]] — with hops
    * capped at [[DiamHops]] = 4 every term 12/d is integral, so the
    * score is an exact long and the DuckDB oracle replays it
    * bit-for-bit (the double `harmonic` column is one final division).
    * Top-20 by (score desc, node asc), with the seeds-reaching count —
    * the "which nodes sit closest to everywhere" companion to x59's
    * PageRank (influence by random walk) and x73's HITS (by mutual
    * endorsement).
    *
    * Scale: rides [[seedPanelDist]] unchanged (K·|V| labels, K fixed);
    * the scoring stage is one hash agg keyed on the node plus a
    * constant-bound TakeOrdered(20). */
  val harmonicCentrality = Q.withOracle(
    "x158_harmonic_centrality",
    s"x158: $DiamSeeds-seed exact harmonic centrality top-20 (1/d summed via LCM scaling)",
    s"""WITH $panelCtes,
       |sc AS MATERIALIZED (
       |  SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS n_seeds,
       |    CAST(SUM($HarmonicLcm // hop) AS BIGINT) AS score_scaled
       |  FROM d$DiamHops WHERE hop >= 1 GROUP BY v)
       |SELECT node, n_seeds, score_scaled,
       |  CAST(score_scaled AS DOUBLE) / $HarmonicLcm.0 AS harmonic
       |FROM sc ORDER BY score_scaled DESC, node LIMIT 20""".stripMargin) { (s, dir) =>
    seedPanelDist(s, dir)
      .filter(col("hop") >= 1)
      .groupBy(col("v").as("node"))
      .agg(count(lit(1)).cast("long").as("n_seeds"),
        sum(expr(s"$HarmonicLcm div hop")).cast("long").as("score_scaled"))
      .select(col("node"), col("n_seeds"), col("score_scaled"),
        (col("score_scaled").cast("double") / lit(HarmonicLcm.toDouble))
          .as("harmonic"))
      .orderBy(col("score_scaled").desc, col("node"))
      .limit(20)
  }

  // ---- x70: label propagation communities ---------------------------

  /** LPA rounds — synchronous updates; fixed so the oracle CTE chain is
    * bounded and both engines replay the same (possibly un-converged)
    * state. */
  private val LpaRounds = 3
  /** Label pack base: labels stay < 2^31 (part keys ≤ 10^9 even under
    * the probe's 10^8 key stride), counts < 2^31 trivially — the packed
    * (2^31 − count)·2^31 + label long realizes argmax-count with
    * min-label ties as ONE min() so the per-round aggregation is a hash
    * aggregate with map-side partials (a struct max_by has an immutable
    * buffer and silently falls back to SortAggregate — the round-5 plan
    * defect this pack rule exists to avoid). */
  private val PackBase = 1L << 31

  /** The pairs + l0..l`n` CTE prefix shared by x70's fixed-round oracle
    * and x70b's converged-tier oracle. */
  private def lpaRoundsCtes(n: Int): String = {
    val rounds = (1 to n).map { k =>
      s"""l$k AS MATERIALIZED (
         |  SELECT v, label FROM (
         |    SELECT e.dst AS v, l.label,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |        ORDER BY COUNT(*) DESC, l.label) AS rn
         |    FROM pairs e JOIN l${k - 1} l ON l.v = e.src
         |    GROUP BY e.dst, l.label)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |pairs AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |  GROUP BY 1, 2),
       |l0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS v, src AS label FROM pairs),
       |$rounds""".stripMargin
  }

  private def lpaOracle: String =
    s"""WITH ${lpaRoundsCtes(LpaRounds)}
       |SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM l$LpaRounds GROUP BY label
       |ORDER BY n_nodes DESC, community LIMIT 100""".stripMargin

  /** x70: synchronous label propagation over the part co-occurrence
    * graph — each round every node adopts the most frequent label among
    * its neighbors (ties → smallest), realized as one keyed count
    * aggregation plus one packed-long min per round. Completes the
    * graph family: CC (x16) answers "connected?", LPA answers "which
    * DENSE region?" — communities are the curation unit for
    * domain-cluster analysis over co-occurrence graphs. */
  /** One synchronous LPA round: every node adopts the most frequent
    * neighbor label (ties → smallest), as one keyed count aggregation
    * plus one packed-long min (both hash aggregates with map-side
    * partials — see [[PackBase]]). Shared by the fixed-round registered
    * query and [[convergedLabelProp]]. */
  private def lpaRound(pairs: DataFrame, labels: DataFrame): DataFrame =
    pairs.join(labels, col("v") === col("src"))
      .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
      .groupBy(col("dst"))
      .agg(min((lit(PackBase) - col("c")) * lit(PackBase) + col("label")).as("p"))
      .select(col("dst").as("v"), pmod(col("p"), lit(PackBase)).as("label"))

  val labelProp = Q.withOracle(
    "x70_label_propagation",
    s"x70: $LpaRounds-round label propagation communities (top-100 by size)",
    lpaOracle) { (s, dir) =>
    val pairs = coEdges(s, dir).localCheckpoint() // read once per round
    var labels = pairs.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint()
    for (_ <- 1 to LpaRounds) {
      val prev = labels
      labels = lpaRound(pairs, labels)
        .localCheckpoint() // each round's labels feed the next join
      prev.unpersist() // superseded generation — the x73 block-manager hygiene
    }
    pairs.unpersist() // final labels are materialized; edges no longer needed
    labels.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n_nodes"))
      .select(col("label").as("community"), col("n_nodes"))
      .orderBy(col("n_nodes").desc, col("community")).limit(100)
  }

  /** x70's production form: iterate [[lpaRound]] until labels are
    * STABLE (no node changes) or `maxRounds`. The registered query pins
    * a fixed round count so its oracle is a bounded CTE chain; a real
    * pipeline runs to convergence — this is that form. Returns
    * (label table, rounds applied); `rounds == maxRounds` with an
    * unstable final state is possible (synchronous LPA can 2-cycle on
    * bipartite structure — the classic oscillation; the cap is the
    * documented defense, and disjoint-copy probes show rounds-to-
    * convergence is a property of the graph STRUCTURE, not its size).
    * Each round adds one (v-keyed) self-join + count to detect change —
    * the stability check costs one more bounded aggregation, nothing
    * corpus-shaped. Superseded label generations are unpersisted as the
    * iteration advances (the x73 block-manager hygiene). */
  def convergedLabelProp(s: SparkSession, dir: String,
      maxRounds: Int = 50): (DataFrame, Int) = {
    val pairs = coEdges(s, dir).localCheckpoint()
    var labels = pairs.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint()
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxRounds) {
      val next = lpaRound(pairs, labels).localCheckpoint()
      changed = next.as("n").join(labels.as("o"), col("n.v") === col("o.v"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels.unpersist()
      labels = next
      rounds += 1
    }
    pairs.unpersist()
    (labels, rounds)
  }

  /** Round cap for the REGISTERED converged-tier query — the oracle
    * unrolls exactly this many CTE rounds, so it must stay small; the
    * ConvergeProbe measured stability at round 7 on this graph family
    * (rounds-to-convergence is a structure property, flat across
    * factors), so 10 carries headroom without an unbounded oracle. */
  private val LpaMaxRounds = 10

  /** x70b: [[convergedLabelProp]] as a REGISTERED query — the form a
    * production pipeline actually runs (iterate to stability), made
    * oracle-replayable by a bounded certificate: the round cap
    * [[LpaMaxRounds]]. Stability is ABSORBING for synchronous LPA
    * (equal label tables produce equal next rounds), so the oracle can
    * unroll exactly LpaMaxRounds rounds and read the histogram off the
    * LAST one — it equals the converged state whenever convergence
    * happened at any k ≤ cap, and equals the capped state otherwise;
    * either way both engines agree bit-for-bit. The
    * `rounds_to_converge` column is the certificate: the first round
    * whose label table equals its predecessor (the cap when none does),
    * replayed by the oracle as per-round change counts over the SAME
    * unrolled chain. GraphSpec pins fixed-round-equivalence-once-stable
    * and the 2-cycle oscillation cap that makes the capped branch
    * well-defined.
    *
    * Scale shape: x70's per-round shape (one keyed count agg + one
    * packed-long min over the checkpointed edge table) for as many
    * rounds as stability needs, plus one |V|-keyed label-compare join
    * per round for the change count — the certificate costs one bounded
    * aggregation per round, nothing corpus-shaped. */
  val lpaConverged = Q.withOracle(
    "x70b_lpa_converged",
    s"x70b: label propagation run to stability (cap $LpaMaxRounds) with rounds-to-converge certificate",
    {
      val changes = (1 to LpaMaxRounds).map { k =>
        s"""SELECT $k AS r, (SELECT COUNT(*) FROM l$k n
           |  JOIN l${k - 1} o ON n.v = o.v AND n.label <> o.label) AS changed"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${lpaRoundsCtes(LpaMaxRounds)},
         |ch AS MATERIALIZED (
         |$changes),
         |rc AS (
         |  SELECT CAST(COALESCE(MIN(r), $LpaMaxRounds) AS BIGINT) AS rounds
         |  FROM ch WHERE changed = 0)
         |SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  rc.rounds AS rounds_to_converge
         |FROM l$LpaMaxRounds CROSS JOIN rc
         |GROUP BY label, rc.rounds
         |ORDER BY n_nodes DESC, community LIMIT 100""".stripMargin
    }) { (s, dir) =>
    val (labels, rounds) = convergedLabelProp(s, dir, LpaMaxRounds)
    labels.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n_nodes"))
      .select(col("label").as("community"), col("n_nodes"),
        lit(rounds.toLong).as("rounds_to_converge"))
      .orderBy(col("n_nodes").desc, col("community")).limit(100)
  }

  /** x73's production form: peel until the edge set is a FIXPOINT (a
    * full round removes nothing — every surviving node has degree ≥ k
    * in the survivor-induced subgraph, the true k-core) rather than a
    * fixed round count. Monotone shrinkage guarantees termination;
    * `maxRounds` is a pure safety net. Returns (core node table,
    * rounds applied — including the final no-op round that PROVES the
    * fixpoint). */
  def kcoreFixpoint(s: SparkSession, dir: String, k: Int = CoreK,
      maxRounds: Int = 1000): (DataFrame, Int) = {
    // Node-centric like the registered x73 (edges checkpointed once,
    // N-row alive sets per round); the peel is MONOTONE (k_r ⊆
    // alive_{r-1} — a node outside the alive set has no induced edges
    // and can never re-enter), so an unchanged alive COUNT proves an
    // unchanged alive SET proves the fixpoint.
    val e = coEdges(s, dir).localCheckpoint()
    var alive: Option[DataFrame] = None
    var aliveN = -1L // unknown until round 1 counts the full node set
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxRounds) {
      val deg = induced(e, alive).groupBy(col("src")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val prevN = if (aliveN >= 0) aliveN else deg.count() // alive_0 = all nodes
      val keep = deg.filter(col("c") >= k).select(col("src").as("v"))
        .localCheckpoint()
      deg.unpersist()
      val keptN = keep.count()
      alive.foreach(_.unpersist())
      alive = Some(keep)
      stable = keptN == prevN
      aliveN = keptN
      rounds += 1
    }
    e.unpersist()
    (alive.get, rounds)
  }

  // ---- x73: k-core peeling ------------------------------------------

  /** Degree threshold for the core. */
  private val CoreK = 16
  /** Peeling rounds — fixed so the oracle chain is bounded; true k-core
    * iterates to a fixed point, and the per-round survivor counts this
    * emits show how fast the peel converges on this graph. */
  private val CoreRounds = 4

  /** The e0 + d/k/e round-chain CTE prefix shared by x73's fixed-round
    * oracle and x73b's converged-tier oracle. */
  private def kcoreRoundsCtes(n: Int): String = {
    val rounds = (1 to n).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT src, COUNT(*) AS c FROM e${r - 1} GROUP BY src),
         |k$r AS MATERIALIZED (SELECT src AS v FROM d$r WHERE c >= $CoreK),
         |e$r AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN k$r a ON e.src = a.v JOIN k$r b ON e.dst = b.v)""".stripMargin
    }.mkString(",\n")
    s"""li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |  GROUP BY 1, 2),
       |$rounds""".stripMargin
  }

  private def kcoreOracle: String = {
    val out = (1 to CoreRounds).map { r =>
      s"""SELECT $r AS round,
         |  CAST((SELECT COUNT(*) FROM k$r) AS BIGINT) AS n_nodes,
         |  CAST((SELECT COUNT(*) FROM e$r) AS BIGINT) AS n_edges""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${kcoreRoundsCtes(CoreRounds)}
       |SELECT * FROM ($out) ORDER BY round""".stripMargin
  }

  /** The alive-restricted edge set: `e` when no peel has happened yet,
    * otherwise edges with BOTH endpoints in the (small, AQE-broadcast)
    * alive-node table. Lazy — the edge table is never rewritten. */
  private def induced(e: DataFrame, alive: Option[DataFrame]): DataFrame =
    alive match {
      case None => e
      case Some(a) =>
        e.join(a, col("src") === col("v")).drop("v")
          .join(a, col("dst") === col("v")).drop("v")
    }

  /** x73: k-core peeling — [[CoreRounds]] rounds of degree-filter +
    * induced-subgraph restriction toward the [[CoreK]]-core, emitting
    * per-round survivor counts. The dense-subgraph extraction primitive
    * (peel the crawl graph's periphery before expensive per-node work).
    *
    * NODE-CENTRIC (round 11): the edge table is checkpointed ONCE and
    * each round restricts it LAZILY through the current alive-node set;
    * the only per-round materializations are the N-row degree and node
    * tables. The round-10 form instead rewrote and localCheckpointed
    * the (shrinking) EDGE table every round — at the 10×/20× probe
    * factors those O(E)-row generations overflowed the storage pool
    * and spilled inside the timed run, the one superlinear curve left
    * on the graph board (84s/194s at 10×/20× vs x70's exactly-linear
    * 37s/73s). Per round: two node-keyed semi-joins against a
    * broadcastable alive set + ONE shuffle (the degree aggregation);
    * |e_{r-1}| falls out of round r's degree sums, so only the final
    * round pays one extra restriction pass for its edge count. At 100
    * TB the edge table is the big READ-ONLY side and the alive set is
    * the node-table fraction a cluster broadcasts — exactly the
    * asymmetry this shape preserves. */
  val kcore = Q.withOracle(
    "x73_kcore_peel",
    s"x73: $CoreRounds-round peel toward the $CoreK-core (per-round survivor counts)",
    kcoreOracle) { (s, dir) =>
    val e = coEdges(s, dir).localCheckpoint()
    var alive: Option[DataFrame] = None
    // iteration r yields (r, |k_r|, |e_{r-1}|): the degree table OVER
    // e_{r-1} is both the round-r filter input and, summed, the
    // previous round's edge count
    val stats = (1 to CoreRounds).map { r =>
      val deg = induced(e, alive).groupBy(col("src")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // N rows: read by the sum, the filter, and the count
      val prevEdges = deg.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
      val keep = deg.filter(col("c") >= CoreK).select(col("src").as("v"))
        .localCheckpoint() // N rows: next round's broadcast side
      deg.unpersist()
      val nn = keep.count()
      alive.foreach(_.unpersist())
      alive = Some(keep)
      (r, nn, prevEdges)
    }
    val lastEdges = induced(e, alive).count() // |e_CoreRounds|
    alive.foreach(_.unpersist())
    e.unpersist()
    val perRound = stats.zip(stats.drop(1).map(_._3) :+ lastEdges)
      .map { case ((r, nn, _), ne) => (r, nn, ne) }
    s.createDataFrame(perRound).toDF("round", "n_nodes", "n_edges")
      .orderBy(col("round"))
  }

  /** Round cap for the REGISTERED converged k-core (x73b) — the oracle
    * unrolls exactly this many peel rounds. The x73 per-round survivor
    * counts show the peel within a round or two of its fixpoint at
    * round 4 on this graph; 6 carries headroom with a bounded oracle. */
  private val KcoreMaxRounds = 6

  /** x73b: [[kcoreFixpoint]] as a REGISTERED query — the x70b
    * certificate pattern applied to the peel: iterate until a full
    * round removes nothing (the TRUE k-core, every survivor with
    * induced degree ≥ k) under the bounded cap [[KcoreMaxRounds]].
    * The fixpoint is ABSORBING (an unchanged alive set induces the
    * same degrees, so every later round is a no-op) and the peel is
    * MONOTONE, so the oracle unrolls exactly the cap and reads the
    * core's node/edge counts off the LAST round — equal to the
    * fixpoint whenever it arrived at any r ≤ cap, equal to the capped
    * state otherwise; both engines agree either way. The certificate
    * `rounds_to_fixpoint` = the first round whose survivor count
    * equals its predecessor's (including that no-op round, as
    * [[kcoreFixpoint]] counts it), replayed by the oracle over the
    * same chain.
    *
    * Scale shape: x73's node-centric rounds (checkpointed edge table,
    * lazily induced through the alive set; one degree shuffle per
    * round) for as many rounds as the fixpoint needs, plus one final
    * restriction pass for the edge count — output is ONE row. */
  val kcoreConverged = Q.withOracle(
    "x73b_kcore_converged",
    s"x73b: $CoreK-core peeled to the fixpoint (cap $KcoreMaxRounds) with rounds certificate",
    {
      val stable = (1 to KcoreMaxRounds).map { r =>
        val prev = if (r == 1) "(SELECT COUNT(DISTINCT src) FROM e0)"
                   else s"(SELECT COUNT(*) FROM k${r - 1})"
        s"SELECT $r AS r, (SELECT COUNT(*) FROM k$r) = $prev AS stable"
      }.mkString("\nUNION ALL\n")
      s"""WITH ${kcoreRoundsCtes(KcoreMaxRounds)},
         |st AS MATERIALIZED (
         |$stable),
         |rc AS (
         |  SELECT CAST(COALESCE(MIN(r), $KcoreMaxRounds) AS BIGINT) AS rounds
         |  FROM st WHERE stable)
         |SELECT CAST($CoreK AS BIGINT) AS core_k,
         |  CAST((SELECT COUNT(*) FROM k$KcoreMaxRounds) AS BIGINT)
         |    AS n_core_nodes,
         |  CAST((SELECT COUNT(*) FROM e$KcoreMaxRounds) AS BIGINT)
         |    AS n_core_edges,
         |  rc.rounds AS rounds_to_fixpoint
         |FROM rc""".stripMargin
    }) { (s, dir) =>
    val (core, rounds) = kcoreFixpoint(s, dir, CoreK, KcoreMaxRounds)
    val nNodes = core.count()
    val nEdges = induced(coEdges(s, dir), Some(core)).count()
    core.unpersist()
    s.createDataFrame(Seq((CoreK.toLong, nNodes, nEdges, rounds.toLong)))
      .toDF("core_k", "n_core_nodes", "n_core_edges", "rounds_to_fixpoint")
  }

  // ---- x81: weighted single-source shortest paths -------------------

  /** Bellman-Ford relaxation rounds — dist after round k is the exact
    * min-cost path using ≤ k edges (well-defined even before
    * convergence), so the bounded oracle CTE chain replays it. */
  private val SsspRounds = 3

  private def ssspOracle: String = {
    val rounds = (1 to SsspRounds).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT v, MIN(d) AS d FROM (
         |    SELECT v, d FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS v, r.d + e.w AS d
         |    FROM d${k - 1} r JOIN wedges e ON e.src = r.v)
         |  GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |wedges AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst,
       |    (1000 // COUNT(*)) + 1 AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |  GROUP BY 1, 2),
       |d0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS v, CAST(0 AS BIGINT) AS d
       |  FROM wedges WHERE src % $SeedMod = 0),
       |$rounds
       |SELECT v AS part, CAST(d AS BIGINT) AS dist
       |FROM d$SsspRounds ORDER BY dist, part LIMIT 100""".stripMargin
  }

  /** x81: multi-source weighted shortest paths (Bellman-Ford) over the
    * co-occurrence graph — [[SsspRounds]] relaxation rounds from the
    * x63 seed set, edge cost inverse to co-occurrence strength. Each
    * round joins ONLY the improved frontier against the edge table
    * (nodes whose distance didn't change contribute nothing new — their
    * relaxations were min'd in last round), then one min-aggregation;
    * the full distance table is never re-relaxed. Completes the graph
    * family's reachability axis: x63 answers "how many hops?", x81
    * answers "how cheap?" — hop counts weight every edge equally where
    * path cost discounts strong associations.
    *
    * Scale: edges checkpointed once; per round one frontier-keyed
    * equi-join + one hash min-agg (map-side partials, long buffers);
    * frontier shrinks monotonically toward convergence. Costs are ≤
    * 1001·rounds — no overflow headroom concern. */
  val sssp = Q.withOracle(
    "x81_sssp_weighted",
    s"x81: $SsspRounds-round Bellman-Ford multi-source shortest paths (cost = 1000 div cooc + 1)",
    ssspOracle) { (s, dir) =>
    val li = orderParts(s, dir)
    val wedges = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("cooc"))
      .select(col("src"), col("dst"), (expr("1000 div cooc") + 1L).as("w"))
      .localCheckpoint() // read once per round
    var dist = wedges.select(col("src").as("v")).distinct()
      .filter(col("v") % SeedMod === 0)
      .select(col("v"), lit(0L).as("d"))
      .localCheckpoint()
    var frontier = dist // round 0: every seed is "improved"
    for (_ <- 1 to SsspRounds) {
      val relaxed = frontier
        .join(wedges, col("v") === col("src"))
        .select(col("dst").as("v"), (col("d") + col("w")).as("d"))
      val prevDist = dist
      val prevFrontier = frontier
      dist = dist.unionAll(relaxed)
        .groupBy(col("v")).agg(min(col("d")).as("d"))
        .localCheckpoint()
      // improved = strictly better than (or absent from) the previous
      // round — the only nodes whose outgoing relaxations can still
      // lower anything next round. Checkpointed eagerly BEFORE the
      // superseded generations are dropped (it reads prevDist).
      frontier = dist.as("n")
        .join(prevDist.as("o"), col("n.v") === col("o.v"), "left")
        .filter(col("o.d").isNull || col("n.d") < col("o.d"))
        .select(col("n.v").as("v"), col("n.d").as("d"))
        .localCheckpoint()
      // superseded generations — x73 block-manager hygiene (frontier
      // round 0 aliases dist's checkpoint; don't double-unpersist)
      if (prevFrontier ne prevDist) prevFrontier.unpersist()
      prevDist.unpersist()
    }
    frontier.unpersist() // the loop's last frontier is not read again
    wedges.unpersist() // final dist is materialized; edges no longer needed
    dist.select(col("v").as("part"), col("d").cast("long").as("dist"))
      .orderBy(col("dist"), col("part")).limit(100)
  }

  /** Minimum degree for the x99 report: below this the coefficient is
    * noise (d=2 is always 0 or 1) and the top-k would fill with
    * degenerate ties. */
  private val CcMinDeg = 5

  private def clusteringOracle: String =
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p < b.p
       |  GROUP BY 1, 2),
       |deg AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS d
       |  FROM (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e)
       |  GROUP BY 1),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN ku.d * 4294967296 + e.u < kv.d * 4294967296 + e.v
       |              THEN e.u ELSE e.v END AS src,
       |         CASE WHEN ku.d * 4294967296 + e.u < kv.d * 4294967296 + e.v
       |              THEN e.v ELSE e.u END AS dst,
       |         GREATEST(ku.d * 4294967296 + e.u, kv.d * 4294967296 + e.v) AS kdst
       |  FROM e JOIN deg ku ON ku.p = e.u JOIN deg kv ON kv.p = e.v),
       |t AS MATERIALIZED (
       |  SELECT a.src AS s, a.dst AS wu, b.dst AS wv
       |  FROM o a JOIN o b ON a.src = b.src AND a.kdst < b.kdst
       |  JOIN o c ON c.src = a.dst AND c.dst = b.dst),
       |pt AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS tri FROM (
       |    SELECT s AS p FROM t
       |    UNION ALL SELECT wu AS p FROM t
       |    UNION ALL SELECT wv AS p FROM t)
       |  GROUP BY 1)
       |SELECT deg.p AS part, deg.d AS degree,
       |  COALESCE(pt.tri, 0) AS n_tri,
       |  CAST(2 * COALESCE(pt.tri, 0) AS DOUBLE)
       |    / (CAST(deg.d AS DOUBLE) * (deg.d - 1)) AS clustering
       |FROM deg LEFT JOIN pt ON pt.p = deg.p
       |WHERE deg.d >= $CcMinDeg
       |ORDER BY clustering DESC, part LIMIT 20""".stripMargin

  /** x99: per-node local clustering coefficient — "how clique-like is
    * each part's co-occurrence neighbourhood": c(v) = 2·tri(v) /
    * (d(v)·(d(v)−1)), the community-structure statistic next to x60's
    * single global count. Per-node triangle credits fall out of the SAME
    * degree-oriented closure join x60 runs — each found triangle
    * (src, wu, wv) explodes into three node credits, one extra
    * node-keyed hash agg on the (bounded, √m-fan-out) triangle stream.
    * Degrees ≥ $CcMinDeg only: the coefficient is exact rational
    * integers cast once to double, so ordering and values replay
    * bit-identically.
    *
    * Scale: identical regime to x60 (the wedge join dominates; probe
    * x60's row) + one explode×3 of the triangle output and a node-keyed
    * agg — both bounded by the triangle count, far below wedge volume. */
  /** Per-node triangle credits of an oriented edge table: each closed
    * wedge (s, wu, wv) found by the x60 closure join explodes into three
    * node credits, one node-keyed hash agg on the (triangle-bounded)
    * stream — shared by x99 (exact) and x99b (DOULION-sampled). */
  private def perNodeTriangles(o: DataFrame): DataFrame = {
    val wedges = o.as("a").join(o.as("b"),
        col("a.src") === col("b.src") && col("a.kdst") < col("b.kdst"))
      .select(col("a.src").as("s"), col("a.dst").as("wu"), col("b.dst").as("wv"))
    val tris = wedges.join(o.as("c"),
        col("wu") === col("c.src") && col("wv") === col("c.dst"))
      .select(col("s"), col("wu"), col("wv"))
    tris.select(explode(array(col("s"), col("wu"), col("wv"))).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("tri"))
  }

  val clusteringCoeff = Q.withOracle(
    "x99_clustering_coeff",
    s"x99: top-20 local clustering coefficients (degree >= $CcMinDeg) on the part graph",
    clusteringOracle) { (s, dir) =>
    val e = undirected(s, dir)
    val o = orientEdgeSet(e)
      .localCheckpoint() // degrees, both wedge sides, and the closure probe
    e.unpersist() // o is materialized; keep ONE edge generation
    val deg = o.select(explode(array(col("src"), col("dst"))).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("d"))
    val perNode = perNodeTriangles(o)
    deg.join(perNode, Seq("p"), "left")
      .filter(col("d") >= CcMinDeg)
      .select(col("p").as("part"), col("d").cast("long").as("degree"),
        coalesce(col("tri"), lit(0L)).cast("long").as("n_tri"),
        ((coalesce(col("tri"), lit(0L)) * 2).cast("double")
          / (col("d").cast("double") * (col("d") - 1))).as("clustering"))
      .orderBy(col("clustering").desc, col("part")).limit(20)
  }

  // ---- x99b: DOULION-sampled local clustering coefficient -----------

  private def clusteringDoulionOracle: String =
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p < b.p
       |  GROUP BY 1, 2),
       |deg AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS d
       |  FROM (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e)
       |  GROUP BY 1),
       |es AS MATERIALIZED (
       |  SELECT u, v FROM e
       |  WHERE substr(md5(CAST(u AS VARCHAR) || '_' || CAST(v AS VARCHAR)), 1, 1)
       |    IN (${TriSampleNibbles.map(n => s"'$n'").mkString(", ")})),
       |degs AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS d
       |  FROM (SELECT u AS p FROM es UNION ALL SELECT v AS p FROM es)
       |  GROUP BY 1),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN ku.d * 4294967296 + es.u < kv.d * 4294967296 + es.v
       |              THEN es.u ELSE es.v END AS src,
       |         CASE WHEN ku.d * 4294967296 + es.u < kv.d * 4294967296 + es.v
       |              THEN es.v ELSE es.u END AS dst,
       |         GREATEST(ku.d * 4294967296 + es.u, kv.d * 4294967296 + es.v) AS kdst
       |  FROM es JOIN degs ku ON ku.p = es.u JOIN degs kv ON kv.p = es.v),
       |t AS MATERIALIZED (
       |  SELECT a.src AS s, a.dst AS wu, b.dst AS wv
       |  FROM o a JOIN o b ON a.src = b.src AND a.kdst < b.kdst
       |  JOIN o c ON c.src = a.dst AND c.dst = b.dst),
       |pt AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS st FROM (
       |    SELECT s AS p FROM t
       |    UNION ALL SELECT wu AS p FROM t
       |    UNION ALL SELECT wv AS p FROM t)
       |  GROUP BY 1)
       |SELECT deg.p AS part, deg.d AS degree,
       |  CAST(COALESCE(pt.st, 0) * $TriSampleInvP3 AS BIGINT) AS est_tri,
       |  CAST(2 * COALESCE(pt.st, 0) * $TriSampleInvP3 AS DOUBLE)
       |    / (CAST(deg.d AS DOUBLE) * (deg.d - 1)) AS est_clustering
       |FROM deg LEFT JOIN pt ON pt.p = deg.p
       |WHERE deg.d >= $CcMinDeg
       |ORDER BY degree DESC, part LIMIT 20""".stripMargin

  /** x99b: DOULION-sampled local clustering coefficient — x99's scale
    * tier, closing the one probe row whose EXACT form is inherently
    * wedge-bound (x99 measured 203 s at 20×, per-unit-work 1.5: the
    * wedge wall). Transplants x60b's sparsifier to the per-node form:
    * keep each edge iff md5("u_v") starts 0–3 (DETERMINISTIC, p = 1/4 —
    * the same edges survive on every engine, so the DuckDB oracle
    * replays the estimate exactly), run the degree-oriented closure join
    * on the survivors (~p² of x99's wedge rows), and scale each node's
    * sampled triangle count by 1/p³ = $TriSampleInvP3. Degrees in the
    * denominator are TRUE degrees from the full edge set — only the
    * triangle numerator is estimated.
    *
    * Reported for the top-20 nodes BY DEGREE (not by estimated
    * coefficient): per-node relative error ~ √((1/p³−1)/tri(v)) shrinks
    * with triangle count, so the estimate is meaningful exactly where
    * degrees are large — and a by-estimate ranking would surface
    * low-degree noise quantized to multiples of 1/p³. GraphSpec pins
    * the estimates against x99's exact machinery at sf0.1. */
  val clusteringApprox = Q.withOracle(
    "x99b_clustering_doulion",
    s"x99b: DOULION p=1/4 sampled clustering coefficients, top-20 by degree",
    clusteringDoulionOracle) { (s, dir) =>
    val e = undirected(s, dir)
    // true degrees from the FULL edge set (the estimator denominator)
    val deg = e.select(explode(array(col("u"), col("v"))).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("d"))
    val keep = substring(
      md5(concat(col("u").cast("string"), lit("_"), col("v").cast("string"))),
      1, 1).isin(TriSampleNibbles: _*)
    val o = orientEdgeSet(e.filter(keep))
      .localCheckpoint() // both wedge sides + the closure probe
    // NO unpersist of e: the result is lazy and deg still reads it;
    // the callers' sweep/ContextCleaner reclaims after materialization.
    val perNode = perNodeTriangles(o) // sampled-graph credits
    deg.join(perNode, Seq("p"), "left")
      .filter(col("d") >= CcMinDeg)
      .select(col("p").as("part"), col("d").cast("long").as("degree"),
        (coalesce(col("tri"), lit(0L)) * lit(TriSampleInvP3)).cast("long").as("est_tri"),
        ((coalesce(col("tri"), lit(0L)) * 2 * lit(TriSampleInvP3)).cast("double")
          / (col("d").cast("double") * (col("d") - 1))).as("est_clustering"))
      .orderBy(col("degree").desc, col("part")).limit(20)
  }

  private def assortativityOracle: String =
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p < b.p
       |  GROUP BY 1, 2),
       |deg AS MATERIALIZED (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS d
       |  FROM (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e)
       |  GROUP BY 1),
       |dd AS MATERIALIZED (
       |  SELECT du.d AS x, dv.d AS y FROM e
       |  JOIN deg du ON du.p = e.u JOIN deg dv ON dv.p = e.v
       |  UNION ALL
       |  SELECT dv.d AS x, du.d AS y FROM e
       |  JOIN deg du ON du.p = e.u JOIN deg dv ON dv.p = e.v),
       |a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
       |    CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
       |      AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
       |      AS DOUBLE) AS sxy
       |  FROM dd)
       |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
       |  CASE WHEN m2 * sxx - sx * sx <> 0.0 THEN
       |    (m2 * sxy - sx * sx) / (m2 * sxx - sx * sx)
       |  END AS assortativity
       |FROM a""".stripMargin

  /** x102: degree assortativity of the part co-occurrence graph — Newman
    * (2002)'s "do hubs link to hubs?" coefficient: the Pearson
    * correlation of (deg u, deg v) over the DIRECTED edge multiset (each
    * undirected edge counted both ways, so Σx = Σy and Σx² = Σy² and the
    * formula collapses to one x-moment set):
    *
    *   r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)
    *
    * Exact decimal(18,0) moment sums cast once to double, then one
    * identical scalar expression — the x78 discipline; no sqrt needed in
    * the symmetric form, so even that bet is off the table. Negative r
    * (hubs avoid hubs) is the expected shape for co-occurrence graphs.
    *
    * Scale (round 12 — the 20×-probe spill fix): the directed-multiset
    * x-moments never need the edge join at all. Node u is the x-end of
    * exactly d(u) directed edges, so Σx = Σ_v d(v)², Σx² = Σ_v d(v)³,
    * and M = Σ_v d(v) — three exact sums over the NODE table. Only the
    * cross-moment needs edges: Σxy = 2·Σ_{(u,v)∈E} d(u)·d(v), one
    * degree-joined pass over the UNDIRECTED edge set (half the previous
    * join output, and the 2E-row union feeding the keyless 4-sum agg —
    * the r11 spill onset — is gone entirely). Same exact integers, same
    * doubles, same oracle. */
  val assortativity = Q.withOracle(
    "x102_assortativity",
    "x102: Newman degree-assortativity coefficient of the part graph",
    assortativityOracle) { (s, dir) =>
    val e = undirected(s, dir)
    val deg = e.select(col("u").as("p")).unionAll(e.select(col("v").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("d"))
    // d ≤ |V| < 10^13 keeps d³ exact well inside decimal(38,0)
    val dDec = col("d").cast("decimal(13,0)")
    val nodeMoments = deg.agg(
      sum(col("d")).cast("long").as("m2"),
      sum(dDec * dDec).cast("double").as("sx"),
      sum(dDec * dDec * dDec).cast("double").as("sxx"))
    val du = deg.select(col("p").as("u"), col("d").as("xdu"))
    val dv = deg.select(col("p").as("v"), col("d").as("xdv"))
    val crossMoment = e.join(du, "u").join(dv, "v")
      .agg((sum(col("xdu").cast("decimal(13,0)") * col("xdv").cast("decimal(13,0)"))
        * 2).cast("double").as("sxy"))
    // NO unpersist here: the result is returned lazily, and dropping a
    // lineage-truncated localCheckpoint before execution is unrecoverable
    // — e is the single edge generation this query ever holds, and the
    // callers' sweep/ContextCleaner reclaims it after materialization.
    val a = nodeMoments.crossJoin(crossMoment) // two 1-row scalars
    a.select(expr("m2 div 2").cast("long").as("n_edges"),
      when(col("m2") * col("sxx") - col("sx") * col("sx") =!= 0.0,
        (col("m2") * col("sxy") - col("sx") * col("sx"))
          / (col("m2") * col("sxx") - col("sx") * col("sx")))
        .as("assortativity"))
  }

  // ---- x110: link prediction (resource-allocation commons) ----------

  /** Hot-center cap for x110 candidate generation: wedges are counted
    * only THROUGH nodes of degree ≤ this. Two reasons, one semantic and
    * one computational, and they point the same way: a shared hub says
    * almost nothing about a missing link (everyone co-occurs with the
    * hub — the same insight Adamic–Adar/RA formalize by down-weighting
    * 1/deg), and wedge volume is Σ d(z)² which hubs dominate. The cap
    * bounds per-center work at C($LpMaxCenterDeg, 2) pairs, so total
    * candidate volume is linear in qualifying centers at ANY corpus
    * size. At sf0.1 it keeps 3.4k of 20k centers (~12M wedges). */
  private val LpMaxCenterDeg = 96

  /** Fixed-point scale for the RA weight: floor(2^20 / d) per center —
    * exact integer division in both engines, sums order-independent. */
  private val LpRaScale = 1048576L

  /** Minimum shared-neighbor count for a reported candidate pair. */
  private val LpMinCn = 2

  private def linkPredictOracle: String =
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p < b.p
       |  GROUP BY 1, 2),
       |adj AS MATERIALIZED (
       |  SELECT u AS z, v AS n FROM e UNION ALL SELECT v AS z, u AS n FROM e),
       |deg AS MATERIALIZED (
       |  SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
       |ctr AS MATERIALIZED (
       |  SELECT adj.z, adj.n, deg.d FROM adj
       |  JOIN deg ON deg.z = adj.z WHERE deg.d <= $LpMaxCenterDeg),
       |w AS (
       |  SELECT a.n AS u, b.n AS v,
       |    CAST(COUNT(*) AS BIGINT) AS cn,
       |    CAST(SUM($LpRaScale // a.d) AS BIGINT) AS ra_scaled
       |  FROM ctr a JOIN ctr b ON a.z = b.z AND a.n < b.n
       |  GROUP BY 1, 2)
       |SELECT w.u AS part_u, w.v AS part_v,
       |  w.cn AS common_neighbors, w.ra_scaled,
       |  CAST(w.ra_scaled AS DOUBLE) / $LpRaScale AS ra
       |FROM w LEFT JOIN e ON e.u = w.u AND e.v = w.v
       |WHERE e.u IS NULL AND w.cn >= $LpMinCn
       |ORDER BY ra_scaled DESC, common_neighbors DESC, part_u, part_v
       |LIMIT 20""".stripMargin

  /** x110: link prediction on the part co-occurrence graph — the top
    * NON-adjacent part pairs ranked by resource-allocation score over
    * shared low-degree neighbours (Zhou–Lü–Zhang's RA index, the
    * integer-exact member of the Adamic–Adar family):
    *
    *   RA(u,v) = Σ_{z ∈ N(u)∩N(v), d(z) ≤ $LpMaxCenterDeg} 1/d(z)
    *
    * carried as floor(2^20/d(z)) fixed-point longs, so the sum is exact,
    * order-independent, and the reported double is an exact dyadic
    * division — bit-identical across engines with NO libm (the log-free
    * choice over Adamic–Adar, x101's discipline). This is the
    * "substitute/complement part" recommendation query.
    *
    * Scale shape: candidate pairs come ONLY from wedges through
    * ≤$LpMaxCenterDeg-degree centers (see LpMaxCenterDeg — bounded
    * per-center fan-out, the same blocked-candidates posture as x2's
    * LSH bands: never all-pairs), then one (u,v) hash agg, one
    * broadcast-proof anti-join against the edge set on its natural key,
    * and a bounded top-20. Every join is equi-keyed; the wedge
    * self-join reuses one checkpointed filtered-adjacency table. */
  val linkPredict = Q.withOracle(
    "x110_link_predict",
    s"x110: top-20 non-adjacent part pairs by resource-allocation score (centers deg <= $LpMaxCenterDeg)",
    linkPredictOracle) { (s, dir) =>
    val e = undirected(s, dir)
    val adj = e.select(col("u").as("z"), col("v").as("n"))
      .unionAll(e.select(col("v").as("z"), col("u").as("n")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("d"))
    val ctr = adj.join(deg, "z").filter(col("d") <= LpMaxCenterDeg)
      .localCheckpoint() // both sides of the wedge self-join
    val w = ctr.as("a").join(ctr.as("b"),
        col("a.z") === col("b.z") && col("a.n") < col("b.n"))
      .groupBy(col("a.n").as("u"), col("b.n").as("v"))
      .agg(count(lit(1)).cast("long").as("cn"),
        sum(expr(s"${LpRaScale}L div a.d")).cast("long").as("ra_scaled"))
    w.filter(col("cn") >= LpMinCn)
      .join(e, Seq("u", "v"), "left_anti")
      .select(col("u").as("part_u"), col("v").as("part_v"),
        col("cn").as("common_neighbors"), col("ra_scaled"),
        (col("ra_scaled").cast("double") / LpRaScale).as("ra"))
      .orderBy(col("ra_scaled").desc, col("common_neighbors").desc,
        col("part_u"), col("part_v"))
      .limit(20)
  }

  /** HITS rounds — two full (authority, hub) alternations rank parts by
    * 2-step co-purchase reach. Un-normalized integer power iteration:
    * after round k, scores are bounded by (Δs·Δp)^k for max supplier/
    * part degrees Δ, so k=2 needs Δs·Δp < 2^31.5 ≈ 3e9 — generous for
    * any real catalog. More rounds (or hub-heavier graphs): carry the
    * sums in decimal(38,0) — HITS is PURE sums (no constant products),
    * so the DuckDB wide-decimal multiplication ban never applies. */
  private val HitsRounds = 2
  private val HitsTopK = 25

  private def hitsOracle: String = {
    val rounds = (1 to HitsRounds).map { k =>
      s"""a$k AS MATERIALIZED (
         |  SELECT p, CAST(SUM(h) AS BIGINT) AS a
         |  FROM e JOIN h${k - 1} USING (s) GROUP BY p),
         |h$k AS MATERIALIZED (
         |  SELECT s, CAST(SUM(a) AS BIGINT) AS h
         |  FROM e JOIN a$k USING (p) GROUP BY s)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |h0 AS MATERIALIZED (
       |  SELECT DISTINCT s, CAST(1 AS BIGINT) AS h FROM e),
       |$rounds,
       |ta AS (SELECT 'authority' AS kind, p AS id, a AS score
       |  FROM a$HitsRounds ORDER BY a DESC, p LIMIT $HitsTopK),
       |th AS (SELECT 'hub' AS kind, s AS id, h AS score
       |  FROM h$HitsRounds ORDER BY h DESC, s LIMIT $HitsTopK)
       |SELECT kind, id, score FROM (
       |  SELECT * FROM ta UNION ALL SELECT * FROM th)
       |ORDER BY kind, score DESC, id""".stripMargin
  }

  /** x118: HITS hubs & authorities (Kleinberg) over the supplier→part
    * purchase bipartite graph — "which parts does the whole supplier
    * base converge on, and which suppliers span the influential parts?"
    * The bipartite form needs no adjacency transpose: authorities are
    * one part-keyed aggregation of hub scores over the edge list, hubs
    * one supplier-keyed aggregation back, alternating — per round
    * exactly two keyed shuffles over a ONCE-checkpointed edge table
    * (the x59 Pregel posture). Integer scores make the DuckDB replay
    * bit-exact; output is the deterministic top-$HitsTopK per side. */
  val hits = Q.withOracle(
    "x118_hits",
    s"x118: $HitsRounds-round integer HITS hubs/authorities on the supplier-part graph",
    hitsOracle) { (s, dir) =>
    val e = Tables.lineitem(s, dir)
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint() // read 2·rounds times: once per half-round
    var h = e.select(col("s")).distinct().withColumn("h", lit(1L))
    var a: DataFrame = e.sparkSession.emptyDataFrame
    for (_ <- 1 to HitsRounds) {
      a = e.join(h, "s").groupBy(col("p")).agg(sum(col("h")).as("a"))
      h = e.join(a, "p").groupBy(col("s")).agg(sum(col("a")).as("h"))
    }
    val top = a.select(lit("authority").as("kind"), col("p").as("id"), col("a").as("score"))
      .orderBy(col("score").desc, col("id")).limit(HitsTopK)
      .unionByName(
        h.select(lit("hub").as("kind"), col("s").as("id"), col("h").as("score"))
          .orderBy(col("score").desc, col("id")).limit(HitsTopK))
      .orderBy(col("kind"), col("score").desc, col("id"))
      // materialize the ≤2·TopK-row result, then release the E-row edge
      // checkpoint (the cross-invocation leak discipline)
      .localCheckpoint()
    e.unpersist()
    top
  }

  // ---- x148: personalized PageRank from a seed set -------------------

  /** Seed predicate for x148 (portable md5 bucket — 1/16 of parts). */
  private val SeedSql = "substr(md5(CAST(%s AS VARCHAR)), 1, 1) = '0'"

  private def pprOracle: String = {
    val rounds = (1 to Rounds).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT d.src AS v,
         |    (CASE WHEN ${SeedSql.format("d.src")}
         |      THEN ${RScale * 15 / 100} ELSE 0 END)
         |      + ($DampNum * COALESCE(s.m, 0)) // 100 AS r
         |  FROM deg d LEFT JOIN (
         |    SELECT p.dst, SUM(r.r // g.d) AS m
         |    FROM pairs p JOIN r${k - 1} r ON p.src = r.v
         |    JOIN deg g ON g.src = p.src
         |    GROUP BY p.dst) s ON d.src = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |pairs AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |  GROUP BY 1, 2),
       |deg AS MATERIALIZED (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM pairs GROUP BY 1),
       |r0 AS MATERIALIZED (
       |  SELECT src AS v,
       |    CASE WHEN ${SeedSql.format("src")}
       |      THEN CAST($RScale AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r
       |  FROM deg),
       |$rounds
       |SELECT v AS part,
       |  CAST(CASE WHEN ${SeedSql.format("v")} THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_seed,
       |  CAST(r AS BIGINT) AS ppr
       |FROM r$Rounds WHERE r > 0 ORDER BY ppr DESC, part LIMIT 100""".stripMargin
  }

  /** x148: personalized PageRank — the seed-anchored relevance score
    * behind "more like these" expansion (recsys candidate generation,
    * related-entity discovery): PageRank's teleport mass lands ONLY on a
    * deterministic md5-bucket seed set (1/16 of parts), so rank measures
    * proximity to the seeds rather than global centrality. Same
    * fixed-point integer arithmetic, same per-round one-keyed-join +
    * one-agg shape, same headroom bound as x59; non-seed nodes start at
    * 0 and only earn mass through ≤[[Rounds]]-hop paths from a seed
    * (rows with r = 0 are pruned — unreached at this horizon). */
  val personalizedPagerank = Q.withOracle(
    "x148_personalized_pagerank",
    s"x148: $Rounds-round personalized PageRank from the md5-bucket seed set (top-100)",
    pprOracle) { (s, dir) =>
    val pairs = coEdges(s, dir).localCheckpoint()
    val deg = pairs.groupBy(col("src")).agg(count(lit(1)).as("d")).localCheckpoint()
    def seed(c: org.apache.spark.sql.Column) =
      substring(md5(c.cast("string")), 1, 1) === "0"
    var ranks = deg.select(col("src").as("v"),
      when(seed(col("src")), lit(RScale)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to Rounds) {
      val contrib = pairs
        .join(deg, "src")
        .join(ranks, col("src") === col("v"))
        .select(col("dst"), expr("r div d").as("c"))
        // decimal(38,0) carry — same overflow posture as x59's rounds
        .groupBy(col("dst")).agg(sum(col("c").cast("decimal(38,0)")).as("m"))
      ranks = deg
        .select(col("src").as("v"))
        .join(contrib, col("v") === col("dst"), "left")
        .select(col("v"),
          (when(seed(col("v")), lit(RScale * 15 / 100)).otherwise(lit(0L))
            + expr(
              s"CAST(($DampNum * coalesce(m, CAST(0 AS DECIMAL(38,0)))) div 100 AS BIGINT)"))
            .as("r"))
    }
    val out = ranks.filter(col("r") > 0)
      .select(col("v").as("part"),
        when(seed(col("v")), 1L).otherwise(0L).as("is_seed"),
        col("r").as("ppr"))
      .orderBy(col("ppr").desc, col("part")).limit(100)
      .localCheckpoint()
    pairs.unpersist()
    deg.unpersist()
    out
  }

  // ---- x149: modularity of the LPA partition --------------------------

  private def modularityOracle: String = {
    val rounds = (1 to LpaRounds).map { k =>
      s"""l$k AS MATERIALIZED (
         |  SELECT v, label FROM (
         |    SELECT e.dst AS v, l.label,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |        ORDER BY COUNT(*) DESC, l.label) AS rn
         |    FROM pairs e JOIN l${k - 1} l ON l.v = e.src
         |    GROUP BY e.dst, l.label)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |pairs AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.p <> b.p
       |  GROUP BY 1, 2),
       |l0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS v, src AS label FROM pairs),
       |$rounds,
       |deg AS MATERIALIZED (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM pairs GROUP BY 1),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM pairs),
       |ec AS (
       |  SELECT la.label, CAST(COUNT(*) AS BIGINT) AS e_c
       |  FROM pairs p
       |  JOIN l$LpaRounds la ON la.v = p.src
       |  JOIN l$LpaRounds lb ON lb.v = p.dst AND lb.label = la.label
       |  GROUP BY 1),
       |dc AS (
       |  SELECT la.label, CAST(SUM(d.d) AS BIGINT) AS d_c
       |  FROM l$LpaRounds la JOIN deg d ON d.src = la.v GROUP BY 1),
       |terms AS (
       |  SELECT dc.label, COALESCE(ec.e_c, 0) AS e_c, dc.d_c
       |  FROM dc LEFT JOIN ec ON ec.label = dc.label)
       |SELECT mm.m2 AS m_directed,
       |  CAST(COUNT(*) AS BIGINT) AS n_communities,
       |  CAST(SUM(CAST(e_c AS DECIMAL(18,0)) * mm.m2
       |    - CAST(d_c AS DECIMAL(18,0)) * CAST(d_c AS DECIMAL(18,0)))
       |    AS BIGINT) AS q_num,
       |  CAST(CAST(SUM(CAST(e_c AS DECIMAL(18,0)) * mm.m2
       |    - CAST(d_c AS DECIMAL(18,0)) * CAST(d_c AS DECIMAL(18,0)))
       |    AS BIGINT) AS DOUBLE)
       |    / (CAST(mm.m2 AS DOUBLE) * CAST(mm.m2 AS DOUBLE)) AS modularity
       |FROM terms CROSS JOIN mm GROUP BY mm.m2""".stripMargin
  }

  /** x149: Newman modularity of the x70 LPA partition — the evaluation
    * member of the graph family (the x88/x143/x147 posture): did label
    * propagation find real structure? Q = Σ_c (e_c/M − (D_c/M)²) over
    * the directed symmetrized edge set, computed as one EXACT integer
    * numerator Q·M² = Σ_c (e_c·M − D_c²) — each term a DECIMAL(18,0)
    * product (the x95 wide-product rule), the cross-community sum an
    * order-independent integer — and ONE final double division.
    * |Q·M²| ≤ M² needs M < 3e9 directed edges in the BIGINT cast;
    * past that keep it decimal (the x74 posture).
    *
    * Scale shape: the x70 rounds plus two label-keyed joins (edge
    * endpoints → labels) and one degree join — all node/edge-keyed hash
    * joins, output is ONE row. */
  val lpaModularity = Q.withOracle(
    "x149_lpa_modularity",
    s"x149: Newman modularity of the $LpaRounds-round LPA partition (exact integer numerator)",
    modularityOracle) { (s, dir) =>
    val pairs = coEdges(s, dir).localCheckpoint()
    var labels = pairs.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint()
    for (_ <- 1 to LpaRounds) {
      val prev = labels
      labels = lpaRound(pairs, labels).localCheckpoint()
      prev.unpersist()
    }
    val deg = pairs.groupBy(col("src")).agg(count(lit(1)).cast("long").as("d"))
    val la = labels.select(col("v").as("sv"), col("label").as("la"))
    val lb = labels.select(col("v").as("dv"), col("label").as("lb"))
    val ec = pairs
      .join(la, col("sv") === col("src"))
      .join(lb, col("dv") === col("dst") && col("lb") === col("la"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).cast("long").as("e_c"))
    val dc = labels.join(deg, col("v") === col("src"))
      .groupBy(col("label")).agg(sum(col("d")).cast("long").as("d_c"))
    val mm = pairs.agg(count(lit(1)).cast("long").as("m2"))
    val terms = dc.join(ec, Seq("label"), "left")
      .select(col("label"), coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c"))
    val out = terms.crossJoin(broadcast(mm))
      .groupBy(col("m2"))
      .agg(count(lit(1)).cast("long").as("n_communities"),
        sum(col("e_c").cast("decimal(18,0)") * col("m2")
          - col("d_c").cast("decimal(18,0)") * col("d_c").cast("decimal(18,0)"))
          .cast("long").as("q_num"))
      .select(col("m2").as("m_directed"), col("n_communities"), col("q_num"),
        (col("q_num").cast("double")
          / (col("m2").cast("double") * col("m2").cast("double")))
          .as("modularity"))
      .localCheckpoint()
    labels.unpersist()
    pairs.unpersist()
    out
  }

  val all: Seq[Q] =
    Seq(pagerank, triangles, trianglesApprox, bfs, effectiveDiameter,
      harmonicCentrality, labelProp, lpaConverged, kcore, kcoreConverged, sssp,
      clusteringCoeff, clusteringApprox, assortativity, linkPredict, hits,
      personalizedPagerank, lpaModularity)
}
