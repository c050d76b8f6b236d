package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis of the embedding table by exact-integer
  * power iteration — the dimensionality-reduction member of the
  * embedding-QA family (x14/x31/x41/x47): "is this embedding space
  * dominated by one direction, and which dimensions carry it?" A top
  * component with a large explained-variance share is the classic
  * anisotropy smell (a rogue feature, un-centered outputs, collapsed
  * training) that SemDeDup/ANN recall quality degrades under.
  *
  * Everything is EXACT integer/decimal arithmetic until the final two
  * double divisions, so the DuckDB oracle replays bit-identically:
  *
  *  1. fixed-point quantize: q[j] = floor(x[j]·2^20) (the x12/x50 scale);
  *  2. centered scatter matrix S[j][k] = n·Σ q_j q_k − (Σq_j)(Σq_k),
  *     exact in decimal(38,0) via DECIMAL(18,0)×DECIMAL(18,0) products
  *     (the DuckDB-safe widening rule; headroom: n·|q| ≤ 2^60 holds to
  *     n ≈ 2^39 vectors);
  *  3. elementwise rescale s' = S div (max|S| div 2^20), bounding the
  *     grid at ±~2^20 so every later product stays far inside int64 —
  *     integer div truncates toward zero identically in both engines;
  *  4. [[Rounds]] synchronous power-iteration rounds over the 64-row
  *     vector, starting from all-ones·2^20: w = S'·v (≤ 2^46), then
  *     v' = w div (max|w| div 2^20) — a deterministic, engine-portable
  *     normalization (the truncation is part of the DEFINED algorithm,
  *     not float drift);
  *  5. report per-dimension loadings (scaled + double) and the
  *     explained-variance share of the top component as a Rayleigh
  *     quotient over a COARSENED vector (v div 2^10): every cast-to-
  *     double input stays below 2^53, dodging DuckDB's double-rounded
  *     decimal→double cast.
  *
  * Scale shape: the only corpus-bound stage is the scatter aggregation —
  * a pure map (per-row 2080-element upper-triangle explode, no join,
  * no shuffle of vectors) into ONE hash agg with perfect map-side
  * combine (2,080 groups whatever n is). Everything after runs on
  * ≤ 64×64-row frames with broadcast 1-row scalars. At 100 TB the
  * scatter agg is one scan + one 2,080-row-per-partition combine —
  * the flattest possible full-scan shape after x74's checksum. */
object Pca {

  /** Fixed-point scale, 2^20 — matches the ANN family's quantization. */
  private val S = 1048576L
  /** Power-iteration rounds: enough for the dominant direction of a
    * 64-dim scatter grid to settle (spec pins alignment on crafted
    * anisotropic data); the oracle replays the same fixed count. */
  private val Rounds = 8
  /** Rayleigh coarsening: v div 2^10 keeps every double-cast input
    * below 2^53 (see object doc, step 5). */
  private val Coarse = 1024L

  private def pcaOracle: String = {
    // per-round CTE pair: w<i> = S'·v<i-1>, then rescale to ±2^20
    val rounds = (1 to Rounds).map { i =>
      s"""w$i AS MATERIALIZED (
         |  SELECT sf.j, CAST(SUM(sf.s * v${i - 1}.v) AS BIGINT) AS w
         |  FROM sf JOIN v${i - 1} ON v${i - 1}.j = sf.k GROUP BY 1),
         |v$i AS MATERIALIZED (
         |  SELECT j, w // GREATEST((SELECT MAX(ABS(w)) FROM w$i) // $S, 1) AS v
         |  FROM w$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, ix.i - 1 AS j,
       |    CAST(FLOOR(CAST(embedding[ix.i] AS DOUBLE) * $S.0) AS BIGINT) AS qv
       |  FROM embeddings,
       |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) ix),
       |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
       |sj AS MATERIALIZED (
       |  SELECT j, CAST(SUM(qv) AS BIGINT) AS sv FROM q GROUP BY 1),
       |p AS MATERIALIZED (
       |  SELECT a.j AS j, b.j AS k,
       |    SUM(CAST(a.qv * (SELECT n FROM nr) AS DECIMAL(18,0))
       |        * CAST(b.qv AS DECIMAL(18,0))) AS np
       |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.j <= b.j
       |  GROUP BY 1, 2),
       |su AS MATERIALIZED (
       |  SELECT p.j, p.k,
       |    CAST(p.np AS DECIMAL(38,0))
       |      - CAST(ja.sv AS DECIMAL(18,0)) * CAST(jb.sv AS DECIMAL(18,0)) AS sc
       |  FROM p JOIN sj ja ON ja.j = p.j JOIN sj jb ON jb.j = p.k),
       |mq AS (
       |  SELECT GREATEST(CAST(MAX(ABS(sc)) AS HUGEINT) // $S, 1) AS m FROM su),
       |sf AS MATERIALIZED (
       |  SELECT j, k, CAST(CAST(sc AS HUGEINT) // (SELECT m FROM mq) AS BIGINT) AS s
       |  FROM su
       |  UNION ALL
       |  SELECT k AS j, j AS k,
       |    CAST(CAST(sc AS HUGEINT) // (SELECT m FROM mq) AS BIGINT) AS s
       |  FROM su WHERE j <> k),
       |v0 AS (SELECT DISTINCT j, CAST($S AS BIGINT) AS v FROM sf),
       |$rounds,
       |vh AS MATERIALIZED (
       |  SELECT j, v // $Coarse AS v FROM v$Rounds),
       |wh AS MATERIALIZED (
       |  SELECT sf.j, CAST(SUM(sf.s * vh.v) AS BIGINT) AS w
       |  FROM sf JOIN vh ON vh.j = sf.k GROUP BY 1),
       |ray AS (
       |  SELECT CAST(SUM(vh.v * wh.w) AS BIGINT) AS num,
       |    CAST(SUM(vh.v * vh.v) AS BIGINT) AS den
       |  FROM vh JOIN wh ON wh.j = vh.j),
       |tr AS (
       |  SELECT CAST(SUM(s) AS BIGINT) AS t FROM sf WHERE j = k)
       |SELECT v$Rounds.j AS dim, v$Rounds.v AS loading_scaled,
       |  CAST(v$Rounds.v AS DOUBLE) / $S.0 AS loading,
       |  CAST(ray.num AS DOUBLE) / CAST(ray.den AS DOUBLE)
       |    / CAST(tr.t AS DOUBLE) AS ev_ratio
       |FROM v$Rounds, ray, tr
       |ORDER BY dim""".stripMargin
  }

  /** The 2080-entry upper-triangle (j, k, q_j, q_k) pairs of one
    * quantized vector, as a pure-map explode — no self-join, no shuffle
    * of vectors; the scatter agg is the only corpus-bound stage.
    * Shared with [[graft.streaming.PcaFeed]]'s incremental sums. */
  private[graft] val pairExplode: Column = expr(
    """flatten(transform(sequence(0, size(q) - 1),
      |  j -> transform(sequence(j, size(q) - 1),
      |    k -> struct(j AS j, k AS k, q[j] AS qj, q[k] AS qk))))""".stripMargin)

  val pcaPower = Q.withOracle(
    "x153_pca_power",
    s"x153: top principal direction + explained-variance share ($Rounds exact power rounds)",
    pcaOracle) { (s, dir) =>
    val e = Tables.embeddings(s, dir)
    val vq = e.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * $S.0D) AS BIGINT))")
        .as("q"))
    val nr = e.agg(count(lit(1)).cast("long").as("n"))
    // scatter aggregation: map-side explode of the upper triangle, one
    // 2080-group hash agg; the n factor rides each product so every
    // multiplication stays DECIMAL(18,0) × DECIMAL(18,0) (DuckDB-safe)
    val p = vq.crossJoin(broadcast(nr))
      .select(col("n"), explode(pairExplode).as("e"))
      .select(col("e.j").cast("long").as("j"), col("e.k").cast("long").as("k"),
        ((col("e.qj") * col("n")).cast("decimal(18,0)")
          * col("e.qk").cast("decimal(18,0)")).as("npterm"))
      .groupBy(col("j"), col("k")).agg(sum(col("npterm")).as("np"))
    val sj = vq.select(explode(expr(
        "transform(sequence(0, size(q) - 1), j -> struct(j AS j, q[j] AS qv))")).as("e"))
      .select(col("e.j").cast("long").as("j"), col("e.qv").as("qv"))
      .groupBy(col("j")).agg(sum(col("qv")).cast("long").as("sv"))
    val su = p
      .join(broadcast(sj.select(col("j"), col("sv").as("svj"))), "j")
      .join(broadcast(sj.select(col("j").as("k"), col("sv").as("svk"))), "k")
      .select(col("j"), col("k"),
        (col("np").cast("decimal(38,0)")
          - col("svj").cast("decimal(18,0)") * col("svk").cast("decimal(18,0)"))
          .as("sc"))
    solve(su)
  }

  /** Steps 3–5 of the object doc — rescale, power rounds, Rayleigh —
    * from an upper-triangle scatter frame (j, k, sc decimal(38,0)).
    * Shared by the registered x153 (scatter from one corpus scan) and
    * [[graft.streaming.PcaFeed]] (scatter from incrementally maintained
    * sums): identical exact-integer inputs ⇒ identical output frames,
    * which is the feed's spec contract.
    *
    * The scatter frame is ≤ 2,080 rows of bounded METADATA (the Ivf
    * literal-centroid discipline), so the solve collects it and runs
    * the rounds in exact local integer arithmetic — the distributed
    * form (round 12's first cut) paid ~8 rounds of per-round scheduling
    * latency on 64-row frames, which dominated x153's wall (≈34 s at
    * every probe factor; the corpus-bound scatter agg itself is a few
    * seconds). Semantics are IDENTICAL: BigInteger/Long division
    * truncates toward zero exactly like Spark `div` and DuckDB `//`,
    * and the three final double ops replicate the same IEEE steps, so
    * the oracle (and the PcaFeed parity spec) stay bit-exact. */
  private[graft] def solve(suIn: DataFrame): DataFrame = {
    val spark = suIn.sparkSession
    import spark.implicits._
    val tri = suIn
      .select(col("j").cast("int"), col("k").cast("int"),
        col("sc").cast("decimal(38,0)"))
      .collect() // ≤ 64·65/2 rows — the corpus scan lands here
      .map(r => (r.getInt(0), r.getInt(1), BigInt(r.getDecimal(2).toBigInteger)))
    // step 3: elementwise rescale by m = max(|sc|) div 2^20 (min 1)
    val m = (tri.iterator.map(_._3.abs).max / S).max(BigInt(1))
    val dims = tri.iterator.flatMap(t => Iterator(t._1, t._2)).toArray.distinct.sorted
    val idx = dims.zipWithIndex.toMap
    val n = dims.length
    val sM = Array.ofDim[Long](n, n)
    tri.foreach { case (j, k, sc) =>
      val s = (sc / m).toLong // BigInt division truncates toward zero, like div///
      sM(idx(j))(idx(k)) = s
      sM(idx(k))(idx(j)) = s
    }
    // step 4: Rounds synchronous power rounds from all-ones·2^20
    var v = Array.fill(n)(S)
    for (_ <- 1 to Rounds) {
      val w = Array.tabulate(n)(j => (0 until n).map(k => sM(j)(k) * v(k)).sum)
      val mw = (w.iterator.map(math.abs).max / S).max(1L)
      v = w.map(_ / mw)
    }
    // step 5: Rayleigh over the coarsened vector + trace
    val vh = v.map(_ / Coarse)
    val wh = Array.tabulate(n)(j => (0 until n).map(k => sM(j)(k) * vh(k)).sum)
    val num = (0 until n).map(j => vh(j) * wh(j)).sum
    val den = (0 until n).map(j => vh(j) * vh(j)).sum
    val tr = (0 until n).map(j => sM(j)(j)).sum
    val ev = num.toDouble / den.toDouble / tr.toDouble
    dims.indices.map(i => (dims(i).toLong, v(i), v(i).toDouble / S.toDouble, ev))
      .toDF("dim", "loading_scaled", "loading", "ev_ratio")
      .orderBy(col("dim"))
  }

  val all: Seq[Q] = Seq(pcaPower)
}
