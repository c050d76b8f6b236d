package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial join — the canonical distributed answer to
  * "which points are near each other?" when an all-pairs distance join
  * is quadratic: bucket the plane into fixed cells, replicate each
  * probe point into its 3×3 cell neighborhood, and equi-join on the
  * cell key. Every pair closer than one cell size is PROVABLY captured
  * (a coordinate delta < CellSize can span at most one cell boundary),
  * so the global top-k closest pairs are exact whenever the k-th
  * distance is under CellSize — a one-line check on the result.
  *
  * This is the grid/partition join of the spatial-Spark literature
  * (e.g. SpatialSpark / Sedona's uniform-grid partitioner): both sides
  * shuffle once on the cell key, per-cell work is occupancy-bounded,
  * and the output is a contractually bounded top-k (TakeOrdered — no
  * global sort). Candidate volume is ~9·n·occupancy; the production
  * lever at 100 TB is cell size ∝ 1/√density (cells ∝ n keeps
  * occupancy — and thus per-task work — constant while the shuffle
  * stays one pass). Degenerate-density cells are the usual skew story:
  * AQE splits them, or a finer second-level grid inside hot cells.
  *
  * Coordinates here are synthesized: each customer is placed at a
  * deterministic 60-bit-md5-derived point on a 1e6 × 1e6 integer grid
  * (the engine's portable-hash pattern — DuckDB replays
  * `('0x' || substr(md5(s),1,15))::BIGINT` bit-for-bit against Spark's
  * `conv(substr(md5(s),1,15),16,10)`), so distances are exact BIGINTs
  * and the oracle needs no floating-point geometry. A real deployment
  * swaps the hash for lat/lon scaled to integer microdegrees; the
  * plan — and the exactness argument — is unchanged. */
object Spatial {

  /** Grid cell edge in coordinate units: 250×250 cells over the 1e6
    * square; sf0.1's ~15k customers sit at ~0.24 points/cell, and the
    * 20th-closest pair is far under one cell size (asserted in spec). */
  private val CellSize = 4000L

  /** Coordinate domain edge. */
  private val Range = 1000000L

  private val TopK = 20

  /** First 60 bits of md5(prefix ‖ key) as a non-negative long — the
    * cross-engine-portable hash (see functions/Winnow.scala hash60 for
    * the codegen'd byte-level equivalent). */
  private def hash60(prefix: String, key: Column): Column =
    conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Customer points on the integer grid with their cell ids. */
  private[graft] def points(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey").as("ck"))
      .withColumn("x", hash60("x", col("ck")) % Range)
      .withColumn("y", hash60("y", col("ck")) % Range)
      .withColumn("cx", expr(s"x div $CellSize"))
      .withColumn("cy", expr(s"y div $CellSize"))

  /** x119: top-[[TopK]] closest customer pairs via the 3×3-neighborhood
    * grid join — exact squared integer distances, one cell-keyed
    * shuffle, bounded output. */
  val gridNn = Q.withOracle(
    "x119_grid_closest_pairs",
    s"x119: top-$TopK closest point pairs via a 3x3 grid-cell equi-join (no all-pairs)",
    s"""WITH pts AS MATERIALIZED (
       |  SELECT c_custkey AS ck,
       |    ('0x' || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
       |      % $Range AS x,
       |    ('0x' || substr(md5('y' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
       |      % $Range AS y
       |  FROM customer),
       |c AS MATERIALIZED (
       |  SELECT ck, x, y, x // $CellSize AS cx, y // $CellSize AS cy FROM pts)
       |SELECT a.ck AS ck_a, b.ck AS ck_b,
       |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2,
       |  SQRT(CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS DOUBLE))
       |    AS dist
       |FROM c a JOIN c b
       |  ON a.ck < b.ck
       |  AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
       |  AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       |ORDER BY d2, ck_a, ck_b LIMIT $TopK""".stripMargin) { (s, dir) =>
    val pts = points(s, dir)
    // replicate the PROBE side into its 9 neighbor cells; the build side
    // stays single-copy, so the join is a plain (cx, cy) hash equi-join
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val probes = pts
      .withColumn("off", explode(array(offsets: _*)))
      .select(col("ck").as("ck_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("off.dx")).as("cx"), (col("cy") + col("off.dy")).as("cy"))
    probes
      .join(pts.select(col("ck").as("ck_b"), col("x").as("xb"), col("y").as("yb"),
          col("cx"), col("cy")),
        Seq("cx", "cy"))
      .where(col("ck_a") < col("ck_b"))
      .select(col("ck_a"), col("ck_b"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
      .withColumn("dist", sqrt(col("d2").cast("double")))
      .orderBy(col("d2"), col("ck_a"), col("ck_b"))
      .limit(TopK)
  }

  val all: Seq[Q] = Seq(gridNn)
}
