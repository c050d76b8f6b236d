package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** x64: k-means training as a FIRST-CLASS operator — the quantizer that
  * x12 (IVF probing) and x41 (SemDeDup cells) consume, exposed as its own
  * registered query so a pipeline can train, inspect, and persist
  * centroids independently of any index build (the MLlib `KMeans.fit`
  * role, built from the engine's own deterministic pieces).
  *
  * Everything reuses [[Ivf]]'s oracle-replayed quantizer verbatim — ONE
  * training definition shared by three queries, so bumping K/iters can
  * never desynchronize them:
  *  - fixed-point quantization `floor(x * 2^20)` (exact IEEE);
  *  - md5-rank seeds (portable, no partition-order-dependent data mean);
  *  - [[Ivf.LloydIters]] assign/re-center passes in exact integer
  *    arithmetic (argmin of int64 squared L2, floor-mean re-centering).
  *
  * Output is the trained model in its storable form: one row per
  * (cell, dimension) with the centroid coordinate plus the cell's final
  * member count — K·dim rows, contractually bounded, a table a 100 TB
  * pipeline writes once and broadcasts everywhere.
  *
  * Scale shape: the registered query rides the literal-centroid tier
  * (driver-held K×dim ints; each Lloyd pass is a pure-map argmin plus one
  * keyed re-center — the MLlib iteration shape). When K grows with the
  * corpus (constant occupancy), the SAME training runs on the
  * broadcast-join tier ([[Ivf.refinedCentroids]]) and the two-level
  * hierarchy ([[Ivf]] round-8 doc) — x64 is the bounded-K tier of that
  * one family, not a fourth code path.
  */
object Kmeans {

  private def kmeansOracle: String = {
    val (ctes, finalCents) = Ivf.quantizerOracleCtes
    s"""WITH $ctes,
       |sizes AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM cells GROUP BY cell)
       |SELECT fc.cell, CAST(t.i - 1 AS INT) AS d, fc.q[t.i] AS c,
       |  COALESCE(sz.n, 0) AS n
       |FROM $finalCents fc
       |CROSS JOIN generate_series(1, ${Ivf.Dim}) t(i)
       |LEFT JOIN sizes sz USING (cell)
       |ORDER BY fc.cell, d""".stripMargin
  }

  /** x64: train the deterministic k-means quantizer (md5 seeds +
    * [[Ivf.LloydIters]] integer Lloyd passes) and emit the model —
    * (cell, d, coordinate, member count), K·dim rows. */
  val train = Q.withOracle(
    "x64_kmeans_train",
    s"x64: k-means training (K=${Ivf.K}, ${Ivf.LloydIters} integer Lloyd passes) " +
      "- centroid model + cell sizes",
    kmeansOracle) { (s, dir) =>
    val vq = Ivf.quantized(Tables.embeddings(s, dir))
      .localCheckpoint() // read once per Lloyd pass + the final assignment
    val cs = Ivf.refinedCentsCollected(vq)
    val sizes = Ivf.assignCellsLit(vq, cs)
      .groupBy(col("cell")).agg(count(lit(1)).cast("long").as("n"))
    val model = s.createDataFrame(cs._1.zip(cs._2)).toDF("cell", "q")
    model.select(col("cell"), posexplode(col("q")).as(Seq("d", "c")))
      .join(sizes, Seq("cell"), "left")
      .select(col("cell"), col("d"), col("c"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("cell"), col("d"))
  }

  val all: Seq[Q] = Seq(train)
}
