package graft

import graft.ext.Ivf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF quantizer's refinement story: the md5 seed is only a starting
  * point — one Lloyd iteration must strictly improve a bad seed on
  * genuinely clustered vectors (the guarantee k-means rests on), and the
  * refined x12 must keep its recall against exact x5 on the real corpus.
  * All arithmetic is integer (the determinism x12's DuckDB oracle rests
  * on), so costs compare exactly. */
class IvfSpec extends SparkSuite {
  import spark.implicits._

  test("one Lloyd iteration strictly reduces quantization cost on clustered vectors") {
    // two tight clusters along orthogonal axes; cells deliberately
    // mis-seeded: all of cluster A plus HALF of cluster B carry cell 0,
    // so seed centroid 0 is dragged off A's mode. One Lloyd pass must
    // reassign by geometry and re-center, strictly lowering total
    // squared-L2 quantization cost.
    val dim = 64
    val unit = 1048576L // the pipeline's fixed-point scale
    def vec(axis: Int, jitterSeed: Int): Array[Long] = {
      val a = Array.fill(dim)(0L)
      a(axis) = 10L * unit
      a((axis + 7) % dim) = (jitterSeed % 5) * unit / 10
      a
    }
    val rows = (0 until 20).map(i => (i.toLong, 0, vec(0, i))) ++ // A, cell 0
      (20 until 30).map(i => (i.toLong, 0, vec(1, i))) ++ // B, cell 0 (wrong)
      (30 until 40).map(i => (i.toLong, 1, vec(1, i))) // B, cell 1
    val df = rows.toDF("vec_id", "cell", "q")
    val v = df.select($"vec_id", $"q")
    val seeds = Ivf.meanByCell(df)
    val refined = Ivf.lloydStep(v, seeds)
    def cost(cents: DataFrame): Long =
      Ivf.assignCells(v, cents).join(v, "vec_id")
        .join(cents.withColumnRenamed("q", "cq"), "cell")
        .select(Ivf.sqDist($"q", $"cq").as("d"))
        .agg(sum($"d")).as[Long].head()
    val before = cost(seeds)
    val after = cost(refined)
    assert(after < before, s"Lloyd did not improve: before=$before after=$after")
  }

  test("x12 recall vs exact x5: Lloyd refinement beats the raw md5 seed") {
    val exact = SparkEntry.queries("x5_cosine_topk")(spark, sf)
      .select($"query_id", $"neighbor_id")
    val n = exact.count().toDouble
    def recall(iters: Int): Double = exact.intersect(
      Ivf.ivfTopK(spark, sf, iters).select($"query_id", $"neighbor_id")).count() / n
    val seedOnly = recall(0)
    val refined = recall(Ivf.LloydIters)
    assert(refined >= seedOnly,
      s"Lloyd passes lost recall on the real corpus: seed=$seedOnly refined=$refined")
    assert(refined >= 0.6, s"x12 recall regressed: $refined")
  }
}
