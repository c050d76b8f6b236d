package graft

import graft.ext.Ivf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF quantizer's refinement story: the label seed is only a starting
  * point — one Lloyd iteration must strictly improve a bad seed on
  * genuinely clustered vectors (the guarantee k-means rests on), and the
  * refined x12 must keep its recall against exact x5 on the real corpus. */
class IvfSpec extends SparkSuite {
  import spark.implicits._

  test("one Lloyd iteration strictly reduces quantization cost on clustered vectors") {
    // two tight clusters along orthogonal axes; labels deliberately
    // mis-seeded: all of cluster A plus HALF of cluster B carry label 0,
    // so seed centroid 0 is dragged off A's mode. One Lloyd pass must
    // reassign by geometry and re-center, strictly lowering total
    // (1 - cosine) quantization cost.
    val dim = 64
    def vec(axis: Int, jitterSeed: Int): Array[Double] = {
      val a = Array.fill(dim)(0.0)
      a(axis) = 10.0
      a((axis + 7) % dim) = (jitterSeed % 5) * 0.1 // deterministic jitter
      a
    }
    val rows = (0 until 20).map(i => (i.toLong, 0, vec(0, i))) ++ // A, label 0
      (20 until 30).map(i => (i.toLong, 0, vec(1, i))) ++ // B, label 0 (wrong)
      (30 until 40).map(i => (i.toLong, 1, vec(1, i))) // B, label 1
    val df = rows.toDF("vec_id", "cell", "vd")
    val v = df.select($"vec_id", $"vd")
    val seeds = Ivf.meanByCell(df)
    val refined = Ivf.lloydStep(v, seeds, spark)
    def cost(cents: DataFrame): Double = {
      graft.functions.CosineSimilarity.register(spark)
      Ivf.assign(v, cents, 1, spark).join(v, "vec_id")
        .join(cents.withColumnRenamed("centroid", "c"), "cell")
        .select((lit(1.0) - graft.functions.CosineSimilarity.cosineSim($"vd", $"c")).as("q"))
        .agg(sum($"q")).as[Double].head()
    }
    val before = cost(seeds)
    val after = cost(refined)
    assert(after < before - 1e-6, s"Lloyd did not improve: before=$before after=$after")
  }

  test("x12 recall vs exact x5: refined quantizer does not lose to the raw seed") {
    val exact = SparkEntry.queries("x5_cosine_topk")(spark, sf)
      .select($"query_id", $"neighbor_id")
    val n = exact.count().toDouble
    def recall(iters: Int): Double = exact.intersect(
      Ivf.ivfTopK(spark, sf, iters).select($"query_id", $"neighbor_id")).count() / n
    val seedOnly = recall(0)
    val refined = recall(Ivf.LloydIters)
    assert(refined >= seedOnly,
      s"Lloyd passes lost recall on the real corpus: seed=$seedOnly refined=$refined")
    // measured: seed 0.64, refined 0.70 at nprobe=4 (strictly above the
    // round-3 configuration's 0.52); floor guards against collapse
    assert(refined >= 0.6, s"x12 recall regressed: $refined")
  }
}
