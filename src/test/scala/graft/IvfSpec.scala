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

  test("recall vs NProbe curve: monotone, pinned at the shipped knob, exhaustive at K") {
    // NProbe is THE latency/recall knob of an IVF index; the tradeoff
    // must be measured, not asserted. Recall = overlap with exact x5
    // top-5, averaged over the query set.
    val exact = SparkEntry.queries("x5_cosine_topk")(spark, sf)
      .select($"query_id", $"neighbor_id")
    val n = exact.count().toDouble
    val probes = Seq(1, 2, Ivf.NProbe, 8, Ivf.K)
    val curve = probes.map { p =>
      p -> exact.intersect(
        Ivf.ivfTopK(spark, sf, Ivf.LloydIters, nProbe = p)
          .select($"query_id", $"neighbor_id")).count() / n
    }
    info("recall@nprobe: " + curve.map { case (p, r) =>
      f"$p -> $r%.3f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall fell as probes widened: nprobe=$p1 -> $r1, nprobe=$p2 -> $r2")
    case _ => ()
    }
    // the shipped knob (x12's registry setting) holds its pin
    assert(curve.toMap.apply(Ivf.NProbe) >= 0.6,
      s"recall at the shipped NProbe=${Ivf.NProbe} regressed: ${curve.toMap.apply(Ivf.NProbe)}")
    // probing every cell makes the candidate set the whole corpus, and
    // exact cosine within candidates must then reproduce x5 exactly
    assert(curve.last._2 === 1.0,
      s"nprobe=K must be exhaustive; got recall ${curve.last._2}")
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
