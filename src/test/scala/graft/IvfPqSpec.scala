package graft

/** x51 IVF-PQ — the composition must lose nothing structurally: probing
  * EVERY coarse cell makes the candidate set the whole corpus, and the
  * result must then equal x50's PQ pipeline EXACTLY (same codebooks,
  * same ADC, same refine — the coarse level only ever prunes). At the
  * shipped NProbe the pruning costs bounded recall vs x50, and recall
  * vs the exact scan stays above the family floor.
  */
class IvfPqSpec extends SparkSuite {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf)

  test("probing every coarse cell reproduces x50 exactly (the composition's no-loss anchor)") {
    val full = ext.IvfPq.ivfPqTopK(e, nProbe = ext.Ivf.K)
      .collect().toSeq.map(_.toString)
    val pq = ext.Pq.pqTopK(e).collect().toSeq.map(_.toString)
    assert(full === pq)
  }

  test("recall vs exact x5 at the shipped NProbe stays above the family floor") {
    val exact = SparkEntry.queries("x5_cosine_topk")(spark, sf)
      .filter($"query_id" < 5).select($"query_id", $"neighbor_id")
    val n = exact.count().toDouble
    val got = ext.IvfPq.ivfPqTopK(e).select($"query_id", $"neighbor_id")
    val recall = exact.intersect(got).count() / n
    info(f"ivfpq recall@nprobe=${ext.IvfPq.NProbe} = $recall%.3f")
    // coarse pruning on top of PQ: measured 0.48 (x50 unrouted is 0.68;
    // NProbe=4 of K=10 probes ~40% of the corpus) — floor with margin
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("deterministic under repartitioning") {
    val a = ext.IvfPq.ivfPqTopK(e).collect().toSeq
    val b = ext.IvfPq.ivfPqTopK(e.repartition(5, $"vec_id")).collect().toSeq
    assert(a === b)
  }
}
