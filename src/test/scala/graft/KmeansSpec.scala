package graft

import org.apache.spark.sql.functions._

/** x64 k-means training: the oracle replays the full quantizer chain; this
  * pins the model semantics the oracle can't see in isolation — planted
  * two-point data recovers both points exactly (floor-mean of identical
  * members is the member), empty cells drop out of the model rather than
  * emitting stale seeds, sizes account for every vector, and training is
  * deterministic across runs. */
class KmeansSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, vecs: Seq[(Long, Array[Float])]): Unit =
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  test("planted two-point data: model collapses to exactly the two points") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmeans").toString
    // 15 copies of A = +0.25^64 and 15 of B = -0.25^64 (0.25f exact in
    // IEEE, so floor(0.25 * 2^20) = 262144 with no rounding ambiguity)
    val a = Array.fill(64)(0.25f)
    val b = Array.fill(64)(-0.25f)
    write(dir, (0L until 15L).map(i => (i, a)) ++ (15L until 30L).map(i => (i, b)))
    val rows = ext.Kmeans.train.fn(spark, dir)
      .as[(Int, Int, Long, Long)].collect().toSeq
    // empty seed cells dropped: exactly two surviving cells x 64 dims
    assert(rows.length === 128, s"expected 2 cells x 64 dims, got ${rows.length}")
    val byCell = rows.groupBy(_._1)
    assert(byCell.size === 2)
    val models = byCell.values.map { cell =>
      (cell.sortBy(_._2).map(_._3).toSeq, cell.map(_._4).distinct)
    }.toSeq
    models.foreach { case (_, ns) => assert(ns === Seq(15L)) }
    assert(models.map(_._1).toSet ===
      Set(Seq.fill(64)(262144L), Seq.fill(64)(-262144L)))
  }

  test("sizes account for every vector on real data; model is K-bounded") {
    val got = ext.Kmeans.train.fn(spark, sf).as[(Int, Int, Long, Long)].collect().toSeq
    val cells = got.groupBy(_._1)
    assert(cells.size <= graft.ext.Ivf.K)
    cells.values.foreach(c => assert(c.length === 64))
    // each cell's n is constant across its dims; totals = corpus size
    val total = cells.values.map(_.map(_._4).distinct).map { ns =>
      assert(ns.length === 1); ns.head
    }.sum
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(total === nVecs)
  }

  test("training is deterministic run-to-run") {
    val r1 = ext.Kmeans.train.fn(spark, sf).collect().map(_.toSeq).toSeq
    val r2 = ext.Kmeans.train.fn(spark, sf).collect().map(_.toSeq).toSeq
    assert(r1 === r2)
  }

  test("training is invariant under hostile physical layout") {
    // md5-rank seeds + associative integer sums promise the model is a
    // function of the SET of vectors, not their partitioning — the
    // property that makes retraining reproducible across cluster sizes
    val base = ext.Kmeans.train.fn(spark, sf).collect().map(_.toSeq).toSeq
    val shuffled = Tables.embeddings(spark, sf)
      .repartition(7, col("label")) // skewed, non-id layout
    val dir = java.nio.file.Files.createTempDirectory("graft-kmeans-shuf").toString
    shuffled.write.parquet(s"$dir/embeddings.parquet")
    val got = ext.Kmeans.train.fn(spark, dir).collect().map(_.toSeq).toSeq
    assert(got === base)
  }
}
