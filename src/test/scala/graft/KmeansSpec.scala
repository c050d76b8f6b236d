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

  test("x163 crafted: tie-broken majority, exact Gini, singleton cells pure") {
    val dir = java.nio.file.Files.createTempDirectory("graft-purity").toString
    // 4 identical vectors labeled 1,1,3,3 collapse to one cell (distance
    // ties break to the min cell): top = (label 1, count 2) by the pack
    // rule, purity 1/2, gini (16-8)/16 = 1/2. Four far-apart singletons
    // (label 5) are pure cells.
    val home = Array.fill(64)(0.25f)
    def far(i: Int) = Array.tabulate(64)(d => if (d == i) -0.9f else 0.05f)
    (Seq((0L, home, 1), (1L, home, 1), (2L, home, 3), (3L, home, 3)) ++
      (0 until 4).map(i => ((10 + i).toLong, far(i), 5)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = ext.Kmeans.clusterPurity.fn(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    val (big, singles) = got.partition(_._2 === 4L)
    assert(big.size === 1 && singles.size === 4)
    val b = big.head
    assert((b._3, b._4, b._5, b._6) === ((1L, 2L, 0.5, 0.5)))
    singles.foreach { s =>
      assert((s._2, s._3, s._4, s._5, s._6) === ((1L, 5L, 1L, 1.0, 0.0)))
    }
  }

  test("x163 real data: mass accounting and rational identities per cell") {
    val got = ext.Kmeans.clusterPurity.fn(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(got.map(_._2).sum === total) // every vector lands in one cell
    got.foreach { case (_, n, lbl, topN, purity, gini) =>
      assert(lbl >= 0L && lbl <= 9L)
      assert(topN >= 1L && topN <= n)
      assert(purity === topN.toDouble / n)
      assert(gini >= 0.0 && gini < 1.0)
      assert((gini == 0.0) === (topN == n)) // pure iff unanimous
      // impurity floor given the majority count: gini >= 1 - purity^2 -
      // (rest as one block)^2 is the MINIMUM split; check the weaker
      // universal bound gini <= 1 - purity^2 + tiny
      assert(gini <= 1.0 - purity * purity + 1e-12)
    }
  }

  test("x189 prototype prune: per-cell ceil-half quota, hardest kept, full universe") {
    val got = ext.Kmeans.prototypePrune.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq // vec_id?, but vec_id type from parquet
    val total = Tables.embeddings(spark, sf).count()
    assert(got.size.toLong === total) // every vector gets a verdict
    assert(got.map(_._1).distinct.size === got.size)
    got.foreach { case (_, _, dist, rnk, keep) =>
      assert(dist >= 0L)
      assert(rnk >= 1L)
      assert(keep == 0L || keep == 1L)
    }
    got.groupBy(_._2).foreach { case (cell, members) =>
      val n = members.size.toLong
      // ranks are a permutation of 1..n within the cell
      assert(members.map(_._4).sorted === (1L to n))
      // keep quota is exactly ceil(n/2), and it is the HARD half: every
      // kept distance >= every dropped distance (ties split by vec_id,
      // so equality at the boundary is legal)
      val kept = members.filter(_._5 == 1L)
      assert(kept.size.toLong === (n + 1) / 2, s"cell $cell quota")
      val dropped = members.filter(_._5 == 0L)
      if (dropped.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._3).max - 0L)
      // the keep rule is exactly "rank <= ceil(n/2)"
      members.foreach { case (_, _, _, rnk, keep) =>
        assert((keep == 1L) === (rnk <= (n + 1) / 2))
      }
    }
    // the cell partition matches the shared x64 quantizer: per-cell
    // member counts equal x64's reported sizes
    val x64Sizes = ext.Kmeans.train.fn(spark, sf)
      .select(col("cell").cast("long"), col("n")).distinct()
      .as[(Long, Long)].collect().toMap
    got.groupBy(_._2).foreach { case (cell, members) =>
      assert(x64Sizes(cell) === members.size.toLong, s"cell $cell size")
    }
  }
}
