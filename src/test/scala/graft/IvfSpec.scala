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

  test("BoundedMinN: sorted, capped at n, merge-order-independent") {
    val agg = new Ivf.BoundedMinN(3)
    val vals = Seq(9L, 2L, 7L, 2L, 11L, 0L, 5L)
    val direct = vals.foldLeft(agg.zero)(agg.reduce)
    assert(direct.toSeq == Seq(0L, 2L, 2L),
      s"smallest-3 with duplicates wrong: ${direct.toSeq}")
    // arbitrary split + merge must equal the single-pass fold
    // (map-side partials merge in arbitrary order at scale)
    (1 until vals.size).foreach { cut =>
      val (l, r) = vals.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq == direct.toSeq, s"merge at $cut diverged")
    }
    // buffer never exceeds n mid-stream
    assert(vals.scanLeft(agg.zero)(agg.reduce).forall(_.length <= 3))
  }

  test("topNCells matches the window row_number form at K=1200 (probe state O(n), not O(K))") {
    // The round-8 growth rule makes K scale with the corpus, so probe
    // selection must hold at K far beyond the registered 10. Synthetic
    // quantizer: 300 vectors x 1200 centroids (cellBits 11), integer
    // coordinates — compare the bounded aggregation against the
    // window-sort reference on identical inputs.
    val dim = 4
    def coords(seedCol: org.apache.spark.sql.Column, salt: Int) =
      array((0 until dim).map(i =>
        pmod(xxhash64(seedCol, lit(i), lit(salt)), lit(1000L))): _*)
    val vecs = spark.range(300).select($"id".as("vec_id"), coords($"id", 1).as("q"))
    val cents = spark.range(1200)
      .select($"id".cast("int").as("cell"), coords($"id", 2).as("q"))
    val n = 3
    val got = Ivf.topNCells(vecs, cents, n, cellBits = 11)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"dist", $"cell")
    val ref = vecs.crossJoin(cents.select($"cell", $"q".as("cq")))
      .withColumn("dist", Ivf.sqDist($"q", $"cq"))
      .withColumn("r", row_number().over(w)).filter($"r" <= n)
      .select($"vec_id", $"r", $"cell")
    assert(got.select($"vec_id", $"r", $"cell")
      .exceptAll(ref).isEmpty && ref.exceptAll(
        got.select($"vec_id", $"r", $"cell")).isEmpty,
      "bounded top-n diverged from the window reference at K=1200")
    // the overflow guard fails loud past the packed-long bound
    assertThrows[IllegalArgumentException] {
      Ivf.topNCells(vecs, cents, n, cellBits = 15)
    }
  }

  test("literal-centroid tier ≡ broadcast-join tier: train, assign, probe") {
    // the literal fast path (registered K=10 queries) must be bit-identical
    // to the broadcast-join posture on every stage of the real corpus
    val vq = Ivf.quantized(Tables.embeddings(spark, sf))
    val centsDf = Ivf.refinedCentroids(vq, Ivf.LloydIters).localCheckpoint()
    // training: the driver-iterated chain lands the same centroids
    val csTrained = Ivf.refinedCentsCollected(vq, Ivf.LloydIters)
    val csRef = Ivf.collectCents(centsDf)
    assert(csTrained === csRef, "Lloyd chains diverged between tiers")
    // assignment: pure-map argmin ≡ crossJoin+groupBy argmin
    val aLit = Ivf.assignCellsLit(vq, csRef).select($"vec_id", $"cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val aJoin = Ivf.assignCells(vq, centsDf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(aLit === aJoin, "assignment diverged between tiers")
    // probe selection: sorted-slice ≡ BoundedMinN aggregation
    val n = Ivf.NProbe
    val pLit = Ivf.topNCellsLit(vq, csRef, n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val pAgg = Ivf.topNCells(vq, centsDf, n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(pLit === pAgg, "probe lists diverged between tiers")
  }

  test("x88 recall equals an independent intersection of the x5/x12 outputs") {
    import spark.implicits._
    val got = ext.Recall.annRecall.fn(spark, sf)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = ext.Similarity.bruteForceKnn.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cand = ext.Ivf.ivfAnn.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet === exact.keySet, "one recall row per query")
    for ((q, (hits, recall)) <- got) {
      val inter = exact(q).intersect(cand.getOrElse(q, Set.empty)).size.toLong
      assert(hits === inter, s"query $q")
      assert(recall === hits.toDouble / 5)
      assert(hits >= 0L && hits <= 5L)
    }
    // the index must be doing better than chance at this probe depth
    val avg = got.values.map(_._2).sum / got.size
    assert(avg > 0.3, s"avg recall $avg — index degenerated")
  }

  test("x156 AP equals an independent rank-aware recompute; bounded by recall") {
    import spark.implicits._
    val got = ext.Recall.annAp.fn(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exact = ext.Similarity.bruteForceKnn.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ranked = ext.Ivf.ivfAnn.fn(spark, sf)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Long)]
      .collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val recall = ext.Recall.annRecall.fn(spark, sf)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got.keySet === exact.keySet)
    for ((q, (hits, apNum, ap)) <- got) {
      val rels = ranked.getOrElse(q, Seq.empty).map(n => if (exact(q)(n)) 1L else 0L)
      var cum = 0L; var num = 0L
      rels.zipWithIndex.foreach { case (r, i0) =>
        cum += r; num += r * cum * (60L / (i0 + 1))
      }
      assert(hits === rels.sum, s"query $q")
      assert(apNum === num, s"query $q")
      assert(ap === num.toDouble / 300.0, s"query $q")
      assert(ap >= 0.0 && ap <= 1.0)
      // AP@k with R = k can never exceed recall@k (each of the R slots
      // contributes at most 1/R, and only when it is a hit)
      assert(ap <= recall(q) + 1e-12, s"query $q: ap $ap > recall ${recall(q)}")
    }
  }

  test("x179 matryoshka recall: prefix-supported vectors make truncation lossless") {
    import spark.implicits._
    // every coordinate beyond dim 16 is ZERO → the truncated cosine is
    // bit-identical to the full-width one (the extra fold terms add 0.0,
    // an IEEE identity), so recall must be exactly 1.0 at BOTH widths.
    val vecs = (0 until 30).map { i =>
      val e = Array.tabulate(64)(j =>
        if (j < 16) ((i * 31 + j * 17) % 13 - 6).toFloat / 7f else 0f)
      (i.toLong, e, i.toLong % 3)
    }
    val dir = java.nio.file.Files.createTempDirectory("x179").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("x179_matryoshka_recall")(spark, dir).collect()
    assert(rows.length == 40) // 2 dims × 20 queries
    rows.foreach { r =>
      assert(r.getAs[Double]("recall") == 1.0,
        s"dim ${r.getAs[Long]("dim")} query ${r.getAs[Long]("query_id")}")
      assert(r.getAs[Long]("n_hits") == 5L)
    }
  }

  test("x179 on the real corpus: wider prefixes keep more of the exact top-k") {
    import spark.implicits._
    val rows = SparkEntry.queries("x179_matryoshka_recall")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 40)
    rows.foreach { case (_, _, hits, recall) =>
      assert(hits >= 0L && hits <= 5L && recall == hits.toDouble / 5)
    }
    val byDim = rows.groupBy(_._1).view.mapValues(rs => rs.map(_._4).sum / rs.length)
    assert(byDim(32L) >= byDim(16L) - 0.05,
      s"mean recall fell with width: ${byDim.toMap}")
  }
}
