package graft

import org.apache.spark.sql.functions._

/** x86 sampled quantiles: the oracle pins the bit-exact sample replay;
  * these pin the ESTIMATOR — sampled quartiles track a17's exact ones
  * within sampling error, the sample fraction is near 1/4, and the
  * result is invariant to physical layout (the determinism that
  * separates a hash sample from rand()). */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("x86 sampled quartiles track the exact a17 values within sampling error") {
    val got = ext.Sampling.sampledQuantiles.fn(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.50)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === exact.keySet)
    for ((k, (nTot, nSamp, p25, p50, p75)) <- got) {
      // 1/4 Bernoulli sample: fraction within [0.15, 0.35] even at the
      // sf0.001 group sizes (~500/flag)
      val frac = nSamp.toDouble / nTot
      assert(frac > 0.15 && frac < 0.35, s"$k sample fraction $frac")
      val (e25, e50, e75) = exact(k)
      // quantity spans 1..50; quartiles of a ≥100-row sample land
      // within a few units of the exact ones
      assert(math.abs(p25 - e25) <= 4.0, s"$k p25 $p25 vs $e25")
      assert(math.abs(p50 - e50) <= 4.0, s"$k p50 $p50 vs $e50")
      assert(math.abs(p75 - e75) <= 4.0, s"$k p75 $p75 vs $e75")
    }
  }

  test("x86 is layout-invariant: same sample, same quantiles under hostile repartition") {
    val base = ext.Sampling.sampledQuantiles.fn(spark, sf).collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-sq").toString
    Tables.lineitem(spark, sf).orderBy($"l_quantity".desc).repartition(5)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val hostile = ext.Sampling.sampledQuantiles.fn(spark, dir).collect().toSeq
    assert(hostile === base)
  }

  private def md5hex(s0: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("x144: replicate means and interval equal a scalar md5 replay") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .as[(Long, Long)].collect()
    def hash60(k: Long): Long =
      java.lang.Long.parseLong(md5hex(k.toString).take(15), 16)
    val reps = (0 until 32).flatMap { b =>
      val kept = orders.filter { case (k, _) => ((hash60(k) >> b) & 1L) == 1L }
      if (kept.isEmpty) None
      else Some((b.toLong, kept.map(_._2).sum.toDouble / kept.length))
    }
    val ranked = reps.sortBy { case (b, m) => (m, b) }.map(_._2)
    val expectLo = ranked(3)  // 4th smallest
    val expectHi = ranked(28) // 29th smallest
    val r = ext.Sampling.bootstrapCi.fn(spark, sf)
      .as[(Long, Double, Long, Double, Double, Double)].collect().head
    assert(r._1 === orders.length.toLong)
    assert(r._2 === orders.map(_._2).sum.toDouble / orders.length)
    assert(r._4 === expectLo)
    assert(r._5 === expectHi)
    assert(r._6 === expectHi - expectLo)
    assert(r._4 <= r._2 && r._2 <= r._5,
      "full mean inside the subagging band on this data")
  }

  test("x145: per-stratum HT estimate equals a scalar md5-rank replay") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    val expect = orders.groupBy(_._1).map { case (g, rows) =>
      val n = rows.length
      val q = (n + 3) / 4
      val sampled = rows.sortBy { case (_, k, _) => (md5hex(k.toString), k) }
        .take(q).map(_._3).sum
      val truth = rows.map(_._3).sum
      val est = sampled.toDouble * n / q
      g -> ((n.toLong, q.toLong, sampled, truth, est,
        (est - truth.toDouble) / truth.toDouble))
    }
    val got = ext.Sampling.horvitzThompson.fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got === expect)
    // the quarter sample should estimate within ±15% on every stratum here
    got.values.foreach { case (_, _, _, _, _, rel) => assert(math.abs(rel) < 0.15) }
  }

  test("x159 priority sample: structural laws + unbiased subset sums on sf0.1") {
    import org.apache.spark.sql.functions._
    val big = "/root/testdata/sf0.1"
    val rows = ext.Sampling.prioritySample.fn(spark, big)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.size === 64)
    val tau = rows.map(_._4).distinct
    assert(tau.size === 1) // one threshold, stamped on every row
    rows.foreach { case (_, w, q, t, wHat) =>
      assert(q > t) // every sampled priority exceeds the (k+1)-th
      assert(wHat === math.max(w.toDouble, t)) // the DLT estimator
    }
    // priorities replay exactly from the hash: q = w*P / (knuth(key)+1)
    rows.foreach { case (k, w, q, _, _) =>
      val m = ((k % 1000003L) * 427799L) % 1000003L + 1L
      assert(q === (w * 1000003L).toDouble / m)
    }
    // subset-sum estimation (the property the sketch exists for):
    // E[sum over sample of w_hat * 1{i in A}] = sum over A of w, for ANY
    // item subset A. k = 64 gives ~1/sqrt(k) ~ 12.5% std-err; measured
    // here: total +5.3%, even-keys subset -1.3%. Pin both under 25%.
    val truth = Tables.orders(spark, big)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("w"))
      .as[(Long, Long)].collect()
    def relErr(pred: Long => Boolean): Double = {
      val est = rows.filter(r => pred(r._1)).map(_._5).sum
      val tru = truth.filter(r => pred(r._1)).map(_._2).sum.toDouble
      (est - tru) / tru
    }
    assert(math.abs(relErr(_ => true)) < 0.25)
    assert(math.abs(relErr(_ % 2 == 0)) < 0.25)
  }

  test("x185 epoch plan: hand-computed weights and epochs; invariants on the real corpus") {
    // source a: 4 tokens, source b: 16 → √-masses 2 and 4, den 6,
    // weights 1/3 and 2/3, T = 20 → epochs_a = (1/3)·20/4 = 5/3,
    // epochs_b = (2/3)·20/16 = 5/6. All doubles exact (perfect squares).
    val dir = java.nio.file.Files.createTempDirectory("x185").toString
    Seq((1L, "t1 t2 t3 t4", "a"), (2L, (1 to 16).map(i => s"u$i").mkString(" "), "b"))
      .toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x185_epoch_plan")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got("a").getAs[Double]("mix_weight") == 1.0 / 3)
    assert(got("b").getAs[Double]("mix_weight") == 2.0 / 3)
    assert(got("a").getAs[Double]("epochs") == 1.0 / 3 * 20 / 4)
    assert(got("b").getAs[Double]("epochs") == 2.0 / 3 * 20 / 16)
    // real corpus: weights sum to 1; √ preserves the size ordering of
    // weights but REVERSES it for epochs (w·T/tok ∝ 1/√tok — smaller
    // sources get more passes, the whole point of temperature mixing)
    val rows = SparkEntry.queries("x185_epoch_plan")(spark, sf).collect()
    assert(math.abs(rows.map(_.getAs[Double]("mix_weight")).sum - 1.0) < 1e-12)
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(byTok.map(_.getAs[Double]("mix_weight")).toSeq ==
      byTok.map(_.getAs[Double]("mix_weight")).sortBy(identity).toSeq)
    assert(byTok.map(_.getAs[Double]("epochs")).toSeq ==
      byTok.map(_.getAs[Double]("epochs")).sortBy(identity).reverse.toSeq)
    rows.foreach(r => assert(r.getAs[Double]("epochs") > 0))
  }

  test("x190 UniMax: caps respected, uncapped shares equal, budget exactly allocated") {
    val rows = ext.Sampling.unimaxMix.fn(spark, sf).collect().toSeq
    assert(rows.size >= 2)
    val totalToks = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = 1.5 * totalToks
    val (capped, uncapped) = rows.partition(_.getAs[Long]("capped") == 1L)
    // budget = 1.5 corpus passes < 2 = cap passes, so someone is uncapped
    assert(uncapped.nonEmpty)
    // capped languages sit EXACTLY at the cap: alloc = cap = 2·toks,
    // epochs = 2.0 bit-exactly (one exact integer-to-double conversion)
    capped.foreach { r =>
      assert(r.getAs[Double]("alloc_tokens") ===
        r.getAs[Long]("cap_tokens").toDouble)
      assert(r.getAs[Double]("epochs") === 2.0)
      assert(r.getAs[Long]("cap_tokens") === 2 * r.getAs[Long]("n_tokens"))
    }
    // every uncapped language receives the SAME share (bit-equal: the
    // one tstar scalar), and it is below their caps
    val shares = uncapped.map(_.getAs[Double]("alloc_tokens")).distinct
    assert(shares.size === 1)
    uncapped.foreach { r =>
      assert(r.getAs[Double]("alloc_tokens") <=
        r.getAs[Long]("cap_tokens").toDouble)
      assert(r.getAs[Double]("epochs") <= 2.0)
    }
    // the whole budget is allocated (sum of ≤|langs| doubles: 1e-9 rel)
    val alloc = rows.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(alloc - budget) / budget < 1e-9, s"$alloc vs $budget")
    // capped-iff rule: capped exactly when the cap is below the final
    // uniform share
    val tstar = shares.head
    rows.foreach { r =>
      val isCapped = r.getAs[Long]("capped") == 1L
      if (isCapped) assert(r.getAs[Long]("cap_tokens").toDouble <= tstar)
    }
  }

  test("x190 waterfill crafted: hand-computed mixed branch; all-capped leaves budget unspent") {
    def per(rows: (String, Long)*) =
      rows.toSeq.toDF("lang", "toks")
        .withColumn("n_docs", lit(1L))
        .withColumn("cap", lit(2L) * col("toks"))
        .select(col("lang"), col("n_docs"), col("toks"), col("cap"))
    // mixed: caps 2,20,20 at budget 1.0·21 = 21 (exact) → a capped at 2;
    // b,c share (21−2)/2 = 9.5 each (exact dyadic arithmetic throughout)
    val mixed = ext.Sampling.waterfill(
      per(("a", 1L), ("b", 10L), ("c", 10L)), budgetPasses = 1.0)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("capped"), r.getAs[Double]("alloc_tokens"))).toMap
    assert(mixed("a") === ((1L, 2.0)))
    assert(mixed("b") === ((0L, 9.5)))
    assert(mixed("c") === ((0L, 9.5)))
    // all-capped (budget ≥ Σcaps): the share table is EMPTY, the left
    // join must not drop rows, every language allocates its cap, and
    // the leftover budget stays unspent
    val full = ext.Sampling.waterfill(
      per(("a", 1L), ("b", 10L)), budgetPasses = 3.0)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("capped"), r.getAs[Double]("alloc_tokens"),
          r.getAs[Double]("epochs"))).toMap
    assert(full.size === 2)
    assert(full("a") === ((1L, 2.0, 2.0)))
    assert(full("b") === ((1L, 20.0, 2.0)))
  }
}
