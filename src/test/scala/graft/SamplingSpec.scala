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
}
