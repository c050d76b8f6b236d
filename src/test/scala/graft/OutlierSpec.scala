package graft

import graft.ext.Outlier
import org.apache.spark.sql.functions._

/** x47 embedding outlier detection: the oracle pins values; this pins
  * DETECTION — on the clean corpus nothing fires (concentration of
  * measure), and planted far-out junk of the kinds encoders actually
  * produce (runaway norms, one-hot spikes) trips the 2× cut — while a
  * zero vector lands near the centroid of a direction-balanced corpus
  * and correctly does NOT (that failure mode is a norm check). */
class OutlierSpec extends SparkSuite {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf)

  test("clean corpus: no outliers (concentration of measure)") {
    assert(Outlier.pipeline(emb).filter($"outlier").isEmpty)
  }

  test("planted junk trips the flag; clean rows still don't") {
    val dim = 64
    val junk = Seq(
      (900001L, Array.fill(dim)(0f)),            // zeros: near-centroid, must NOT flag
      (900002L, Array.fill(dim)(3f)),            // runaway norm
      (900003L, Array.tabulate(dim)(i => if (i == 0) 8f else 0f))) // one-hot spike
      .toDF("vec_id", "embedding")
    val out = Outlier.pipeline(emb.select($"vec_id", $"embedding").unionByName(junk))
      .cache()
    val flagged = out.filter($"outlier").select($"vec_id").as[Long].collect().toSet
    assert(Set(900002L, 900003L).subsetOf(flagged),
      s"planted far-out rows must flag, got $flagged")
    assert(!flagged.contains(900001L),
      "zero vector sits near a direction-balanced centroid; must not flag")
    // 3 junk rows among 500 barely move the mean: the clean corpus must
    // stay below the cut.
    assert(flagged.forall(_ >= 900001L), s"clean rows flagged: $flagged")
    out.unpersist()
  }

  test("dist2 is exactly reproducible run-to-run (integer domain)") {
    val a = Outlier.pipeline(emb).agg(sum($"dist2")).as[Long].head()
    val b = Outlier.pipeline(emb.repartition(7)).agg(sum($"dist2")).as[Long].head()
    assert(a == b)
  }
}
