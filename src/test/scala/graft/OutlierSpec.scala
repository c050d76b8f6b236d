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

  private def writeEvents(dir: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.map { case (id, et, v) =>
      (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, et, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def runMad(dir: String): Map[String, (Long, Double, Double, Long)] =
    Outlier.madOutliers.fn(spark, dir)
      .as[(String, Long, Double, Double, Long)].collect()
      .map { case (t, n, m, d, o) => t -> ((n, m, d, o)) }.toMap

  test("x84 crafted: hand-computed median/MAD, planted spike counted once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    // "a": values 1..9 → med 5, devs {4,3,2,1,0,1,2,3,4} → mad 2.
    // Cut 3·mad = 6: no |v−5| exceeds 6 → 0 outliers.
    // "b": 1..9 plus a 1000.0 spike → med 5.5, mad 2.5, cut 7.5:
    // only the spike (994.5) exceeds it.
    val a = (1 to 9).map(i => (i.toLong, "a", i.toDouble))
    val b = (1 to 9).map(i => (100L + i, "b", i.toDouble)) :+ ((110L, "b", 1000.0))
    writeEvents(dir, a ++ b)
    assert(runMad(dir) === Map(
      "a" -> ((9L, 5.0, 2.0, 0L)),
      "b" -> ((10L, 5.5, 2.5, 1L))))
  }

  test("x84 breakdown point: one corruption in nine leaves the robust pair intact") {
    val base = java.nio.file.Files.createTempDirectory("graft-mad-b").toString
    val corrupt = java.nio.file.Files.createTempDirectory("graft-mad-c").toString
    val clean = (1 to 9).map(i => (i.toLong, "a", i.toDouble))
    writeEvents(base, clean)
    // corrupt the TOP value by 5 orders of magnitude
    writeEvents(corrupt, clean.init :+ ((9L, "a", 900000.0)))
    val (_, medB, madB, _) = runMad(base)("a")
    val (_, medC, madC, _) = runMad(corrupt)("a")
    // median and MAD barely move (5→5, 2→2 — the corruption lands
    // strictly above both medians); mean/stddev would explode
    assert(medB === 5.0 && medC === 5.0)
    assert(madB === 2.0 && madC === 2.0)
  }
}
