package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x136 Kaplan–Meier: the oracle pins bit-exact parity on the real log;
  * these pin the estimator's semantics on crafted histories — death vs
  * right-censor bookkeeping, the same-day death+censor convention
  * (censored users count in that step's risk set, leave after), and that
  * the executor-side `aggregate` HOF fold equals a scalar sequential
  * replay of the scaled-integer product on real data. */
class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, String, Long, String)]): Unit =
    rows.map { case (id, ts, u, et) =>
      (id, Timestamp.valueOf(ts), u, et, 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def run(dir: String): Seq[(Long, Long, Long, Long, Long, Double)] =
    analytics.Survival.kmSurvival.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq

  test("crafted: deaths step the curve, censored leave without stepping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-km").toString
    write(dir, Seq(
      // u1, u2: first event day 1, first error day 3 → deaths at t=2
      (1L, "2024-01-01 08:00:00", 1L, "view"),
      (2L, "2024-01-03 08:00:00", 1L, "error"),
      (3L, "2024-01-01 09:00:00", 2L, "view"),
      (4L, "2024-01-03 09:00:00", 2L, "error"),
      // u3: no error, last event day 4 → censored at t=3
      (5L, "2024-01-01 10:00:00", 3L, "view"),
      (6L, "2024-01-04 10:00:00", 3L, "click"),
      // u4: first error day 6 → death at t=5 (a later error is ignored)
      (7L, "2024-01-01 11:00:00", 4L, "view"),
      (8L, "2024-01-06 11:00:00", 4L, "error"),
      (9L, "2024-01-07 11:00:00", 4L, "error")))
    val got = run(dir)
    // t=2: n=4 d=2 → S = 1e9·2 div 4; t=3: censor only, S unchanged;
    // t=5: n=1 d=1 → S = 0
    assert(got === Seq(
      (2L, 4L, 2L, 0L, 500000000L, 0.5),
      (3L, 2L, 0L, 1L, 500000000L, 0.5),
      (5L, 1L, 1L, 0L, 0L, 0.0)))
  }

  test("crafted: same-day death and censor share the risk set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-km2").toString
    write(dir, Seq(
      (1L, "2024-01-01 08:00:00", 1L, "view"),
      (2L, "2024-01-03 08:00:00", 1L, "error"), // death at t=2
      (3L, "2024-01-01 09:00:00", 2L, "view"),
      (4L, "2024-01-03 09:00:00", 2L, "click"))) // censored at t=2
    val got = run(dir)
    // one axis row: n_risk=2 counts BOTH; d=1, c=1 → S = 1e9·1 div 2
    assert(got === Seq((2L, 2L, 1L, 1L, 500000000L, 0.5)))
  }

  test("real data: the HOF fold equals a scalar sequential replay") {
    val axis = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"),
        min(when(col("event_type") === "error", to_date(col("ts")))).as("fe"))
      .select(datediff(coalesce(col("fe"), col("ld")), col("fd")).cast("long")
          .as("t"),
        when(col("fe").isNull, 1L).otherwise(0L).as("cens"))
      .groupBy(col("t"))
      .agg(sum(lit(1L) - col("cens")).as("d"), count(lit(1)).as("cnt"))
      .orderBy(col("t"))
      .as[(Long, Long, Long)].collect()
    val total = axis.map(_._3).sum
    var atRisk = total
    var s = 1000000000L
    val expect = axis.map { case (t, d, cnt) =>
      s = s * (atRisk - d) / atRisk // div == / on nonneg longs
      val row = (t, atRisk, s)
      atRisk -= cnt
      row
    }.toSeq
    val got = run(sf).map(r => (r._1, r._2, r._5))
    assert(got === expect)
    // the curve must actually move on real data (non-degenerate demo)
    assert(got.last._3 < 1000000000L)
  }
}
