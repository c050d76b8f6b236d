package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x65 EWMA surprise: the oracle pins bit-exact parity on the real log;
  * this pins the fold semantics on crafted input — seed is the FIRST
  * value (not zero), surprise measures against the PRE-update baseline,
  * α=1/4 arithmetic is exact on representable inputs, ties at the same
  * timestamp order by event_id, and a single-event user exercises the
  * empty-slice path. */
class AnomalySpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, String, Long, Double)]): Unit =
    rows.map { case (id, ts, u, v) =>
      (id, Timestamp.valueOf(ts), u, "view", v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def run(dir: String): Map[Long, (Long, Double, Double)] =
    analytics.Anomaly.ewmaSurprise.fn(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
      .map { case (u, n, e, m) => u -> ((n, e, m)) }.toMap

  test("crafted folds: constant user, spike user, singleton, same-ts tie") {
    val dir = java.nio.file.Files.createTempDirectory("graft-anomaly").toString
    write(dir, Seq(
      // u1 constant: ewma stays 5, surprise 0 (first value seeds, never a fake anomaly)
      (1L, "2024-01-01 00:00:01", 1L, 5.0),
      (2L, "2024-01-01 00:00:02", 1L, 5.0),
      (3L, "2024-01-01 00:00:03", 1L, 5.0),
      // u2 spike: 1,1,1 then 9 -> surprise |9-1|=8 BEFORE update, ewma (3+9)/4=3
      (4L, "2024-01-01 00:00:01", 2L, 1.0),
      (5L, "2024-01-01 00:00:02", 2L, 1.0),
      (6L, "2024-01-01 00:00:03", 2L, 1.0),
      (7L, "2024-01-01 00:00:04", 2L, 9.0),
      // u3 singleton: fold over the empty tail
      (8L, "2024-01-01 00:00:01", 3L, 7.0),
      // u4 same-timestamp tie: event_id orders 0 before 8 -> seed 0, e=(0*3+8)/4=2
      (9L, "2024-01-01 00:00:01", 4L, 0.0),
      (10L, "2024-01-01 00:00:01", 4L, 8.0)))
    val got = run(dir)
    assert(got(1L) === ((3L, 5.0, 0.0)))
    assert(got(2L) === ((4L, 3.0, 8.0)))
    assert(got(3L) === ((1L, 7.0, 0.0)))
    assert(got(4L) === ((2L, 2.0, 8.0)))
  }

  test("surprise is pre-update: a drift never beats the jump that caused it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-anomaly2").toString
    // 0 then repeated 8s: the FIRST 8 is the anomaly (|8-0|=8); later 8s
    // measure against an ewma drifting toward 8, so their surprise shrinks
    // (8-2=6, 8-3.5=4.5, ...). Post-update semantics would report 6 here.
    write(dir, (0 until 6).map(i =>
      (i.toLong, s"2024-01-01 00:00:0$i", 1L, if (i == 0) 0.0 else 8.0)))
    val got = run(dir)
    assert(got(1L)._3 === 8.0)
  }

  test("result is partitioning-invariant (the fold runs post-shuffle per user)") {
    // Same rows, two physical layouts: the default single-writer layout
    // vs a skewed value-keyed repartition with every partition sorted in
    // REVERSE event order — hostile to any fold that trusts file order.
    // The full result map must match (the KmeansSpec hostile-layout
    // pattern; asserting only counts never checks the invariance).
    val rows = (0 until 40).map(i =>
      (i.toLong, f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d", (i % 3).toLong, (i * 7 % 11).toDouble))
    val baseDir = java.nio.file.Files.createTempDirectory("graft-anomaly3").toString
    write(baseDir, rows)
    val base = run(baseDir)
    val hostileDir = java.nio.file.Files.createTempDirectory("graft-anomaly3h").toString
    rows.map { case (id, ts, u, v) =>
      (id, Timestamp.valueOf(ts), u, "view", v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(7, col("value")) // skewed, non-user layout
      .sortWithinPartitions(col("ts").desc, col("event_id").desc)
      .write.mode("overwrite").parquet(s"$hostileDir/events.parquet")
    val hostile = run(hostileDir)
    assert(base.size === 3)
    assert(base.values.map(_._1).sum === 40L)
    assert(hostile === base)
  }

  private def runDebounce(dir: String): Map[Long, (Long, Long, Long)] =
    analytics.Anomaly.debounce.fn(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, n, k, t) => u -> ((n, k, t)) }.toMap

  test("x83 crafted: burst collapses to one; dropped events never extend the window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-debounce").toString
    // 6h window. u1: burst of 3 within an hour (keep first only), then
    // one at +6h from the KEPT event (kept — the 5h-later dropped event
    // must NOT have reset the clock). u2: singleton. u3: exact-boundary
    // event at precisely +6h (kept: >= is inclusive).
    write(dir, Seq(
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (2L, "2024-01-01 01:00:00", 1L, 1.0), // dropped (1h after kept)
      (3L, "2024-01-01 05:00:00", 1L, 1.0), // dropped (5h after kept)
      (4L, "2024-01-01 06:00:00", 1L, 1.0), // KEPT: 6h after event 1
      (5L, "2024-02-01 00:00:00", 2L, 1.0),
      (6L, "2024-03-01 00:00:00", 3L, 1.0),
      (7L, "2024-03-01 06:00:00", 3L, 1.0))) // KEPT: boundary inclusive
    def us(t: String) = Timestamp.valueOf(t).getTime * 1000L
    assert(runDebounce(dir) === Map(
      1L -> ((4L, 2L, us("2024-01-01 06:00:00"))),
      2L -> ((1L, 1L, us("2024-02-01 00:00:00"))),
      3L -> ((2L, 2L, us("2024-03-01 06:00:00")))))
  }

  test("x83 is partitioning-invariant (packed fold runs post-shuffle per user)") {
    val rows = (0 until 60).map(i =>
      (i.toLong, f"2024-01-0${1 + i % 9} ${i * 3 % 24}%02d:00:00", (i % 4).toLong, 1.0))
    val baseDir = java.nio.file.Files.createTempDirectory("graft-debounce2").toString
    write(baseDir, rows)
    val base = runDebounce(baseDir)
    val hostileDir = java.nio.file.Files.createTempDirectory("graft-debounce2h").toString
    rows.map { case (id, ts, u, v) =>
      (id, Timestamp.valueOf(ts), u, "view", v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(7, col("event_id"))
      .sortWithinPartitions(col("ts").desc, col("event_id").desc)
      .write.mode("overwrite").parquet(s"$hostileDir/events.parquet")
    assert(runDebounce(hostileDir) === base)
    assert(base.size === 4)
  }

  test("x152 crafted: the spike is flagged and cannot drag the baseline") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-hampel").toString
    // 9 days of 5 events, except day 8 spikes to 50
    val counts = (1 to 9).map(d => d -> (if (d == 8) 50 else 5))
    val rows = counts.flatMap { case (d, n) =>
      (1 to n).map(i => ((d * 1000 + i).toLong,
        Timestamp.valueOf(f"2024-01-$d%02d 08:00:00"), 1L, "view", 1.0, "")) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = analytics.Anomaly.hampelOutliers.fn(spark, dir)
      .as[(String, java.sql.Date, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2.toString -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    // day 8: window has six 5s + 50 → med 5, MAD 0, dev 45 → flagged
    assert(got("2024-01-08") === ((50L, 5L, 0L, 45L, 1L)))
    // day 9: the spike sits INSIDE the trailing window but the median
    // baseline ignores it — med still 5, day 9 unflagged
    assert(got("2024-01-09") === ((5L, 5L, 0L, 0L, 0L)))
    // no other day flagged
    assert(got.values.map(_._5).sum === 1L)
  }

  test("x152 real data: flags recompute from the returned row columns") {
    val rows = analytics.Anomaly.hampelOutliers.fn(spark, sf)
      .as[(String, java.sql.Date, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, y, med, mad, dev, fl) =>
      assert(dev === math.abs(y - med))
      assert((fl == 1L) === (dev > 3 * mad))
    }
  }
}
