package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x58 cohort retention: the oracle pins the grid on the real log; this
  * pins the semantics on crafted input — cohort = integer-week of first
  * event, offsets count DISTINCT active weeks (duplicate events in a week
  * collapse), gaps produce no row, and diagonal sums equal per-week
  * distinct-actives. */
class CohortSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, String, Long)]): Unit =
    rows.map { case (id, ts, u) =>
      (id, Timestamp.valueOf(ts), u, "view", 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("crafted grid: first week defines cohort, dup events collapse, gaps skip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cohort").toString
    // Week boundaries in epoch-us weeks: 2024-01-04 and 2024-01-11 are in
    // consecutive integer weeks; 2024-01-25 is three weeks after the first.
    write(dir, Seq(
      // u1: weeks w, w+1, and (twice) w+3 - offsets 0,1,3; no offset 2
      (1L, "2024-01-04 10:00:00", 1L),
      (2L, "2024-01-11 10:00:00", 1L),
      (3L, "2024-01-25 09:00:00", 1L),
      (4L, "2024-01-25 10:00:00", 1L),
      // u2: joins a week later, active only that week - single offset-0 row
      (5L, "2024-01-11 12:00:00", 2L)))
    val got = analytics.Cohort.retention.fn(spark, dir)
      .select($"cohort_week", $"week_offset", $"n_users")
      .as[(Long, Long, Long)].collect().toSeq
    val byCohort = got.groupBy(_._1)
    assert(byCohort.size === 2)
    val Seq(c1, c2) = got.map(_._1).distinct.sorted
    assert(byCohort(c1).map(t => (t._2, t._3)) === Seq((0L, 1L), (1L, 1L), (3L, 1L)))
    assert(byCohort(c2).map(t => (t._2, t._3)) === Seq((0L, 1L)))
    assert(c2 === c1 + 1)
  }

  test("real log: offset-0 row equals cohort size; counts never exceed it") {
    val rows = analytics.Cohort.retention.fn(spark, sf)
      .select($"cohort_week", $"week_offset", $"n_users")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, grid) =>
      val size0 = grid.find(_._2 == 0L).map(_._3)
      assert(size0.nonEmpty, "every cohort is active in its own first week")
      assert(grid.forall(_._3 <= size0.get), "no offset outdraws the cohort itself")
      assert(grid.forall(_._2 >= 0L), "offsets are never negative")
    }
    // grand total of offset-0 rows = total distinct users in the log
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.filter(_._2 == 0L).map(_._3).sum === users)
  }
}
