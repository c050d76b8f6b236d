package graft

import java.sql.Timestamp

/** x67 gap filling: the oracle pins the dense grid on the real log; this
  * pins the zero-fill semantics the real data may never exercise — a
  * type silent for a middle week emits an explicit zero, the spine spans
  * the GLOBAL min..max (a type missing the boundary weeks still gets
  * rows), and the output is exactly |types| × |weeks| dense. */
class SpineSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.zipWithIndex.map { case ((u, ts, t), i) =>
      (i.toLong, Timestamp.valueOf(ts), u, t, 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("middle-week gaps zero-fill; spine is global and dense") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spine").toString
    // 3 consecutive weeks; 'a' active in weeks 0 and 2 (gap at 1),
    // 'b' only in week 1 (gaps at both boundaries)
    write(dir, Seq(
      (1L, "2024-01-04 10:00:00", "a"),
      (1L, "2024-01-18 10:00:00", "a"),
      (2L, "2024-01-11 10:00:00", "b"),
      (2L, "2024-01-11 11:00:00", "b")))
    val got = analytics.Spine.gapfillWeekly.fn(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.length === 6, s"expected 2 types x 3 weeks, got $got")
    val byKey = got.map { case (t, w, n) => (t, w - got.map(_._2).min) -> n }.toMap
    assert(byKey(("a", 0L)) === 1L)
    assert(byKey(("a", 1L)) === 0L) // the explicit zero
    assert(byKey(("a", 2L)) === 1L)
    assert(byKey(("b", 0L)) === 0L)
    assert(byKey(("b", 1L)) === 2L)
    assert(byKey(("b", 2L)) === 0L)
  }

  test("single week collapses the spine to one row per type") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spine2").toString
    write(dir, Seq((1L, "2024-01-04 10:00:00", "a"), (2L, "2024-01-04 11:00:00", "b")))
    val got = analytics.Spine.gapfillWeekly.fn(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._3)).sorted === Seq(("a", 1L), ("b", 1L)))
  }
}
