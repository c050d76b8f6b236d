package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x66 KMV sketch: the oracle replays the estimator end-to-end on the
  * real log; this pins the Scala-model equivalence of the bounded
  * aggregator (distinct min-k under duplicates, hostile partitioning,
  * merge associativity) and the small-group NULL contract. */
class KmvSpec extends SparkSuite {
  import spark.implicits._
  import graft.ext.Kmv

  private val P = 1000003L
  private val Kn = 2654435761L % P
  private def h(u: Long): Long = ((u % P) * Kn) % P

  private def write(dir: String, rows: Seq[(Long, Long, String)]): Unit =
    rows.zipWithIndex.map { case ((eid, u, t), i) =>
      (eid, Timestamp.valueOf(s"2024-01-01 00:00:${i % 60}"), u, t, 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("sketch matches the plain-Scala KMV model; small groups yield NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv").toString
    // type a: 100 distinct users, each seen twice (duplicates must not
    // occupy sketch slots); type b: only 10 users -> below k, NULL sketch
    val rows =
      (1L to 100L).flatMap(u => Seq((u, u, "a"), (u + 1000L, u, "a"))) ++
        (1L to 10L).map(u => (u + 5000L, u, "b"))
    write(dir, rows.zipWithIndex.map { case ((e, u, t), i) => (i.toLong, u, t) })
    val got = ext.Kmv.kmvDistinct.fn(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val expectedHk = (1L to 100L).map(h).distinct.sorted.apply(31)
    assert(got("a") === ((100L, Some(expectedHk), Some(31L * P / expectedHk))))
    assert(got("b")._1 === 10L)
    assert(got("b")._2 === None && got("b")._3 === None)
    // the estimate is in the right ballpark for n ~ 3x k
    val est = got("a")._3.get
    assert(est > 50L && est < 200L, s"estimate $est implausible for n=100")
  }

  test("BoundedDistinctMinK: duplicate suppression + capped merge") {
    val agg = new Kmv.BoundedDistinctMinK(4)
    val b = Seq(9L, 3L, 9L, 7L, 3L, 1L, 8L).foldLeft(agg.zero)(agg.reduce)
    assert(b.toSeq === Seq(1L, 3L, 7L, 8L)) // distinct smallest 4
    val other = Seq(2L, 3L, 99L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b, other).toSeq === Seq(1L, 2L, 3L, 7L))
    assert(agg.merge(other, b).toSeq === Seq(1L, 2L, 3L, 7L)) // commutative
    assert(agg.reduce(agg.zero, 5L).toSeq === Seq(5L))
  }

  test("hostile partitioning: per-partition partials merge to the same sketch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv2").toString
    write(dir, (0 until 300).map(i => (i.toLong, (i % 80).toLong, "a")))
    val base = ext.Kmv.kmvDistinct.fn(spark, dir).collect().map(_.toSeq).toSeq
    // same rows, adversarial physical layout
    val shuffled = spark.read.parquet(s"$dir/events.parquet")
      .repartition(7, col("event_id"))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-kmv3").toString
    shuffled.write.parquet(s"$dir2/events.parquet")
    val got = ext.Kmv.kmvDistinct.fn(spark, dir2).collect().map(_.toSeq).toSeq
    assert(got === base)
  }

  test("x98 small sets: sketches are exact, estimate IS the true overlap") {
    // all sets < k=32 distinct users and ids < P (hash injective there):
    // a∩b = {10,11,12} (3), a∩c = {} (0), b∩c = {20} (1)
    val dir = java.nio.file.Files.createTempDirectory("graft-kmvi").toString
    val a = Seq(10L, 11L, 12L, 13L, 14L)
    val b = Seq(10L, 11L, 12L, 20L)
    val c = Seq(20L, 30L, 31L)
    write(dir, (a.map(("a", _)) ++ b.map(("b", _)) ++ c.map(("c", _)))
      .zipWithIndex.map { case ((t, u), i) => (i.toLong, u, t) })
    val got = ext.Kmv.kmvIntersect.fn(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got === Map(
      ("a", "b") -> ((3L, 3L, 3L)),
      ("a", "c") -> ((0L, 0L, 0L)),
      ("b", "c") -> ((1L, 1L, 1L))))
  }

  test("x98 real log: every pair present; matches bounded by k; estimator sane") {
    val rows = ext.Kmv.kmvIntersect.fn(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    val types = Tables.events(spark, sf).select(col("event_type"))
      .distinct().count().toInt
    assert(rows.length === types * (types - 1) / 2)
    for ((ta, tb, exact, matches, est) <- rows) {
      assert(ta < tb)
      assert(matches >= 0 && matches <= 32)
      assert(est >= 0, s"($ta,$tb)")
      // k=32 → ~18% std error on the union; be generous but not vacuous
      if (exact > 1000)
        assert(math.abs(est - exact).toDouble / exact < 0.75, s"($ta,$tb): est $est vs $exact")
    }
  }
}
