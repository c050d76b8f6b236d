package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x93 bitmap distinct: the oracle pins COUNT(DISTINCT) parity on the real
  * tables; these pin the word/bit mechanics at the 64-boundary, agreement
  * with countDistinct on real data, layout invariance (bit_or is
  * order-independent), and the plan shape (pure hash aggregation).
  */
class BitmapSpec extends SparkSuite {
  import spark.implicits._

  private def writeEvents(dir: String, rows: Seq[(Long, Long, String)]): Unit =
    rows.map { case (id, uid, et) =>
      (id, Timestamp.valueOf("2024-01-01 00:00:00"), uid, et, 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("x93 crafted: word boundaries at 63/64/127/128, duplicates collapse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bitmap").toString
    writeEvents(dir, Seq(
      // type a: users {0,63} word 0, {64,127} word 1, {128} word 2; user 0
      // and 64 seen twice — n_users 5, n_words 3, n_events 7
      (1L, 0L, "a"), (2L, 63L, "a"), (3L, 64L, "a"), (4L, 64L, "a"),
      (5L, 127L, "a"), (6L, 128L, "a"), (7L, 0L, "a"),
      // type b: one user in word 15
      (8L, 1000L, "b")))
    val got = ext.Bitmap.bitmapDistinct.fn(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map("a" -> ((5L, 3L, 7L)), "b" -> ((1L, 1L, 1L))))
  }

  test("x93 agrees with countDistinct on real data") {
    val got = ext.Bitmap.bitmapDistinct.fn(spark, sf)
      .select(col("event_type"), col("n_users")).as[(String, Long)].collect().toMap
    val ref = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === ref)
  }

  test("x93 result is identical under a hostile physical layout") {
    val base = ext.Bitmap.bitmapDistinct.fn(spark, sf).collect().toSeq
    val hostile = java.nio.file.Files.createTempDirectory("graft-bitmap-h").toString
    Tables.events(spark, sf).orderBy(col("user_id")).repartition(3)
      .write.mode("overwrite").parquet(s"$hostile/events.parquet")
    val got = ext.Bitmap.bitmapDistinct.fn(spark, hostile).collect().toSeq
    assert(got === base)
  }

  test("x93 plan: hash aggregation only — no expand, no sort aggregate, no join") {
    import org.apache.spark.sql.execution.joins.{BaseJoinExec => J}
    val df = ext.Bitmap.bitmapDistinct.fn(spark, sf)
    df.count()
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[J]))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("SortAggregate")))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Expand")))
    assert(nodes.exists(_.getClass.getSimpleName.contains("HashAggregate")))
  }
}
