package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TrailingFeed — x121's rolling WAU as continuous ingestion: any batch
  * split merges to the identical store (bit_or algebra), the current
  * window equals the x121 batch query's answer at the high-water week,
  * and week retirement bounds the store without touching the answer. */
class TrailingFeedSpec extends SparkSuite {
  import spark.implicits._
  import graft.streaming.TrailingFeed

  /** (user, type, iso-date) events frame. */
  private def events(rows: Seq[(Long, String, String)]): DataFrame =
    rows.zipWithIndex.map { case ((u, t, d), i) =>
      (i.toLong, Timestamp.valueOf(d + " 12:00:00"), u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  private val rows: Seq[(Long, String, String)] = {
    // 6 calendar weeks starting Mon 2024-01-01; users revisit across weeks
    val weeks = (0 until 6).map(w =>
      java.time.LocalDate.of(2024, 1, 2).plusWeeks(w).toString)
    (0 until 400).map { i =>
      ((i * 7 % 83).toLong, if (i % 4 == 0) "click" else "view", weeks(i % 6))
    }
  }

  test("incremental over any split equals one-shot; current window equals x121 at high water") {
    val whole = TrailingFeed.applyBatch(
      TrailingFeed.emptyStore(spark), events(rows))
      .as[(String, java.sql.Date, Long, Long)].collect().toSet
    var store = TrailingFeed.emptyStore(spark)
    Seq(rows.take(50), rows.slice(50, 260), rows.drop(260)).foreach { part =>
      store = TrailingFeed.applyBatch(store, events(part)).localCheckpoint()
    }
    assert(store.as[(String, java.sql.Date, Long, Long)].collect().toSet === whole)
    // against the x121 batch query at the feed's single answerable end week
    val dir = java.nio.file.Files.createTempDirectory("graft-tf").toString
    events(rows).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batchAtHw = analytics.Temporal.trailingDistinct.fn(spark, dir)
      .as[(String, java.sql.Date, Long)].collect()
    val hw = batchAtHw.map(_._2).max
    val want = batchAtHw.filter(_._2 == hw).map(r => r._1 -> r._3).toMap
    val got = TrailingFeed.currentWindow(store)
      .as[(String, java.sql.Date, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got === want)
  }

  test("retirement: store never holds more than WindowWeeks distinct weeks, answer unchanged") {
    var store = TrailingFeed.emptyStore(spark)
    // feed week by week — after each batch the store must retain ≤ 4 weeks
    rows.groupBy(_._3).toSeq.sortBy(_._1).foreach { case (_, part) =>
      store = TrailingFeed.applyBatch(store, events(part)).localCheckpoint()
      val weeks = store.select(col("wk")).distinct().count()
      assert(weeks <= TrailingFeed.WindowWeeks)
    }
    // chronological feed ends at the true high-water week: same answer
    // as the split-agnostic store of the previous test
    val all = TrailingFeed.applyBatch(TrailingFeed.emptyStore(spark), events(rows))
    assert(TrailingFeed.currentWindow(store)
      .as[(String, java.sql.Date, Long)].collect().toSet
      === TrailingFeed.currentWindow(all)
        .as[(String, java.sql.Date, Long)].collect().toSet)
  }
}
