package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Incremental bitmap distinct: any batch split ORs to the identical word
  * table (incremental == from-scratch, exactly), the counts view agrees
  * with x93's batch query, and the mapGroupsWithState form carries one
  * long per occupied word across micro-batches. */
class BitmapFeedSpec extends SparkSuite {
  import spark.implicits._
  import graft.streaming.BitmapFeed

  private def events(rows: Seq[(Long, String)]) =
    rows.toDF("user_id", "event_type")

  private def emptyStore =
    events(Nil).select(col("event_type"),
      lit(0L).as("word_idx"), lit(0L).as("word")).limit(0)

  private def oneShot(rows: Seq[(Long, String)]): Map[(String, Long), Long] =
    BitmapFeed.applyBatch(emptyStore, events(rows))
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("incremental applyBatch over any split equals the one-shot word table") {
    val rows = (0 until 600).map(i => ((i * 13 % 333).toLong, if (i % 3 == 0) "a" else "b"))
    val whole = oneShot(rows)
    var store = emptyStore
    Seq(rows.take(70), rows.slice(70, 400), rows.drop(400)).foreach { part =>
      store = BitmapFeed.applyBatch(store, events(part)).localCheckpoint()
    }
    val inc = store.as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(inc === whole)
    // counts view = exact distinct per type
    val got = BitmapFeed.counts(store).as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val exact = rows.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).distinct.size.toLong }
    assert(got === exact)
  }

  test("feed counts agree with the registered x93 batch query on real data") {
    val ev = Tables.events(spark, sf).select(col("user_id"), col("event_type"))
    val store = BitmapFeed.applyBatch(emptyStore, ev)
    val feed = BitmapFeed.counts(store)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val batch = ext.Bitmap.bitmapDistinct.fn(spark, sf)
      .select(col("event_type"), col("n_users"), col("n_words"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(feed === batch)
  }

  test("mapGroupsWithState stream across micro-batches equals the batch store") {
    val b1 = (0 until 200).map(i => ((i * 7 % 150).toLong, "a"))
    val b2 = (0 until 200).map(i => ((i * 11 % 260).toLong, "a"))
    val mem = MemoryStream[(Long, String)](spark)
    val q = BitmapFeed.wordStream(mem.toDF().toDF("user_id", "event_type"))
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("bitmap_feed")
      .start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // last Update row per (type, word) is the live word after both batches
    val last = spark.table("bitmap_feed")
      .as[(String, Long, Long, Int)].collect().toSeq
      .zipWithIndex.groupBy(r => (r._1._1, r._1._2))
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1._3 }
    val whole = oneShot(b1 ++ b2)
    assert(last === whole)
    // population invariant: pop == bitCount(word) on every emitted row
    assert(spark.table("bitmap_feed").as[(String, Long, Long, Int)].collect()
      .forall(r => r._4 === java.lang.Long.bitCount(r._3)))
  }
}
