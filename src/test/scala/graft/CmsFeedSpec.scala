package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Incremental CMS: any batch split folds to the identical counter grid
  * (vector addition made operational), the streaming mapGroupsWithState
  * form agrees with the batch grid across micro-batches, and estimates
  * are one-sided (≥ true count; 0 for never-seen keys) at every point
  * in the stream. */
class CmsFeedSpec extends SparkSuite {
  import spark.implicits._
  import graft.streaming.CmsFeed

  private def events(rows: Seq[(Long, String)]) =
    rows.toDF("user_id", "event_type")

  private def emptyStore =
    events(Nil).select(col("event_type"), lit(0L).as("idx"), lit(0L).as("c")).limit(0)

  private def gridOf(store: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    store.as[(String, Long, Long)].collect().map { case (t, i, c) => (t, i) -> c }.toMap

  test("incremental applyBatch over any split equals the one-shot grid") {
    val rows = (0 until 600).map(i => ((i * 13 % 37).toLong, if (i % 3 == 0) "a" else "b"))
    val whole = gridOf(CmsFeed.applyBatch(emptyStore, events(rows)))
    var store = emptyStore
    Seq(rows.take(70), rows.slice(70, 400), rows.drop(400)).foreach { part =>
      store = CmsFeed.applyBatch(store, events(part)).localCheckpoint()
    }
    assert(gridOf(store) === whole)
    // total mass per lane equals the event count (nothing lost or double-counted)
    val perLane = whole.groupBy { case ((_, i), _) => i / 16 }
      .map { case (lane, cells) => lane -> cells.values.sum }
    assert(perLane.values.toSet === Set(rows.size.toLong))
  }

  test("estimates are one-sided at every split point; never-seen keys read 0") {
    val rows = (0 until 600).map(i => ((i * 7 % 23).toLong, "a"))
    val store = CmsFeed.applyBatch(emptyStore, events(rows))
    val exact = rows.groupBy(identity).map { case ((u, t), g) => (t, u) -> g.size.toLong }
    val keys = (0 until 23).map(u => (u.toLong, "a")) ++ Seq((9999L, "a"))
    val est = CmsFeed.estimates(store, events(keys))
      .as[(String, Long, Long)].collect()
      .map { case (t, u, e) => (t, u) -> e }.toMap
    for (((t, u), ex) <- exact)
      assert(est((t, u)) >= ex, s"CMS underestimated ($t,$u)")
    assert(est(("a", 9999L)) === 0L, "never-seen key must estimate 0")
  }

  test("mapGroupsWithState stream across micro-batches equals the batch grid") {
    val b1 = (0 until 200).map(i => ((i * 7 % 29).toLong, "a"))
    val b2 = (0 until 200).map(i => ((i * 11 % 31).toLong, "a"))
    val mem = MemoryStream[(Long, String)](spark)
    val q = CmsFeed.sketchStream(mem.toDF().toDF("user_id", "event_type"))
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cms_feed")
      .start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("cms_feed")
      .as[(String, Long, Seq[Long])].collect().toSeq
      .zipWithIndex.groupBy(_._1._1).map { case (_, rs) => rs.maxBy(_._2)._1 }
      .map(r => r._1 -> r._3).head._2
    val whole = gridOf(CmsFeed.applyBatch(emptyStore, events(b1 ++ b2)))
    val expected = (0 until CmsFeed.Cells).map(i => whole.getOrElse(("a", i.toLong), 0L))
    assert(last.toSeq === expected)
  }
}
