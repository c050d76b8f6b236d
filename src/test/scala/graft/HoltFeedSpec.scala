package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HoltFeed: incremental Holt state must equal the x139 batch query
  * bit-for-bit under any day-complete batch split, replaying an old
  * batch must be a no-op, and fresh keys must seed exactly as the batch
  * query does. */
class HoltFeedSpec extends SparkSuite {
  import spark.implicits._

  private def emptyStore: DataFrame =
    Seq.empty[(String, java.sql.Date, Long, Long, Long, Long)]
      .toDF("event_type", "last_day", "l", "b", "n_days", "n_ignored")

  private def chunk(lo: Int, hi: Int): DataFrame =
    Tables.events(spark, sf)
      .filter(dayofmonth(to_date(col("ts"))).between(lo, hi))

  private def snap(df: DataFrame): Set[(String, Long, Long, Long, Long, Double, Double, Double)] =
    streaming.HoltFeed.forecasts(df)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSet

  test("three day-split batches reproduce the x139 batch state exactly") {
    var store = emptyStore
    Seq((1, 10), (11, 20), (21, 31)).foreach { case (lo, hi) =>
      store = streaming.HoltFeed.applyBatch(store, chunk(lo, hi))
        .localCheckpoint()
    }
    val batch = analytics.Trend.holtForecast.fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSet
    assert(snap(store) === batch)
  }

  test("replaying an already-folded batch is a no-op") {
    var store = emptyStore
    store = streaming.HoltFeed.applyBatch(store, chunk(1, 15)).localCheckpoint()
    val after = streaming.HoltFeed.applyBatch(store, chunk(16, 31)).localCheckpoint()
    val replayed = streaming.HoltFeed.applyBatch(after, chunk(1, 15))
    assert(snap(replayed) === snap(after))
    // and so is an empty batch
    val empt = streaming.HoltFeed.applyBatch(after, chunk(1, 31).limit(0))
    assert(snap(empt) === snap(after))
  }

  test("ignored-day counter makes contract violations observable") {
    var store = streaming.HoltFeed.applyBatch(emptyStore, chunk(1, 31))
      .localCheckpoint()
    def ignored() = store.select(col("event_type"), col("n_ignored"))
      .as[(String, Long)].collect().toMap
    // a clean day-complete run never drops anything
    assert(ignored().values.forall(_ === 0L))
    // a replay (or a late correction to a folded day) is absorbed as a
    // state no-op but COUNTED: one increment per dropped (key, day) row
    val lateDays = chunk(10, 12)
    val perKeyLate = lateDays
      .groupBy(col("event_type")).agg(countDistinct(to_date(col("ts"))).as("nd"))
      .as[(String, Long)].collect().toMap
    val before = ignored()
    store = streaming.HoltFeed.applyBatch(store, lateDays).localCheckpoint()
    val after = ignored()
    perKeyLate.foreach { case (k, nd) =>
      assert(after(k) - before(k) === nd, s"key $k")
    }
  }

  test("a legacy 5-column state table (no n_ignored) upgrades on read") {
    // state persisted by the pre-n_ignored version of the feed: same
    // rows, missing the counter column — the first post-upgrade batch
    // must fold it instead of failing analysis
    val modern = streaming.HoltFeed.applyBatch(emptyStore, chunk(1, 15))
      .localCheckpoint()
    val legacy = modern.drop("n_ignored").localCheckpoint()
    val fromLegacy = streaming.HoltFeed.applyBatch(legacy, chunk(16, 31))
    val fromModern = streaming.HoltFeed.applyBatch(modern, chunk(16, 31))
    assert(snap(fromLegacy) === snap(fromModern))
    // the migrated counter seeds at 0 and counts from the upgrade on
    val replayed = streaming.HoltFeed.applyBatch(
      fromLegacy.localCheckpoint(), chunk(16, 20))
    val ign = replayed.select(col("event_type"), col("n_ignored"))
      .as[(String, Long)].collect().toMap
    assert(ign.values.exists(_ > 0L), "post-upgrade replays must be counted")
  }

  test("one-shot apply equals the batch query (fresh-key seeding path)") {
    val store = streaming.HoltFeed.applyBatch(emptyStore, chunk(1, 31))
    val batch = analytics.Trend.holtForecast.fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSet
    assert(snap(store) === batch)
  }
}
