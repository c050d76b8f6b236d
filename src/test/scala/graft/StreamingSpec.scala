package graft

import graft.streaming.WeeklyFeed
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming feed semantics, driven by real file drops (one parquet file
  * per "week") — micro-batch grain dedup, idempotent re-delivery, and the
  * tumbling weekly aggregation via a memory sink. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  private def eventsWeek(week: Int) = Tables.events(spark, sf)
    .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    .filter(weekofyear($"ts") === week)

  test("file-source feed: grain dedup + foreachBatch upsert, idempotent on re-delivery") {
    val store = tmpDir("store") + "/snap"; val cp1 = tmpDir("cp1")
    val flat = tmpDir("flat") // the watched drop directory
    eventsWeek(1).coalesce(1).write.mode("overwrite").parquet(flat)

    WeeklyFeed.runFeed(spark, flat, store, cp1).awaitTermination()
    val afterFirst = spark.read.parquet(store)
    val expectGrain = eventsWeek(1).select($"user_id", to_date($"ts").as("day"))
      .distinct().count()
    assert(afterFirst.count() === expectGrain)

    // drop week 2 + re-deliver week 1 (late/duplicate file): counts only grow
    // by week-2's new grain keys
    eventsWeek(2).coalesce(1).write.mode("append").parquet(flat)
    eventsWeek(1).coalesce(1).write.mode("append").parquet(flat)
    WeeklyFeed.runFeed(spark, flat, store, cp1).awaitTermination()
    val afterSecond = spark.read.parquet(store)
    val expectBoth = eventsWeek(1).unionByName(eventsWeek(2))
      .select($"user_id", to_date($"ts").as("day")).distinct().count()
    assert(afterSecond.count() === expectBoth)
    // grain holds: no (user, day) duplicated
    assert(afterSecond.groupBy("user_id", "day").count().filter($"count" > 1).isEmpty)

    // idempotence: replaying everything into a fresh checkpoint+store
    // converges to the same state
    val store2 = tmpDir("store2") + "/snap"
    WeeklyFeed.runFeed(spark, flat, store2, tmpDir("cp2")).awaitTermination()
    val replay = spark.read.parquet(store2)
    assert(replay.count() === afterSecond.count())
  }

  test("streaming sessionization (flatMapGroupsWithState) matches batch cumsum sessions") {
    val flat = tmpDir("sess")
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .coalesce(1).write.mode("overwrite").parquet(flat)
    val q = graft.streaming.Sessionize.sessionStream(
        graft.streaming.WeeklyFeed.readFeed(spark, flat))
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sessions_out")
      .select($"user_id", $"start_us", $"end_us", $"n_events")
    val batch = SparkEntry.queries("x13_sessionize")(spark, sf)
      .select($"user_id", $"start_us", $"end_us", $"n_events")
    // append mode only emits CLOSED sessions; every emitted session must
    // exactly match a batch session, and most batch sessions must close
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty, "streaming emitted a session batch doesn't have")
    val unclosed = batch.count() - streamed.count()
    // at most one open (never-emitted) session per user can remain
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(unclosed >= 0 && unclosed <= users, s"unclosed=$unclosed users=$users")
  }

  test("stream-stream interval join (purchase⋈view attribution) matches the batch join") {
    val flat = tmpDir("ssj")
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .coalesce(1).write.mode("overwrite").parquet(flat)
    val q = graft.streaming.Attribution.attribution(WeeklyFeed.readFeed(spark, flat))
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("attr_out")
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"))
    val v = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("vu"), $"ts".as("v_ts"))
    val batch = p.join(v, $"user_id" === $"vu" &&
        $"v_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"v_ts" <= $"p_ts")
      .select($"purchase_id", $"user_id", $"p_ts", $"view_id", $"v_ts")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("tumbling weekly aggregation over the feed matches the batch computation") {
    val flat = tmpDir("flat2")
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .coalesce(1).write.mode("overwrite").parquet(flat)
    val q = WeeklyFeed.weeklyAgg(WeeklyFeed.readFeed(spark, flat))
      .writeStream.outputMode("complete")
      .format("memory").queryName("weekly_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("weekly_out")
      .select($"window.start".as("wstart"), $"event_type", $"n_events", $"sum_value")
    val batch = Tables.events(spark, sf)
      .groupBy(window($"ts", "7 days").as("window"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select($"window.start".as("wstart"), $"event_type", $"n_events", $"sum_value")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming doc dedup keeps one survivor per content hash; curation maps match batch") {
    val docsWithTs = Tables.documents(spark, sf)
      .withColumn("ingest_ts", to_timestamp(lit("2024-01-01 00:00:00")))
    val flat = tmpDir("docs")
    docsWithTs.coalesce(1).write.mode("overwrite").parquet(flat)
    // re-deliver the whole drop (duplicate file inside the watermark window)
    docsWithTs.coalesce(1).write.mode("append").parquet(flat)

    val q = graft.streaming.DocFeed.dedupStream(
        graft.streaming.DocFeed.readDocs(spark, flat))
      .writeStream.outputMode("append")
      .format("memory").queryName("docs_dedup")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("docs_dedup")
    // one survivor per distinct content hash, despite the double delivery
    val expect = Tables.documents(spark, sf).select(md5($"text")).distinct().count()
    assert(streamed.count() === expect)
    assert(streamed.groupBy($"content_hash").count().filter($"count" > 1).isEmpty)

    // the stateless curation stage emits exactly the batch x8/x24 values
    val q2 = graft.streaming.DocFeed.curateStream(
        graft.streaming.DocFeed.readDocs(spark, flat))
      .writeStream.outputMode("append")
      .format("memory").queryName("docs_curated")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val curated = spark.table("docs_curated").distinct() // double delivery → dedupe
    val batchScrub = SparkEntry.queries("x24_stopword_scrub")(spark, sf)
      .join(SparkEntry.queries("x8_quality_score")(spark, sf)
        .select($"doc_id", $"uniq_ratio"), "doc_id")
      .select($"doc_id", $"uniq_ratio", $"clean_text", $"n_removed")
    assert(curated.exceptAll(batchScrub).isEmpty && batchScrub.exceptAll(curated).isEmpty)
  }
}
