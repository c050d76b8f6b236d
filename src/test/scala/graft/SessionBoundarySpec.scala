package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.TimestampNTZType

import graft.streaming.{Sessionize, WeeklyFeed}

/** Session-window boundary invariance across timestamp encodings
  * (round-10 hardening, after the driver's testdata regeneration flipped
  * `events.ts` from ns-long to µs TIMESTAMP_NTZ between rounds).
  *
  * Pins two things:
  *  1. x13b's native `session_window` produces IDENTICAL session
  *     boundaries whether the events parquet stores ts as LTZ or NTZ —
  *     including at exactly-gap spacing, where the [start, end) rule
  *     splits (an event landing ON the previous session's end starts a
  *     new session).
  *  2. The streaming sessionizer (`flatMapGroupsWithState`) emits the
  *     same closed sessions from a file-source over either encoding and
  *     from a MemoryStream of the same rows — the encoding-free source
  *     that anchors what the file variants must agree with.
  */
class SessionBoundarySpec extends SparkSuite {
  import spark.implicits._

  private val GapUs = Sessionize.SessionGapSec * 1000000L
  private val T0 = 1700000000000000L // µs

  /** (event_id, ts_us, user_id, event_type, value); user 1 has an
    * exactly-gap-spaced pair (e2 → e3: MERGES — touching windows merge),
    * user 3 a gap+1µs pair (SPLITS), and user 99 is a far-future
    * sentinel that closes earlier sessions in the streaming variants by
    * advancing the watermark. */
  private val rows: Seq[(Long, Long, Long, String, Double)] = Seq(
    (1L, T0, 1L, "view", 1.0),
    (2L, T0 + 600L * 1000000L, 1L, "view", 2.0),
    (3L, T0 + 600L * 1000000L + GapUs, 1L, "view", 4.0),
    (4L, T0 + 600L * 1000000L + GapUs + 10L * 1000000L, 1L, "view", 8.0),
    (5L, T0 + 100L * 1000000L, 2L, "purchase", 16.0),
    (7L, T0, 3L, "view", 64.0),
    (8L, T0 + GapUs + 1L, 3L, "view", 128.0),
    (6L, T0 + 86400L * 100L * 1000000L, 99L, "view", 32.0)
  )

  private def eventsDf: DataFrame =
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")

  private def writeEvents(ntz: Boolean): String = {
    val dir = Files.createTempDirectory("session-enc").toString
    val df = if (ntz) eventsDf.withColumn("ts", $"ts".cast(TimestampNTZType)) else eventsDf
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("x13b session_window: identical boundaries over LTZ and NTZ parquet; exact-gap merges, gap+1µs splits") {
    val byEnc = for (ntz <- Seq(false, true)) yield {
      val out = SparkEntry.queries("x13b_session_window")(spark, writeEvents(ntz))
        .select($"user_id", $"start_us", $"end_us", $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      out
    }
    assert(byEnc(0) === byEnc(1))
    // user 1: e3 lands exactly ON session 1's end (last + gap) → MERGES
    // (touching windows merge); one 4-event session ending last + gap.
    assert(byEnc(0).filter(_._1 == 1L) === Seq(
      (1L, T0, T0 + 600L * 1000000L + GapUs + 10L * 1000000L + GapUs, 4L)))
    // user 3: 1 µs past the end → SPLITS.
    assert(byEnc(0).filter(_._1 == 3L) === Seq(
      (3L, T0, T0 + GapUs, 1L),
      (3L, T0 + GapUs + 1L, T0 + 2 * GapUs + 1L, 1L)))
    // and the oracle SQL itself agrees on this adversarial input (the
    // `>`-rule fix — a `>=` oracle splits user 1 where the operator merges).
    val orSql = SparkEntry.oracleSql("x13b_session_window")
    val viaSql = {
      eventsDf.createOrReplaceTempView("events")
      try spark.sql(orSql.replace("epoch_us(ts)", "unix_micros(ts)"))
        .select($"user_id", $"start_us", $"end_us", $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      finally spark.catalog.dropTempView("events")
    }
    assert(viaSql === byEnc(0))
  }

  test("streaming sessionizer: file-source over LTZ/NTZ and MemoryStream emit identical closed sessions") {
    def emitted(feed: DataFrame, name: String): Seq[(Long, Long, Long, Long)] = {
      val q = Sessionize.sessionStream(feed)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name)
        .select($"user_id", $"start_us", $"end_us", $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    }

    val fromLtz = emitted(WeeklyFeed.readFeed(spark, s"${writeEvents(ntz = false)}/events.parquet"), "sb_ltz")
    val fromNtz = emitted(WeeklyFeed.readFeed(spark, s"${writeEvents(ntz = true)}/events.parquet"), "sb_ntz")

    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    mem.addData(rows.map { case (id, us, u, t, v) =>
      // keep µs precision: the millis constructor alone would truncate
      // the +1 µs that distinguishes user 3's split from a merge
      val ts = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      ts.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      (id, ts, u, t, v)
    })
    val memFeed = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val fromMem = emitted(memFeed, "sb_mem")

    // The gap between user 1's sessions closes session 1 in-batch, and the
    // sentinel's watermark advance times out the rest where the engine
    // runs a cleanup batch — what's REQUIRED is agreement across sources.
    assert(fromLtz.nonEmpty)
    assert(fromLtz === fromNtz)
    assert(fromLtz === fromMem)
    // user 3's first session is gap-closed IN-BATCH in every variant
    // (emission can't depend on the sentinel's timeout machinery), with
    // x13's closed-form boundaries (flatMapGroupsWithState reports the
    // LAST EVENT as end, not last + gap).
    assert(fromLtz.contains((3L, T0, T0, 1L)))
  }

  test("NATIVE session_window in streaming mode emits the same closed sessions as batch x13b") {
    val dir = writeEvents(ntz = true) // the encoding the driver now ships
    val q = WeeklyFeed.readFeed(spark, s"$dir/events.parquet")
      .withWatermark("ts", "1 hour")
      .groupBy($"user_id",
        session_window($"ts", s"${Sessionize.SessionGapSec} seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", unix_micros($"sw.start").as("start_us"),
        unix_micros($"sw.end").as("end_us"), $"n_events")
      .writeStream.outputMode("append")
      .format("memory").queryName("sb_native_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sb_native_stream")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val batch = SparkEntry.queries("x13b_session_window")(spark, dir)
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // append mode emits only watermark-closed sessions: every streamed
    // session is a batch session (same merge rule, including user 1's
    // exactly-gap merge), and only the sentinel's own session may stay open
    assert(streamed.nonEmpty)
    assert((streamed.toSet -- batch.toSet).isEmpty,
      s"streaming emitted sessions batch doesn't have: ${streamed.toSet -- batch.toSet}")
    assert(batch.size - streamed.size <= 1, s"unclosed=${batch.size - streamed.size}")
  }
}
