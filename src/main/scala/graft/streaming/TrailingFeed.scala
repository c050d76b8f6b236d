package graft.streaming

import graft.Parity.week
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** x121's trailing-window distinct users as CONTINUOUS ingestion — the
  * windowed member of the [[BitmapFeed]] family: state is an exact user
  * bitmap PER (event_type, week, word), merged by `bit_or` (associative,
  * commutative, idempotent — any batch split of the stream produces the
  * identical store, and replayed events are absorbed free), and the
  * rolling WAU is read off the store by OR-ing the window's weeks.
  *
  * What is NEW versus BitmapFeed is state RETIREMENT: a trailing window
  * only ever reads the last [[WindowWeeks]] calendar weeks, so
  * [[applyBatch]] evicts every week older than the merged high-water
  * week minus ([[WindowWeeks]]−1) — the store is bounded by
  * window-weeks × occupied words regardless of stream age, the thing an
  * unbounded BitmapFeed store is not. The contract that eviction buys:
  * [[currentWindow]] answers exactly ONE window end — the latest week
  * seen — which is the live "current WAU" a dashboard holds open;
  * historical window ends are x121's batch job over the event log.
  *
  * Exactness: [[currentWindow]] over any batch split equals x121's
  * batch answer at the high-water week (spec-pinned), because OR-ing
  * per-week bitmaps IS the set union the batch query's second dedup
  * computes. */
object TrailingFeed {

  /** Trailing window length in weeks (matches x121). */
  val WindowWeeks = 4

  /** (event_type, wk, word_idx, word) view of a raw event batch. */
  private def wordBits(batch: DataFrame): DataFrame =
    batch.select(col("event_type"), week(col("ts")).as("wk"),
      expr("shiftright(user_id, 6)").as("word_idx"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))").as("word"))

  /** Merge one micro-batch into the store and retire weeks that can
    * never again contribute to the current window. One (type, wk, word)
    * hash agg over batch ∪ store, one 1-row high-water broadcast. */
  def applyBatch(store: DataFrame, batch: DataFrame): DataFrame = {
    val merged = wordBits(batch)
      .unionByName(store.select(col("event_type"), col("wk"),
        col("word_idx"), col("word")))
      .groupBy(col("event_type"), col("wk"), col("word_idx"))
      .agg(bit_or(col("word")).as("word"))
    val hw = merged.agg(max(col("wk")).as("hw"))
    merged.crossJoin(broadcast(hw))
      .filter(col("wk") >= date_add(col("hw"), -7 * (WindowWeeks - 1)))
      .select(col("event_type"), col("wk"), col("word_idx"), col("word"))
  }

  /** The live trailing-[[WindowWeeks]]-week distinct users per type at
    * the store's high-water week: OR the retained weeks' words per
    * (type, word), popcount, sum. */
  def currentWindow(store: DataFrame): DataFrame = {
    val hw = store.agg(max(col("wk")).as("end_wk"))
    store.crossJoin(broadcast(hw))
      .filter(col("wk") >= date_add(col("end_wk"), -7 * (WindowWeeks - 1)))
      .groupBy(col("event_type"), col("end_wk"), col("word_idx"))
      .agg(bit_or(col("word")).as("word"))
      .groupBy(col("event_type"), col("end_wk"))
      .agg(sum(bit_count(col("word"))).cast("long").as("distinct_users"))
      .orderBy(col("event_type"))
  }

  /** Empty store with the right schema. */
  def emptyStore(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, java.sql.Date, Long, Long)]
      .toDF("event_type", "wk", "word_idx", "word")
  }
}
