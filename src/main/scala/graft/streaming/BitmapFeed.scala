package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** x93's bitmap distinct as CONTINUOUS ingestion — the EXACT companion to
  * [[KmvFeed]]'s bounded sketch: `bit_or` is associative, commutative and
  * idempotent, so any batch split of the stream ORs to the identical word
  * table (incremental == from-scratch, exactly), and re-observed ids are
  * absorbed at zero state growth. State is one long per OCCUPIED
  * (key, id/64) word — proportional to the distinct universe / 64, the
  * exact-count floor (no exact counter can hold less than the set), vs
  * KmvFeed's ≤ k longs with ~18% error: the two feeds are the two ends of
  * the accuracy/state trade, sharing the store-table shape.
  *
  * Two forms, one state type:
  *  - [[applyBatch]]: micro-batch merge — the batch's words OR into the
  *    stored words with one (key, word) hash agg; per-batch cost is the
  *    batch scan + |touched words| store rows, never the event history.
  *  - [[wordStream]]: `mapGroupsWithState` keyed by (type, word) with the
  *    64-bit population AS the state (a primitive long — the smallest
  *    state any feed here carries), emitting refreshed per-word
  *    populations; [[counts]] folds either store into per-type
  *    cardinalities.
  */
object BitmapFeed {

  /** (event_type, word_idx, bit) view of a raw event batch. */
  private def wordBits(batch: DataFrame): DataFrame =
    batch.select(col("event_type"),
      expr("shiftright(user_id, 6)").as("word_idx"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))").as("word"))

  /** Merge one micro-batch into a (event_type, word_idx, word) store. */
  def applyBatch(store: DataFrame, batch: DataFrame): DataFrame =
    wordBits(batch)
      .unionByName(store.select(col("event_type"), col("word_idx"), col("word")))
      .groupBy(col("event_type"), col("word_idx"))
      .agg(bit_or(col("word")).as("word"))

  /** Exact per-type cardinalities read off a word store. */
  def counts(store: DataFrame): DataFrame =
    store.groupBy(col("event_type"))
      .agg(sum(bit_count(col("word"))).cast("long").as("n_users"),
        count(lit(1)).as("n_words"))
      .orderBy(col("event_type"))

  case class WordUpdate(event_type: String, word_idx: Long, word: Long, pop: Int)

  private def wordFn(key: (String, Long), rows: Iterator[(String, Long, Long)],
      state: GroupState[Long]): WordUpdate = {
    val merged = rows.foldLeft(state.getOption.getOrElse(0L))((w, r) => w | r._3)
    state.update(merged)
    WordUpdate(key._1, key._2, merged, java.lang.Long.bitCount(merged))
  }

  /** Streaming form: one long of state per occupied (type, word) key, no
    * watermark needed (a 64-bit population cannot grow past 64), one
    * refreshed word row per touched key per micro-batch. */
  def wordStream(feed: DataFrame): Dataset[WordUpdate] = {
    val spark = feed.sparkSession
    import spark.implicits._
    wordBits(feed)
      .as[(String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .mapGroupsWithState[Long, WordUpdate](
        GroupStateTimeout.NoTimeout)(wordFn)
  }
}
