package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** x83's chained debounce as CONTINUOUS ingestion — the
  * `mapGroupsWithState` form the batch query's scaladoc names as its
  * deployment target: per-user state is exactly (events-seen,
  * kept-count, last-kept-µs) — three longs FOREVER, no watermark needed
  * because the state cannot grow with history.
  *
  * Ordering contract: the chained fold is order-SENSITIVE (unlike the
  * KMV/CMS sketch feeds, whose merges are commutative), so the stream
  * form is exact under per-user in-order delivery across micro-batches;
  * within a batch events are sorted by (ts, event_id) before folding,
  * which also makes replays of a batch deterministic. An out-of-order
  * producer needs a watermark-bounded sort upstream (the WeeklyFeed
  * grain pattern) — the batch query (`Anomaly.debounce`) is the
  * replayable oracle that settles any divergence.
  */
object DebounceFeed {

  /** Mirror of `Anomaly.DebounceUs` (6 h in epoch-µs). */
  private val DebounceUs = 21600000000L

  case class DebounceState(n: Long, kept: Long, lastKeptUs: Long)
  case class DebounceUpdate(user_id: Long, n_events: Long, n_kept: Long,
      last_kept_us: Long)

  private def fn(user: Long, events: Iterator[(Long, Long, Long)],
      state: GroupState[DebounceState]): DebounceUpdate = {
    // (user_id, us, event_id) sorted by (us, event_id) — batch-local
    // determinism; cross-batch order is the delivery contract
    val sorted = events.toSeq.sortBy(e => (e._2, e._3))
    var st = state.getOption.getOrElse(DebounceState(0L, 0L, Long.MinValue))
    sorted.foreach { case (_, us, _) =>
      val keep = st.kept == 0L || us >= st.lastKeptUs + DebounceUs
      st = DebounceState(st.n + 1L,
        if (keep) st.kept + 1L else st.kept,
        if (keep) us else st.lastKeptUs)
    }
    state.update(st)
    DebounceUpdate(user, st.n, st.kept, st.lastKeptUs)
  }

  /** Streaming form: one refreshed (user, n_events, n_kept,
    * last_kept_us) row per user per micro-batch. */
  def debounceStream(feed: DataFrame): Dataset[DebounceUpdate] = {
    val spark = feed.sparkSession
    import spark.implicits._
    feed.select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[DebounceState, DebounceUpdate](
        GroupStateTimeout.NoTimeout)(fn)
  }
}
