package graft.streaming

import graft.ext.Cms
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** x82's Count-Min grid as CONTINUOUS ingestion — the additive-counter
  * property made operational (KmvFeed's sibling: KMV tracks distinct
  * cardinality, CMS tracks point FREQUENCIES — "how active is user u?"
  * with fixed memory, where exact per-user counters need state
  * proportional to the user universe).
  *
  * The grid is pure sums, so merging is vector addition: any batch split
  * of the stream folds to the identical grid — incremental ==
  * from-scratch, exactly (CmsSpec proves the same for corpus splits).
  * Two forms, one hash recipe ([[Cms.laneBuckets]]):
  *  - [[applyBatch]]: the foreachBatch shape — the store is
  *    (event_type, idx, c) cell rows (≤ Depth·Width per key FOREVER,
  *    metadata never data), merged by one union + sum aggregation.
  *  - [[sketchStream]]: `mapGroupsWithState` with the flat counter
  *    array AS the state — emits the refreshed per-key grid per
  *    micro-batch; no watermark needed, the state cannot grow.
  * Estimation ([[estimates]]) joins query keys against the store and
  * takes the min over lanes; absent cells read as 0, so never-seen keys
  * estimate 0 and the one-sided guarantee (est ≥ true count) holds at
  * every point in the stream.
  */
object CmsFeed {

  /** Flat grid size: lane-major cell index = lane·Width + bucket. */
  val Cells: Int = Cms.Depth * Cms.Width

  /** Lane-major cell indices of one key as an array column. */
  private def cellIdx(key: Column): Column = {
    val b = Cms.laneBuckets(key.cast("string"))
    array((0 until Cms.Depth).map(j =>
      (lit(j.toLong) * Cms.Width + element_at(b, j + 1)).cast("long")): _*)
  }

  /** Per-event cell rows of one micro-batch: (event_type, idx). */
  private def laneRows(batch: DataFrame): DataFrame =
    batch.select(col("event_type"),
        explode(cellIdx(col("user_id"))).as("idx"))

  /** Merge one micro-batch of events into an (event_type, idx, c) grid
    * store — one union + one sum aggregation; both sides are cell rows,
    * so per-batch history cost is ≤ |keys|·Depth·Width rows. */
  def applyBatch(store: DataFrame, batch: DataFrame): DataFrame =
    laneRows(batch)
      .groupBy(col("event_type"), col("idx"))
      .agg(count(lit(1)).as("c"))
      .unionByName(store)
      .groupBy(col("event_type"), col("idx"))
      .agg(sum(col("c")).as("c"))

  /** Point-frequency estimates for (event_type, user_id) query keys:
    * min over the key's lane cells, absent cells = 0. */
  def estimates(store: DataFrame, keys: DataFrame): DataFrame =
    keys.select(col("event_type"), col("user_id"),
        explode(cellIdx(col("user_id"))).as("idx"))
      .join(store, Seq("event_type", "idx"), "left")
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))

  case class GridUpdate(event_type: String, n_events: Long, grid: Array[Long])

  private def gridFn(key: String, events: Iterator[Seq[Long]],
      state: GroupState[Array[Long]]): GridUpdate = {
    val g = state.getOption.getOrElse(Array.fill[Long](Cells)(0L))
    var n = 0L
    events.foreach { idxs => idxs.foreach(i => g(i.toInt) += 1L); n += 1L }
    state.update(g)
    GridUpdate(key, n, g)
  }

  /** Streaming form: per-key flat counter array as `mapGroupsWithState`
    * state (Depth·Width longs per key — bounded by construction). */
  def sketchStream(feed: DataFrame): Dataset[GridUpdate] = {
    val spark = feed.sparkSession
    import spark.implicits._
    feed.select(col("event_type"), cellIdx(col("user_id")).as("idxs"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1).mapValues(_._2)
      .mapGroupsWithState[Array[Long], GridUpdate](
        GroupStateTimeout.NoTimeout)(gridFn)
  }
}
