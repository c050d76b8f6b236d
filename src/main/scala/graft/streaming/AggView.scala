package graft.streaming

import graft.etl.Etl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained aggregate view over a CDC-merged store —
  * materialized-view maintenance as a pipeline component.
  *
  * The round-4 shape for "aggregate of a CDC store" was recompute: after
  * each merge, groupBy the whole store again. Correct, but at 100 TB a
  * trickle of images pays a full-corpus aggregation per micro-batch.
  * This maintains `SELECT group, COUNT(*), SUM(v1), SUM(v2)… GROUP BY
  * group` by DELTA instead: each batch knows exactly which rows it
  * replaced and which it inserted, so the view moves by
  * `+new − replaced-old`, touching only the groups the batch touched.
  *
  * Why count/sum only: they are the self-inverse aggregates — a
  * replaced row's contribution can be subtracted back out. MIN/MAX are
  * not delta-maintainable under replacement (losing the max forces a
  * rescan of the group); AVG is derivable as sum/count at read time.
  * Sums should run on exact types (LONG/DECIMAL): float sums would
  * drift between the incremental path and a recompute.
  *
  * Layout mirrors [[Cdc]]: the view is parquet bucketed by
  * `b = pmod(xxhash64(groupCols), n)` and updated with dynamic partition
  * overwrite, so a batch that touches 3 groups rewrites the ≤3 bucket
  * directories those groups hash into — every other view bucket is
  * byte-identical on disk. Group-key changes in an update are handled:
  * the old image's group gets a negative delta and the new image's group
  * a positive one.
  *
  * Scale shape per batch: one keyed join of the batch against the
  * touched BASE buckets (to find replaced rows), one groupBy of batch
  * size, one join against the touched VIEW buckets — all proportional
  * to batch size and bucket width, never to store size. */
object AggView {

  /** One maintenance step: MERGE `batch` into the bucketed base store at
    * `storeDir` (exactly [[Cdc.mergeIntoStore]] semantics — global
    * newest-wins on `orderCol`, incoming wins ties) and move the
    * aggregate view at `viewDir` by the delta the merge implies.
    * The view holds one row per group: `groupCols…, cnt, sum_<c>…`. */
  def mergeWithView(batch: DataFrame, storeDir: String, viewDir: String,
      keys: Seq[String], orderCol: String,
      groupCols: Seq[String], sumCols: Seq[String],
      numBuckets: Int = Cdc.DefaultBuckets): Unit = {
    val spark = batch.sparkSession
    val newest = Etl.dedupFirst(batch, keys, Seq(col(orderCol).desc))
    val storeBorn = Cdc.storeExists(spark, storeDir)

    // Deltas BEFORE the base merge (they need the pre-merge images).
    val deltas: DataFrame =
      if (!storeBorn) contributions(newest, groupCols, sumCols)
      else {
        val existing = Cdc.readStore(spark, storeDir)
          .join(newest.select(keys.map(col): _*), keys, "left_semi")
        val o = existing.select(
          keys.map(col) ++ Seq(col(orderCol).as("__o_ord")) ++
            groupCols.map(c => col(c).as(s"__o_$c")) ++
            sumCols.map(c => col(c).as(s"__o_sum_$c")): _*)
        // Incoming image wins ties (MERGE update semantics) — a change
        // happens unless the store row is STRICTLY newer.
        val changed = newest.join(o, keys, "left")
          .filter(col("__o_ord").isNull || !(col("__o_ord") > col(orderCol)))
        val plus = contributions(changed, groupCols, sumCols)
        val minus = contributions(
          changed.filter(col("__o_ord").isNotNull)
            .select(groupCols.map(c => col(s"__o_$c").as(c)) ++
              sumCols.map(c => col(s"__o_sum_$c").as(c)): _*),
          groupCols, sumCols, negate = true)
        plus.unionByName(minus)
          .groupBy(groupCols.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"),
            sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      }

    // The delta plan reads the PRE-merge base files, and the merge below
    // rewrites them (dynamic partition overwrite deletes replaced files)
    // — materialize the deltas first or the lazy scan would read freed
    // paths. Cost is bounded by batch size (≤ one row per image), not
    // store size.
    val materialized = deltas.localCheckpoint(true)
    Cdc.mergeIntoStore(batch, storeDir, keys, orderCol, numBuckets)
    applyDeltas(spark, materialized, viewDir, groupCols, sumCols, numBuckets)
  }

  /** Continuous form: a stream of row images maintains base + view. */
  def runCdcWithView(spark: SparkSession, inDir: String, schema: StructType,
      storeDir: String, viewDir: String, checkpointDir: String,
      keys: Seq[String], orderCol: String,
      groupCols: Seq[String], sumCols: Seq[String],
      numBuckets: Int = Cdc.DefaultBuckets): StreamingQuery =
    Cdc.readImages(spark, inDir, schema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        mergeWithView(b, storeDir, viewDir, keys, orderCol,
          groupCols, sumCols, numBuckets)
      }
      .start()

  /** Current view (bucket column dropped), one row per live group. */
  def readView(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(viewDir).drop("b")

  /** Per-group (cnt, sum_<c>…) contributions of `rows`, optionally
    * negated (the subtract side of a replacement delta). */
  private def contributions(rows: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String], negate: Boolean = false): DataFrame = {
    val sign = if (negate) lit(-1L) else lit(1L)
    rows.groupBy(groupCols.map(col): _*)
      .agg((sign * count(lit(1))).as("cnt"),
        sumCols.map(c => (sign * sum(col(c))).as(s"sum_$c")): _*)
  }

  /** Fold a delta frame into the view store, rewriting only the view
    * buckets the delta's groups hash into. Groups whose count reaches
    * zero are dropped (their last row was replaced away to another
    * group). */
  private def applyDeltas(spark: SparkSession, deltas: DataFrame,
      viewDir: String, groupCols: Seq[String], sumCols: Seq[String],
      numBuckets: Int): Unit = {
    // Honor the view's pinned bucket count (fixed at creation; a later
    // different argument must not silently re-hash groups).
    val pinned = Cdc.pinnedBuckets(spark, viewDir)
    val n = if (pinned > 0) pinned else numBuckets
    val withB = deltas.withColumn("b", Cdc.bucketColFor(groupCols, n))
    if (!Cdc.storeExists(spark, viewDir)) {
      withB.filter(col("cnt") =!= 0L)
        .write.partitionBy("b").mode("overwrite").parquet(viewDir)
      Cdc.writeBucketsFile(spark, viewDir, numBuckets)
    } else {
      val touched = withB.select(col("b")).distinct()
        .collect().map(_.getInt(0)).toSeq // bounded by the bucket count
      val existing = spark.read.parquet(viewDir)
        .filter(col("b").isin(touched: _*)) // partition-pruned scan
      val merged = existing.unionByName(withB)
        .groupBy((groupCols.map(col) :+ col("b")): _*)
        .agg(sum(col("cnt")).as("cnt"),
          sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
        .filter(col("cnt") =!= 0L)
        .localCheckpoint(true) // consumed twice; and the write below
                               // replaces the files this plan reads
      // Dynamic partition overwrite only rewrites partitions PRESENT in
      // the output — a touched bucket whose last group was removed emits
      // zero rows and would keep its stale file. Delete those explicitly.
      val present = merged.select(col("b")).distinct()
        .collect().map(_.getInt(0)).toSet
      merged.write.partitionBy("b").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(viewDir)
      val fs = new org.apache.hadoop.fs.Path(viewDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      touched.filterNot(present).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(viewDir, s"b=$b"), true)
      }
    }
  }

  /** Full recompute of the view from the base store — the recovery path.
    * The base merge and the view delta-apply are two separate commits; a
    * crash between them leaves the view one batch behind, and a replay
    * cannot regenerate the lost delta (the base has already absorbed the
    * batch, so the replayed images net to zero). Rebuild bounds that
    * failure mode: one full aggregation, amortized over rare crashes
    * rather than paid per batch. */
  def rebuild(spark: SparkSession, storeDir: String, viewDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      numBuckets: Int = Cdc.DefaultBuckets): Unit = {
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(viewDir), true)
    applyDeltas(spark,
      contributions(Cdc.readStore(spark, storeDir), groupCols, sumCols),
      viewDir, groupCols, sumCols, numBuckets)
  }
}
