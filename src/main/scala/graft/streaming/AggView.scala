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
    * The view holds one row per group: `groupCols…, cnt, sum_<c>…`.
    *
    * Crash safety (round-5 defect: base merge and view apply were two
    * unrelated commits, and a crash between them lost the delta forever
    * — the replayed images net to zero against the already-merged base).
    * The protocol is a write-ahead delta plus batch stamps:
    *
    *  1. compute the delta from the PRE-merge base, persist it to the
    *     WAL dir (`<view>_wal/delta` + a `BATCH` stamp written after the
    *     parquet completes);
    *  2. merge the base (idempotent — newest-wins is a fixpoint) and
    *     stamp the base with the batch id;
    *  3. raise an `APPLYING` marker, fold the delta into the view, stamp
    *     the view, drop the marker and the WAL.
    *
    * Replay of the same batch id (Structured Streaming re-delivers the
    * batch after any crash; the batch-local path assigns ids
    * monotonically) then recovers every window:
    *  - view already stamped        → done, no-op;
    *  - WAL present, no marker      → apply never started: redo the
    *    idempotent base merge and fold the PERSISTED delta (this is the
    *    crash-between-commits window — no recompute against the merged
    *    base, so nothing nets to zero);
    *  - marker present, or the base is stamped but the WAL is gone
    *    → the apply may be half-written (bucket swaps are per-partition)
    *    → auto-rebuild the view from the base, one bounded aggregation
    *    amortized over rare crashes, no manual step.
    *
    * `batchId` < 0 (the default, batch-local callers) self-assigns the
    * next id — UNLESS a previous attempt is pending (any of base / WAL /
    * APPLYING stamp exceeds the view stamp), in which case it resumes
    * THAT id so the replay/rebuild branches above engage. Self-assigning
    * `max+1` after a crash in the lost-delta window (base=N, view=N-1,
    * WAL=N) would otherwise skip every recovery branch: computeDeltas
    * would run against the already-merged base, net to zero, overwrite
    * the WAL, and permanently diverge the view. Batch-local contract:
    * after a failed call, retry the SAME batch before submitting new
    * data (the streaming path gets this for free from epoch replay). */
  def mergeWithView(batch: DataFrame, storeDir: String, viewDir: String,
      keys: Seq[String], orderCol: String,
      groupCols: Seq[String], sumCols: Seq[String],
      numBuckets: Int = Cdc.DefaultBuckets, batchId: Long = -1L,
      crashAfterMerge: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val wal = walDir(viewDir)
    val id =
      if (batchId >= 0) batchId
      else {
        val base = readStamp(spark, storeDir, BaseStamp)
        val view = readStamp(spark, viewDir, ViewStamp)
        val pending = Seq(base, readStamp(spark, wal, WalStamp),
          readStamp(spark, wal, ApplyingStamp)).max
        if (pending > view) pending // unfinished attempt: resume, don't skip
        else math.max(base, view) + 1
      }

    if (readStamp(spark, viewDir, ViewStamp) >= id) return // fully applied

    val walBatch = readStamp(spark, wal, WalStamp)
    val applying = readStamp(spark, wal, ApplyingStamp)
    val baseDone = readStamp(spark, storeDir, BaseStamp) >= id

    if (applying == id || (baseDone && walBatch != id)) {
      // The previous attempt died mid-apply (marker up), or the base has
      // absorbed the batch and the write-ahead delta is gone: the view
      // may be half-written and the delta is unrecoverable. Reconverge
      // the base (idempotent) and rebuild the view from it.
      Cdc.mergeIntoStore(batch, storeDir, keys, orderCol, numBuckets)
      writeStamp(spark, storeDir, BaseStamp, id)
      rebuild(spark, storeDir, viewDir, groupCols, sumCols, numBuckets)
      writeStamp(spark, viewDir, ViewStamp, id)
      deleteDir(spark, wal)
      return
    }

    val materialized: DataFrame =
      if (walBatch == id) spark.read.parquet(s"$wal/delta") // write-ahead replay
      else {
        // Deltas BEFORE the base merge (they need the pre-merge images).
        val deltas = computeDeltas(spark, batch, storeDir, keys, orderCol,
          groupCols, sumCols)
        // Persist the delta as the write-ahead record. The plan reads the
        // PRE-merge base files and the merge below rewrites them (dynamic
        // partition overwrite deletes replaced files), so this write also
        // serves the old materialization need. Cost is bounded by batch
        // size (≤ one row per image), not store size.
        deltas.write.mode("overwrite").parquet(s"$wal/delta")
        writeStamp(spark, wal, WalStamp, id) // stamp AFTER the parquet lands
        spark.read.parquet(s"$wal/delta")
      }

    Cdc.mergeIntoStore(batch, storeDir, keys, orderCol, numBuckets)
    writeStamp(spark, storeDir, BaseStamp, id)
    if (crashAfterMerge) // test failpoint: the round-5 lost-delta window
      throw new RuntimeException("injected crash between base merge and view apply")
    writeStamp(spark, wal, ApplyingStamp, id)
    applyDeltas(spark, materialized, viewDir, groupCols, sumCols, numBuckets)
    writeStamp(spark, viewDir, ViewStamp, id)
    deleteDir(spark, wal)
  }

  /** The per-group delta a merge of `batch` into the CURRENT base store
    * implies — must run before the merge rewrites the store. */
  private def computeDeltas(spark: SparkSession, batch: DataFrame,
      storeDir: String, keys: Seq[String], orderCol: String,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val newest = Etl.dedupFirst(batch, keys, Seq(col(orderCol).desc))
    if (!Cdc.storeExists(spark, storeDir)) contributions(newest, groupCols, sumCols)
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
  }

  // ---- stamps & WAL --------------------------------------------------
  // Underscore-prefixed names are invisible to parquet partition
  // discovery, so stamps can live inside the store/view dirs; the WAL is
  // a sibling dir (`<view>_wal`) so a rebuild's dir delete cannot eat the
  // write-ahead record it may still need.
  private val BaseStamp = "_LAST_BATCH"
  private val ViewStamp = "_APPLIED_BATCH"
  private val WalStamp = "BATCH"
  private val ApplyingStamp = "APPLYING"

  private[graft] def walDir(viewDir: String): String = viewDir + "_wal"

  private def hconf(spark: SparkSession) = spark.sessionState.newHadoopConf()

  /** Stamp read: the long in `<dir>/<name>`, or -1 if absent/unborn. */
  private[graft] def readStamp(spark: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(hconf(spark))
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Atomic stamp write: tmp file + FileContext rename-overwrite, so a
    * reader never sees a torn stamp. */
  private[graft] def writeStamp(spark: SparkSession, dir: String,
      name: String, v: Long): Unit = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(hconf(spark))
    fs.mkdirs(d)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, hconf(spark))
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(hconf(spark)).delete(p, true)
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
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        // The streaming epoch id IS the batch id: re-delivered after any
        // crash, monotonic, so the WAL protocol can tell a replay from
        // new work.
        mergeWithView(b, storeDir, viewDir, keys, orderCol,
          groupCols, sumCols, numBuckets, batchId = epochId)
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

  /** Full recompute of the view from the base store. Since the WAL
    * protocol in [[mergeWithView]], this is no longer a manual recovery
    * step — the replay path invokes it automatically when the view may
    * be half-written (APPLYING marker up) or the write-ahead delta is
    * gone. One full aggregation, amortized over rare crashes rather
    * than paid per batch; kept public for bootstrapping a view over an
    * existing base store. */
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
