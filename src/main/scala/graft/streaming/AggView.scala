package graft.streaming

import graft.etl.Etl
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * count/sum are the self-inverse aggregates — a replaced row's
  * contribution can be subtracted back out — so their path is always
  * delta-only. AVG is derivable as sum/count at read time. Sums should
  * run on exact types (LONG/DECIMAL): float sums would drift between
  * the incremental path and a recompute.
  *
  * MIN/MAX (`minMaxCols`) get the standard bounded extension: inserts
  * can only improve an extremum (new max = greatest(old, batch max) —
  * still delta-only), and a removal strictly below the current extremum
  * cannot move it; ONLY a batch that retracts the current extremum of a
  * group — and does not re-establish one at least as large — forces a
  * rescan, and that rescan reads the post-merge base filtered (broadcast
  * semi-join + pushed predicates) to exactly the retracting groups,
  * which are bounded by batch size. The common path stays delta-only;
  * the rescan is the provably-unavoidable case (the removed value was
  * the only witness of the old extremum).
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
      crashAfterMerge: Boolean = false,
      minMaxCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val wal = walDir(viewDir)
    val id =
      if (batchId >= 0) batchId
      else {
        val view = readStamp(spark, viewDir, ViewStamp)
        // Pending detection reads only VIEW-LOCAL state (the WAL and its
        // APPLYING marker): the protocol writes the WAL stamp before the
        // base merge and deletes the WAL only after the view stamp, so
        // every crash window of a batch leaves WAL-or-marker > view.
        // The shared BaseStamp must NOT be a pending signal — a second
        // view maintained over the same base store advances it past this
        // view's stamp on every one of ITS batches, and treating that as
        // "crashed" would push each batch down the full-rebuild branch.
        val pending = math.max(readStamp(spark, wal, WalStamp),
          readStamp(spark, wal, ApplyingStamp))
        if (pending > view) pending // unfinished attempt: resume, don't skip
        else math.max(readStamp(spark, storeDir, BaseStamp), view) + 1
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
      rebuild(spark, storeDir, viewDir, groupCols, sumCols, numBuckets, minMaxCols)
      writeStamp(spark, viewDir, ViewStamp, id)
      deleteDir(spark, wal)
      return
    }

    val materialized: DataFrame =
      if (walBatch == id) spark.read.parquet(s"$wal/delta") // write-ahead replay
      else {
        // Deltas BEFORE the base merge (they need the pre-merge images).
        val deltas = computeDeltas(spark, batch, storeDir, keys, orderCol,
          groupCols, sumCols, minMaxCols)
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
    applyDeltas(spark, materialized, viewDir, groupCols, sumCols, numBuckets,
      minMaxCols, storeDir)
    writeStamp(spark, viewDir, ViewStamp, id)
    deleteDir(spark, wal)
  }

  /** Join on the group columns with NULL-SAFE equality. groupBy treats
    * NULL as a regular group (the count/sum path rides on that), but a
    * plain equi-join silently rejects NULL keys — a null-keyed group
    * would split into duplicate view rows in the full-outer apply join
    * and vanish entirely from the inner rebuild join. The right side's
    * group columns are renamed away, matched with `<=>`, and (for outer
    * joins) coalesced back. */
  private def nsJoin(l: DataFrame, r: DataFrame, cols: Seq[String],
      how: String): DataFrame = {
    val rr = cols.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    val cond = cols.map(c => l(c) <=> rr(s"__r_$c")).reduce(_ && _)
    val joined = l.join(rr, cond, how)
    if (how == "left_semi" || how == "left_anti") joined
    else cols.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"__r_$c"))).drop(s"__r_$c"))
  }

  /** The per-group delta a merge of `batch` into the CURRENT base store
    * implies — must run before the merge rewrites the store.
    *
    * Schema: groupCols…, cnt, sum_<c>… and, when `minMaxCols` is set,
    * per column m: `ins_max_<m>`/`ins_min_<m>` (extrema of the rows this
    * batch lands in the group) and `rm_max_<m>`/`rm_min_<m>` (extrema of
    * the replaced old images leaving the group) — the apply side needs
    * the removed VALUES, not just counts, to detect extremum
    * retraction. */
  private def computeDeltas(spark: SparkSession, batch: DataFrame,
      storeDir: String, keys: Seq[String], orderCol: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    def mmAgg(rows: DataFrame, prefix: String): DataFrame = {
      val aggs = minMaxCols.flatMap(m => Seq(
        max(col(m)).as(s"${prefix}_max_$m"), min(col(m)).as(s"${prefix}_min_$m")))
      rows.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    }
    val newest = Etl.dedupFirst(batch, keys, Seq(col(orderCol).desc))
    if (!Cdc.storeExists(spark, storeDir)) {
      val d0 = contributions(newest, groupCols, sumCols)
      if (minMaxCols.isEmpty) d0
      else minMaxCols.foldLeft(nsJoin(d0, mmAgg(newest, "ins"), groupCols, "inner")) { (d, m) =>
        d.withColumn(s"rm_max_$m", lit(null).cast(d.schema(s"ins_max_$m").dataType))
          .withColumn(s"rm_min_$m", lit(null).cast(d.schema(s"ins_min_$m").dataType))
      }
    } else {
      val existing = Cdc.readStore(spark, storeDir)
        .join(newest.select(keys.map(col): _*), keys, "left_semi")
      val o = existing.select(
        keys.map(col) ++ Seq(col(orderCol).as("__o_ord")) ++
          groupCols.map(c => col(c).as(s"__o_$c")) ++
          (sumCols ++ minMaxCols.filterNot(sumCols.contains)).map(c =>
            col(c).as(s"__o_sum_$c")): _*)
      // Incoming image wins ties (MERGE update semantics) — a change
      // happens unless the store row is STRICTLY newer.
      val changed = newest.join(o, keys, "left")
        .filter(col("__o_ord").isNull || !(col("__o_ord") > col(orderCol)))
      val removedOld = changed.filter(col("__o_ord").isNotNull)
        .select(groupCols.map(c => col(s"__o_$c").as(c)) ++
          (sumCols ++ minMaxCols.filterNot(sumCols.contains)).map(c =>
            col(s"__o_sum_$c").as(c)): _*)
      val plus = contributions(changed, groupCols, sumCols)
      val minus = contributions(removedOld, groupCols, sumCols, negate = true)
      val d0 = plus.unionByName(minus)
        .groupBy(g: _*)
        .agg(sum(col("cnt")).as("cnt"),
          sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      if (minMaxCols.isEmpty) d0
      else nsJoin(nsJoin(d0, mmAgg(changed, "ins"), groupCols, "left"),
        mmAgg(removedOld, "rm"), groupCols, "left")
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
      numBuckets: Int = Cdc.DefaultBuckets,
      minMaxCols: Seq[String] = Nil): StreamingQuery =
    Cdc.readImages(spark, inDir, schema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, epochId: Long) =>
        // The streaming epoch id IS the batch id: re-delivered after any
        // crash, monotonic, so the WAL protocol can tell a replay from
        // new work.
        mergeWithView(b, storeDir, viewDir, keys, orderCol,
          groupCols, sumCols, numBuckets, batchId = epochId,
          minMaxCols = minMaxCols)
      }
      .start()

  /** Current view (bucket column dropped), one row per live group —
    * manifest-driven via the shared store layer (stat-validated,
    * self-healing), listing fallback for pre-manifest views. */
  def readView(spark: SparkSession, viewDir: String): DataFrame =
    BucketStore.readBuckets(spark, viewDir, None).drop("b")

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
    * group). With `minMaxCols`, the view rows additionally carry
    * `max_<m>`/`min_<m>`; `storeDir` supplies the post-merge base for
    * the retraction rescan (never read on the common path). */
  private def applyDeltas(spark: SparkSession, deltas: DataFrame,
      viewDir: String, groupCols: Seq[String], sumCols: Seq[String],
      numBuckets: Int, minMaxCols: Seq[String] = Nil,
      storeDir: String = null): Unit = {
    // Honor the view's pinned bucket count (fixed at creation; a later
    // different argument must not silently re-hash groups).
    val pinned = Cdc.pinnedBuckets(spark, viewDir)
    val n = if (pinned > 0) pinned else numBuckets
    val g = groupCols.map(col)
    def writeOut(rows: DataFrame, touched: Seq[Int],
        checkpoint: Boolean = true): Unit = {
      // Consumed twice, and the write below replaces the files the plan
      // reads — unless the caller's frame is already checkpoint-derived
      // (the min/max path checkpoints flagged + the rescan aggregate),
      // in which case a second materialization would just double memory.
      val merged = if (checkpoint) rows.localCheckpoint(true) else rows
      // Dynamic partition overwrite only rewrites partitions PRESENT in
      // the output — a touched bucket whose last group was removed emits
      // zero rows and would keep its stale file. Delete those explicitly.
      val present = merged.select(col("b")).distinct()
        .collect().map(_.getInt(0)).toSet
      merged.repartition(col("b")) // one file per touched bucket — keeps the view's
        // total file count at O(buckets) so later root listings don't grow
        .write.partitionBy("b").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(viewDir)
      val fs = new org.apache.hadoop.fs.Path(viewDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      touched.filterNot(present).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(viewDir, s"b=$b"), true)
      }
      // overwrite-commit refresh: touched entries := current listings
      // (emptied buckets drop out); crash before this line leaves a
      // stale manifest that the next read stat-detects and rebuilds
      BucketStore.refreshTouched(spark, viewDir, touched)
    }
    if (!Cdc.storeExists(spark, viewDir)) {
      val init0 = deltas.withColumn("b", Cdc.bucketColFor(groupCols, n))
        .filter(col("cnt") =!= 0L)
      val init = minMaxCols.foldLeft(init0) { (d, m) =>
        d.withColumn(s"max_$m", col(s"ins_max_$m"))
          .withColumn(s"min_$m", col(s"ins_min_$m"))
          .drop(s"ins_max_$m", s"ins_min_$m", s"rm_max_$m", s"rm_min_$m")
      }
      init.repartition(col("b")).write.partitionBy("b").mode("overwrite").parquet(viewDir)
      Cdc.writeBucketsFile(spark, viewDir, numBuckets)
      BucketStore.rebuildManifest(spark, viewDir) // creation pays ONE recursive listing
    } else if (minMaxCols.isEmpty) {
      val withB = deltas.withColumn("b", Cdc.bucketColFor(groupCols, n))
      val touched = withB.select(col("b")).distinct()
        .collect().map(_.getInt(0)).toSeq // bounded by the bucket count
      val existing = BucketStore.readBuckets(spark, viewDir, Some(touched))
      writeOut(existing.unionByName(withB)
        .groupBy((g :+ col("b")): _*)
        .agg(sum(col("cnt")).as("cnt"),
          sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
        .filter(col("cnt") =!= 0L), touched)
    } else {
      // MIN/MAX path: a join shape instead of a union-sum — the new
      // extremum is conditional on what left vs what remains.
      val touched = deltas.withColumn("b", Cdc.bucketColFor(groupCols, n))
        .select(col("b")).distinct().collect().map(_.getInt(0)).toSeq
      val ex = BucketStore.readBuckets(spark, viewDir, Some(touched))
        .drop("b")
        .select(g ++ Seq(col("cnt").as("__ex_cnt")) ++
          sumCols.map(c => col(s"sum_$c").as(s"__ex_sum_$c")) ++
          minMaxCols.flatMap(m => Seq(col(s"max_$m").as(s"__ex_max_$m"),
            col(s"min_$m").as(s"__ex_min_$m"))): _*)
      // null-skipping addition, matching SUM-over-union semantics
      def addN(a: Column, bCol: Column): Column =
        when(a.isNull, bCol).when(bCol.isNull, a).otherwise(a + bCol)
      // Full outer: view groups untouched by the batch must survive the
      // bucket rewrite; batch groups absent from the view are new.
      val flagged = nsJoin(deltas, ex, groupCols, "full_outer").select(
        g ++ Seq((coalesce(col("__ex_cnt"), lit(0L)) + coalesce(col("cnt"), lit(0L))).as("cnt")) ++
          sumCols.map(c => addN(col(s"__ex_sum_$c"), col(s"sum_$c")).as(s"sum_$c")) ++
          minMaxCols.flatMap { m =>
            val exMax = col(s"__ex_max_$m"); val exMin = col(s"__ex_min_$m")
            val insMax = col(s"ins_max_$m"); val insMin = col(s"ins_min_$m")
            val rmMax = col(s"rm_max_$m"); val rmMin = col(s"rm_min_$m")
            Seq(
              greatest(exMax, insMax).as(s"cand_max_$m"),
              least(exMin, insMin).as(s"cand_min_$m"),
              // retraction: the batch removed a witness of the current
              // extremum AND did not re-establish one at least as good
              (exMax.isNotNull && rmMax.isNotNull && (rmMax === exMax) &&
                (insMax.isNull || insMax < exMax)).as(s"need_max_$m"),
              (exMin.isNotNull && rmMin.isNotNull && (rmMin === exMin) &&
                (insMin.isNull || insMin > exMin)).as(s"need_min_$m"))
          }: _*)
        .localCheckpoint(true) // probed for rescan groups, then written
      val needAny = minMaxCols
        .map(m => col(s"need_max_$m") || col(s"need_min_$m")).reduce(_ || _)
      val needGroups = flagged.filter(needAny).select(g: _*)
      // Existence probe is bounded by batch size; the base is NOT read
      // unless some group actually lost its extremum.
      val resolved =
        if (needGroups.limit(1).count() == 0L) {
          minMaxCols.foldLeft(flagged) { (d, m) =>
            d.withColumn(s"max_$m", col(s"cand_max_$m"))
              .withColumn(s"min_$m", col(s"cand_min_$m"))
          }
        } else {
          // Rescan ONLY the retracting groups: broadcast semi-join keeps
          // the base scan filtered (and row-group-pruned) to them.
          val aggs = minMaxCols.flatMap(m => Seq(
            max(col(m)).as(s"re_max_$m"), min(col(m)).as(s"re_min_$m")))
          val re = nsJoin(Cdc.readStore(spark, storeDir),
              broadcast(needGroups), groupCols, "left_semi")
            .groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
            .localCheckpoint(true) // tiny (one row per retracting group);
              // resolved is consumed twice and must not re-scan the base
          minMaxCols.foldLeft(nsJoin(flagged, re, groupCols, "left")) { (d, m) =>
            d.withColumn(s"max_$m",
                when(col(s"need_max_$m"), col(s"re_max_$m")).otherwise(col(s"cand_max_$m")))
              .withColumn(s"min_$m",
                when(col(s"need_min_$m"), col(s"re_min_$m")).otherwise(col(s"cand_min_$m")))
          }.drop(minMaxCols.flatMap(m => Seq(s"re_max_$m", s"re_min_$m")): _*)
        }
      writeOut(resolved
        .drop(minMaxCols.flatMap(m => Seq(s"cand_max_$m", s"cand_min_$m",
          s"need_max_$m", s"need_min_$m")): _*)
        .filter(col("cnt") =!= 0L)
        .withColumn("b", Cdc.bucketColFor(groupCols, n)), touched,
        checkpoint = false)
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
      numBuckets: Int = Cdc.DefaultBuckets,
      minMaxCols: Seq[String] = Nil): Unit = {
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(viewDir), true)
    val base = Cdc.readStore(spark, storeDir)
    val d0 = contributions(base, groupCols, sumCols)
    val d =
      if (minMaxCols.isEmpty) d0
      else {
        val aggs = minMaxCols.flatMap(m => Seq(
          max(col(m)).as(s"ins_max_$m"), min(col(m)).as(s"ins_min_$m")))
        val mm = base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        minMaxCols.foldLeft(nsJoin(d0, mm, groupCols, "inner")) { (dd, m) =>
          dd.withColumn(s"rm_max_$m", lit(null).cast(dd.schema(s"ins_max_$m").dataType))
            .withColumn(s"rm_min_$m", lit(null).cast(dd.schema(s"ins_min_$m").dataType))
        }
      }
    applyDeltas(spark, d, viewDir, groupCols, sumCols, numBuckets, minMaxCols, storeDir)
  }
}
