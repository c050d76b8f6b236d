package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The shared hash-bucketed parquet store layer — one layout, one
  * metadata discipline, four users ([[Cdc]] snapshots, [[AggView]] view
  * stores, [[BlockDedupFeed]] block indexes, [[PqIndexFeed]] code
  * tables).
  *
  * Layout: `b=<k>/` partition directories with
  * `k = pmod(xxhash64(keys…), n)`, the bucket count pinned in a
  * `_BUCKETS` file at creation (re-hashing an existing store would
  * silently split keys across buckets, so a later different `numBuckets`
  * argument is ignored by every user).
  *
  * Metadata: a `_MANIFEST` file caching the store's live data files
  * (one `<bucket>\t<relative-path>` line per file; underscore-prefixed →
  * invisible to partition discovery). The manifest exists because the
  * alternative is O(buckets) listing per touched-bucket read:
  * `spark.read.parquet(store)` lists the root plus every `b=<k>`
  * directory before it can prune, and with buckets ∝ snapshot size that
  * listing GROWS WITH HISTORY — the round-10 IncProbe disease. With the
  * manifest, a read stats only the files it would open anyway: cost
  * follows the BATCH, which is the whole incremental contract. This is
  * the table-format move (Delta/Iceberg put file lists in the commit
  * log for the same reason).
  *
  * Two commit disciplines, matching the two writer shapes:
  *
  *  - OVERWRITE stores (Cdc, AggView): dynamic partition overwrite
  *    replaces whole bucket directories, then [[refreshTouched]]
  *    re-lists exactly those directories. A crash between the two
  *    leaves the manifest STALE — pointing at files the overwrite
  *    deleted — which every manifest-driven read detects by stat'ing
  *    its file list ([[validatedFiles]]) and repairs by one recursive
  *    [[rebuildManifest]] listing; the writer's replay then converges
  *    (merges are idempotent by order-column competition). No manual
  *    `_MANIFEST` deletion, ever — the round-11 advisor finding.
  *
  *  - APPEND stores (BlockDedupFeed, PqIndexFeed): the manifest is the
  *    COMMIT POINT. [[snapshotBuckets]] before the write and
  *    [[appendToManifest]] with the before/after difference means the
  *    manifest gains exactly the files this batch wrote: a crash
  *    between data write and manifest append leaves ORPHAN files that
  *    no manifest-driven read ever sees — logically the append never
  *    happened, the replayed batch recomputes identical decisions,
  *    re-appends, and commits; orphans are physical garbage only,
  *    reclaimed when compaction's dynamic overwrite replaces the
  *    bucket directory. One recovery path CAN make orphans visible:
  *    a [[rebuildManifest]] (triggered when a crashed COMPACTION left
  *    the manifest pointing at deleted files) lists the raw
  *    directories and so resurrects any crashed-append orphan next to
  *    its replayed twin. Replay determinism makes the twins
  *    byte-identical, so the READ CONTRACT for append stores is:
  *    every read path deduplicates on the store's logical key
  *    (BlockDedupFeed on `bh`, PqIndexFeed on `(vec_id, sub)`), and
  *    compaction heals the duplication permanently by deduping before
  *    it rewrites.
  *
  * Concurrency contract: ONE WRITER PER STORE. [[commitAppended]] and
  * [[refreshTouched]] are read-modify-write over the whole `_MANIFEST`
  * with a last-writer-wins rename — two concurrent writers (or a
  * compaction racing an append) would silently drop each other's
  * entries, making committed rows invisible. Every feed here is driven
  * by a single sequential micro-batch loop (foreachBatch / one ingest
  * driver per store), which is also the assumption the append protocol's
  * replay argument rests on; a multi-writer deployment needs a real
  * commit log (Delta/Iceberg) instead of this manifest.
  */
object BucketStore {

  private def bucketsPath(storeDir: String) = new Path(storeDir, "_BUCKETS")
  private def manifestPath(storeDir: String) = new Path(storeDir, "_MANIFEST")

  /** Bucket-assignment column for a key list. */
  def bucketCol(keys: Seq[String], n: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(n.toLong)).cast("int").as("b")

  /** The store's pinned bucket count, or 0 if the store is unborn. */
  def pinnedBuckets(spark: SparkSession, storeDir: String): Int = {
    val p = bucketsPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt
      finally in.close()
    }
  }

  /** Whether a bucketed store has been created at `dir`. */
  def storeExists(spark: SparkSession, dir: String): Boolean =
    pinnedBuckets(spark, dir) > 0

  def writeBucketsFile(spark: SparkSession, storeDir: String, n: Int): Unit = {
    val p = bucketsPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** The manifest's file map, or `None` for a pre-manifest store (every
    * reader falls back to directory listing and the next write
    * self-heals by writing one). */
  def readManifest(spark: SparkSession,
      storeDir: String): Option[Map[Int, Seq[String]]] = {
    val p = manifestPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Some(text.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(b, f) = line.split("\t", 2)
        (b.toInt, f)
      }.toSeq.groupMap(_._1)(_._2))
    }
  }

  private def writeManifest(spark: SparkSession, storeDir: String,
      entries: Map[Int, Seq[String]]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val tmp = new Path(storeDir, "_MANIFEST.tmp")
    val fs = tmp.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(entries.toSeq.sortBy(_._1)
      .flatMap { case (b, fsq) => fsq.sorted.map(f => s"$b\t$f") }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val fc = FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(manifestPath(storeDir)),
      Options.Rename.OVERWRITE)
  }

  /** Data files of one `b=<k>` directory as manifest-relative paths —
    * one targeted listing, O(files-in-bucket). */
  def listBucketFiles(spark: SparkSession, storeDir: String,
      bucket: Int): Seq[String] = {
    val dir = new Path(storeDir, s"b=$bucket")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
      .map(st => s"b=$bucket/${st.getPath.getName}")
  }

  /** Rebuild `_MANIFEST` from one recursive listing — store creation,
    * and the overwrite stores' recovery path after a crash mid-commit. */
  def rebuildManifest(spark: SparkSession, storeDir: String): Unit = {
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = scala.collection.mutable.Map.empty[Int, List[String]]
    if (fs.exists(root)) {
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        val parent = st.getPath.getParent.getName
        if (st.isFile && parent.startsWith("b=") &&
            !name.startsWith("_") && !name.startsWith(".")) {
          val b = parent.drop(2).toInt
          entries.updateWith(b)(old => Some(s"$parent/$name" :: old.getOrElse(Nil)))
        }
      }
    }
    writeManifest(spark, storeDir, entries.view.mapValues(_.toSeq).toMap)
  }

  /** Overwrite-commit refresh: the touched buckets' manifest entries
    * become their CURRENT directory listings (O(touched) targeted
    * listings, one file each under the one-file-per-bucket write
    * discipline). No-op fallback to [[rebuildManifest]] for a
    * pre-manifest store. */
  def refreshTouched(spark: SparkSession, storeDir: String,
      touched: Seq[Int]): Unit =
    readManifest(spark, storeDir) match {
      case Some(m) => writeManifest(spark, storeDir,
        (m ++ touched.map(b => b -> listBucketFiles(spark, storeDir, b)))
          .filter(_._2.nonEmpty))
      case None => rebuildManifest(spark, storeDir)
    }

  /** One-time migration for a pre-manifest store: build the manifest
    * from the current listing so later append commits extend it rather
    * than shadowing the existing files. No-op when one exists. */
  def ensureManifest(spark: SparkSession, storeDir: String): Unit =
    if (readManifest(spark, storeDir).isEmpty) rebuildManifest(spark, storeDir)

  /** Current per-bucket file sets of the touched dirs — the "before"
    * side of an append commit's before/after difference. */
  def snapshotBuckets(spark: SparkSession, storeDir: String,
      touched: Seq[Int]): Map[Int, Set[String]] =
    touched.map(b => b -> listBucketFiles(spark, storeDir, b).toSet).toMap

  /** Append-commit: add exactly the files that appeared in `touched`
    * since `before` ([[snapshotBuckets]]) — orphans from earlier
    * crashed appends stay invisible (see object doc). Initializes the
    * manifest for a first-append store. */
  def commitAppended(spark: SparkSession, storeDir: String,
      touched: Seq[Int], before: Map[Int, Set[String]]): Unit = {
    val m = readManifest(spark, storeDir).getOrElse(Map.empty)
    val added = touched.map { b =>
      val pre = before.getOrElse(b, Set.empty)
      b -> listBucketFiles(spark, storeDir, b).filterNot(pre)
    }
    writeManifest(spark, storeDir,
      added.foldLeft(m) { case (acc, (b, fs)) =>
        if (fs.isEmpty) acc else acc.updated(b, acc.getOrElse(b, Nil) ++ fs)
      })
  }

  /** Replace-commit: the touched buckets' manifest entries become EXACTLY
    * the files that appeared since `before` ([[snapshotBuckets]]) — one
    * atomic manifest swap that makes every pre-existing file of those
    * buckets invisible garbage WITHOUT a physical delete. This is the
    * compaction commit for append stores whose rows are NOT immutable
    * (folded count partials: two generations visible at once would
    * double-sum, so the dedup-on-logical-key heal that protects
    * [[commitAppended]] stores cannot apply). Because nothing is
    * deleted, the stat-validation rebuild — the one path that can
    * resurrect invisible files — is never triggered by this commit;
    * a crash BEFORE the swap leaves the new files as invisible orphans
    * and re-running the compaction converges. Replaced files are
    * physical garbage; reclaim with a manifest-diff vacuum once the
    * swap is durable. */
  def commitReplaced(spark: SparkSession, storeDir: String,
      touched: Seq[Int], before: Map[Int, Set[String]]): Unit = {
    val m = readManifest(spark, storeDir).getOrElse(Map.empty)
    val repl = touched.map { b =>
      val pre = before.getOrElse(b, Set.empty)
      b -> listBucketFiles(spark, storeDir, b).filterNot(pre)
    }
    writeManifest(spark, storeDir, (m ++ repl).filter(_._2.nonEmpty))
  }

  /** Delete every data file under `b=<k>` dirs that the manifest does
    * not reference — the garbage left by [[commitReplaced]] swaps and
    * crashed appends. Safe under the one-writer contract: an invisible
    * file is never read, and a replayed batch re-appends FRESH files
    * rather than re-attaching old orphans. No-op for pre-manifest
    * stores (everything visible there). */
  def vacuum(spark: SparkSession, storeDir: String): Unit =
    readManifest(spark, storeDir).foreach { m =>
      val live = m.values.flatten.toSet
      val root = new Path(storeDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(root)) {
        val it = fs.listFiles(root, true)
        val doomed = scala.collection.mutable.ListBuffer.empty[Path]
        while (it.hasNext) {
          val st = it.next()
          val name = st.getPath.getName
          val parent = st.getPath.getParent.getName
          if (st.isFile && parent.startsWith("b=") &&
              !name.startsWith("_") && !name.startsWith(".") &&
              !live.contains(s"$parent/$name"))
            doomed += st.getPath
        }
        doomed.foreach(fs.delete(_, false))
      }
    }

  /** The manifest's file list for `touched` (all buckets when None),
    * VALIDATED: every listed file is stat'ed (driver-side, bounded by
    * the files the read would open anyway) and any missing file —
    * the stale-manifest crash signature — triggers one
    * [[rebuildManifest]] and a re-read, automatically. Returns None
    * for a pre-manifest store (callers fall back to listing reads). */
  def validatedFiles(spark: SparkSession, storeDir: String,
      touched: Option[Seq[Int]]): Option[Seq[String]] = {
    def files(m: Map[Int, Seq[String]]): Seq[String] = touched match {
      case Some(bs) => bs.flatMap(b => m.getOrElse(b, Nil))
      case None => m.values.flatten.toSeq
    }
    readManifest(spark, storeDir).map { m =>
      val rel = files(m)
      val fs = new Path(storeDir).getFileSystem(spark.sessionState.newHadoopConf())
      if (rel.forall(f => fs.exists(new Path(storeDir, f)))) rel
      else { // stale manifest: heal and trust the rebuilt listing
        rebuildManifest(spark, storeDir)
        files(readManifest(spark, storeDir).get)
      }
    }
  }

  /** Append one batch of rows to an append store under the full commit
    * protocol: pin `_BUCKETS` before the first append, ensure the
    * manifest, bucket by `keys`, snapshot the touched dirs, write one
    * file per touched bucket, and commit exactly the before/after
    * difference ([[commitAppended]]). Shared by [[LmFeed]]'s count
    * partials and [[MinHashFeed]]'s four index stores. */
  def appendRows(spark: SparkSession, store: String, rows: DataFrame,
      keys: Seq[String], numBuckets: Int): Unit = {
    val pinned = pinnedBuckets(spark, store)
    val n = if (pinned > 0) pinned else numBuckets
    if (pinned == 0) writeBucketsFile(spark, store, n)
    else ensureManifest(spark, store)
    val withB = rows.withColumn("b", bucketCol(keys, n))
      .localCheckpoint() // touched-bucket collect + write; batch-sized
    val touched = withB.select(col("b")).distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by the bucket count
    val before = snapshotBuckets(spark, store, touched)
    withB.repartition(col("b")) // one file per touched bucket per batch
      .write.partitionBy("b").mode("append").parquet(store)
    commitAppended(spark, store, touched, before)
  }

  /** Read the touched buckets (all when None): manifest fast path with
    * stat validation; pre-manifest stores fall back to one
    * partition-discovery read with a bucket filter. `schemaHint`
    * covers the empty-file-list case (all-fresh buckets) and lets
    * append stores read consistently before their first compaction;
    * without it the schema comes from any one manifest file. */
  def readBuckets(spark: SparkSession, storeDir: String,
      touched: Option[Seq[Int]],
      schemaHint: Option[StructType] = None): DataFrame =
    validatedFiles(spark, storeDir, touched) match {
      case Some(files) =>
        val reader0 = spark.read.option("basePath", storeDir)
        val reader = schemaHint.fold(reader0)(reader0.schema)
        if (files.nonEmpty) reader.parquet(files.map(f => s"$storeDir/$f"): _*)
        else schemaHint match {
          case Some(sc) => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
          case None =>
            // schema from any one live file of the whole store; a
            // fully-empty manifest falls back to partition discovery
            // (matches the pre-manifest read for degenerate stores)
            readManifest(spark, storeDir).get.values.flatten.headOption match {
              case Some(any) => reader0.parquet(s"$storeDir/$any").limit(0)
              case None => reader0.parquet(storeDir)
            }
        }
      case None =>
        val reader0 = spark.read.option("basePath", storeDir)
        val reader = schemaHint.fold(reader0)(reader0.schema)
        touched match {
          case Some(bs) => reader.parquet(storeDir)
            .filter(col("b").isin(bs: _*)) // partition-pruned scan
          case None => reader.parquet(storeDir)
        }
    }
}
