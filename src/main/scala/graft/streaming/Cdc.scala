package graft.streaming

import graft.etl.Etl
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Change-data-capture apply as a continuous pipeline: a stream of row
  * images (inserts + updates, keyed) MERGEd into a hash-BUCKETED parquet
  * snapshot store per micro-batch — the streaming face of `Etl.merge`,
  * sibling of WeeklyFeed's insert-only feed.
  *
  * Store layout: `<store>/b=<k>/` partition directories, `k =
  * pmod(xxhash64(keys), n)`, with the bucket count pinned in a
  * `_BUCKETS` file at creation (underscore-prefixed → invisible to
  * partition discovery). A micro-batch rewrites ONLY the buckets its
  * keys hash into: the existing-side read resolves the touched
  * buckets' files through the `_MANIFEST` cache (falling back to a
  * partition-pruned listing scan for pre-manifest stores), and the
  * write uses dynamic partition overwrite, so at 100 TB a trickle of
  * CDC images pays for the touched slice of the store, not a
  * full-corpus rewrite per batch (the round-4 shape) — and not even a
  * full-store LISTING per batch (the round-10 residual: with buckets
  * ∝ snapshot size, O(buckets) root listing made the history axis
  * 2.4× instead of flat; see [[readManifest]]).
  *
  * Scale notes: each micro-batch pays one keyed join against the
  * touched buckets only (AQE broadcasts small batches); state lives in
  * the store, not the stream — no streaming state at all, so batch
  * size, not history, bounds memory. Replays are idempotent because
  * MERGE of the same images is a fixpoint — which also repairs the one
  * non-atomicity left: the committer swaps partitions one at a time, so
  * a crash mid-commit can land a prefix of the touched buckets, and the
  * replay reconverges the rest. */
object Cdc {

  val DefaultBuckets = 8

  /** File-source stream of row-image drops. */
  def readImages(spark: SparkSession, inDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)

  /** The CDC pipeline: per micro-batch, newest image per key wins (ties
    * broken by `orderCol` descending), then MERGE into the store. */
  def runCdc(spark: SparkSession, inDir: String, schema: StructType,
      storeDir: String, checkpointDir: String,
      keys: Seq[String], orderCol: String,
      numBuckets: Int = DefaultBuckets): StreamingQuery =
    readImages(spark, inDir, schema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoStore(batch, storeDir, keys, orderCol, numBuckets)
      }
      .start()

  private def bucketsPath(storeDir: String) = new Path(storeDir, "_BUCKETS")

  private def manifestPath(storeDir: String) = new Path(storeDir, "_MANIFEST")

  /** The store's live data files per bucket, from the `_MANIFEST` cache
    * (one `<bucket>\t<relative-path>` line per file; underscore-prefixed
    * → invisible to partition discovery). `None` for a pre-manifest
    * store — every reader falls back to directory listing and the next
    * merge self-heals by writing one.
    *
    * The manifest exists because the alternative is O(buckets) listing
    * per merge: `spark.read.parquet(store)` lists the root plus every
    * `b=<k>` directory before it can prune to the touched ones, and
    * with buckets ∝ snapshot size that listing GROWS WITH HISTORY —
    * the one non-flat IncProbe row of round 10 (2.4× at 10× history,
    * all of it metadata). With the manifest, a merge stats only the
    * touched buckets' files: cost follows the BATCH, which is the
    * whole incremental contract. This is the table-format move
    * (Delta/Iceberg put file lists in the commit log for the same
    * reason).
    *
    * Crash contract: the manifest is written AFTER the data commit, so
    * a crash between the two leaves it stale (pointing at files the
    * dynamic-partition overwrite deleted). Recovery = delete
    * `_MANIFEST` (or call [[rebuildManifest]]); every path here falls
    * back to listing when it is absent, and the next merge rewrites
    * it — the same replay-reconverges posture as the partition swap
    * itself. */
  private[graft] def readManifest(spark: SparkSession,
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
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(manifestPath(storeDir)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Data files of one `b=<k>` directory as manifest-relative paths —
    * one targeted listing, O(files-in-bucket) = O(1) with the
    * one-file-per-bucket write discipline. */
  private def listBucketFiles(spark: SparkSession, storeDir: String,
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
    * and the recovery path after a crash mid-merge. */
  private[streaming] def rebuildManifest(spark: SparkSession, storeDir: String): Unit = {
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(root, true)
    val entries = scala.collection.mutable.Map.empty[Int, List[String]]
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
    writeManifest(spark, storeDir, entries.view.mapValues(_.toSeq).toMap)
  }

  /** The store's pinned bucket count, or 0 if the store is unborn. The
    * count is fixed at creation (a later different `numBuckets` argument
    * is ignored) — re-hashing an existing store would silently split
    * keys across buckets. */
  private[streaming] def pinnedBuckets(spark: SparkSession, storeDir: String): Int = {
    val p = bucketsPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt
      finally in.close()
    }
  }

  /** Whether a bucketed store has been created at `dir` (its `_BUCKETS`
    * pin exists). Shared with [[AggView]]'s view store, which uses the
    * same layout. */
  private[streaming] def storeExists(spark: SparkSession, dir: String): Boolean =
    pinnedBuckets(spark, dir) > 0

  /** [[AggView]]'s access to the bucket-assignment column. */
  private[streaming] def bucketColFor(cols: Seq[String], n: Int) =
    bucketCol(cols, n)

  private[streaming] def writeBucketsFile(spark: SparkSession, storeDir: String, n: Int): Unit = {
    val p = bucketsPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes("UTF-8"))
    finally out.close()
  }

  private def bucketCol(keys: Seq[String], n: Int) =
    pmod(xxhash64(keys.map(col): _*), lit(n.toLong)).cast("int").as("b")

  /** MERGE a batch of row images into the bucketed parquet snapshot.
    * Newest image per key wins GLOBALLY, not just within the batch: the
    * store row competes on `orderCol` too, so a stale image re-delivered
    * in a later micro-batch (or files replayed out of order into a fresh
    * checkpoint) can never overwrite a newer store row. On an `orderCol`
    * tie the incoming image wins (MERGE update semantics).
    *
    * Partition-targeted: only the buckets the batch's keys hash into are
    * read back and rewritten (dynamic partition overwrite); every other
    * `b=<k>` directory is untouched on disk. The touched-bucket set is a
    * driver-side collect BOUNDED BY the bucket count — metadata, not
    * data. */
  def mergeIntoStore(batch: DataFrame, storeDir: String,
      keys: Seq[String], orderCol: String,
      numBuckets: Int = DefaultBuckets): Unit = {
    val spark = batch.sparkSession
    val pinned = pinnedBuckets(spark, storeDir)
    val n = if (pinned > 0) pinned else numBuckets
    val newest = Etl.dedupFirst(batch, keys, Seq(col(orderCol).desc))
      .withColumn("b", bucketCol(keys, n))
    if (pinned == 0) {
      newest.repartition(col("b")) // one file per bucket: store file count stays = bucket
        // count, so any listing fallback is O(buckets), not
        // O(buckets × writer-tasks) growing with history
        .write.partitionBy("b").mode("overwrite").parquet(storeDir)
      writeBucketsFile(spark, storeDir, n)
      rebuildManifest(spark, storeDir) // creation pays ONE recursive listing
    } else {
      val touched = batch.select(bucketCol(keys, n)).distinct()
        .collect().map(_.getInt(0)).toSeq
      val manifest = readManifest(spark, storeDir)
      val existing = manifest match {
        case Some(m) =>
          // Manifest fast path: the exact file list of the touched
          // buckets — stats O(batch-keys) files, never lists the root.
          // basePath re-attaches the b partition column from the paths.
          val files = touched.flatMap(b => m.getOrElse(b, Nil))
            .map(f => s"$storeDir/$f")
          if (files.isEmpty) newest.filter(lit(false)) // all-fresh buckets
          else spark.read.option("basePath", storeDir).parquet(files: _*)
        case None => // pre-manifest store: the listing path, self-heals below
          spark.read.parquet(storeDir)
            .filter(col("b").isin(touched: _*)) // partition-pruned scan
      }
      val merged = Etl.dedupFirst(
        existing.withColumn("__src", lit(0))
          .unionByName(newest.withColumn("__src", lit(1))),
        keys, Seq(col(orderCol).desc, col("__src").desc))
        .drop("__src")
      merged.repartition(col("b")) // one file per touched bucket (see creation note)
        .write.partitionBy("b").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(storeDir)
      manifest match {
        case Some(m) =>
          // Refresh only the touched buckets' entries — O(touched)
          // targeted listings, each one file under the write discipline.
          writeManifest(spark, storeDir,
            m ++ touched.map(b => b -> listBucketFiles(spark, storeDir, b)))
        case None => rebuildManifest(spark, storeDir) // self-heal: one full listing
      }
    }
  }

  /** Current store contents (bucket column dropped) — manifest-driven
    * when available (no directory walk), listing fallback otherwise. */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    readManifest(spark, storeDir) match {
      case Some(m) if m.nonEmpty =>
        spark.read.option("basePath", storeDir)
          .parquet(m.values.flatten.map(f => s"$storeDir/$f").toSeq: _*)
          .drop("b")
      case _ => spark.read.parquet(storeDir).drop("b")
    }
}
