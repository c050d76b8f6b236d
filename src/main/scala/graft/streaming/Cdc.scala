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
  * keys hash into: the existing-side read partition-prunes to the
  * touched buckets, and the write uses dynamic partition overwrite, so
  * at 100 TB a trickle of CDC images pays for the touched slice of the
  * store, not a full-corpus rewrite per batch (the round-4 shape).
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
        // count, so the root listing every later merge pays is O(buckets), not
        // O(buckets × writer-tasks) growing with history
        .write.partitionBy("b").mode("overwrite").parquet(storeDir)
      writeBucketsFile(spark, storeDir, n)
    } else {
      val touched = batch.select(bucketCol(keys, n)).distinct()
        .collect().map(_.getInt(0)).toSeq
      val existing = spark.read.parquet(storeDir)
        .filter(col("b").isin(touched: _*)) // partition-pruned scan
      val merged = Etl.dedupFirst(
        existing.withColumn("__src", lit(0))
          .unionByName(newest.withColumn("__src", lit(1))),
        keys, Seq(col(orderCol).desc, col("__src").desc))
        .drop("__src")
      merged.repartition(col("b")) // one file per touched bucket (see creation note)
        .write.partitionBy("b").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(storeDir)
    }
  }

  /** Current store contents (bucket column dropped). */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir).drop("b")
}
