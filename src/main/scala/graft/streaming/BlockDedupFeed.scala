package graft.streaming

import graft.ext.Rewrite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** x43's span-level dedup as CONTINUOUS ingestion — the shape a
  * production corpus actually runs: nobody re-deduplicates 100 TB per
  * day; the daily crawl drop is deduplicated against a persistent index
  * of every block ever kept, and only the increment pays.
  *
  * The index is an APPEND-ONLY parquet table (block md5 → packed first
  * owner). Keep-first makes ownership immutable — a block's first owner
  * never changes — so maintaining the index never rewrites anything:
  * each batch appends exactly the rows for blocks it introduced. A
  * batch's decision rule is
  *
  *   keep = first-in-batch AND (absent from index OR index owner == me)
  *
  * and the self-ownership disjunct is what makes REPLAY idempotent: a
  * re-run batch finds its own blocks in the index, owned by itself, and
  * reproduces the identical output; its would-be appends are empty. A
  * crash between output write and index append (either order) therefore
  * reconverges on replay, and the per-batch output directory
  * (`out/batch=<id>`, dynamic overwrite) makes the output side
  * idempotent too.
  *
  * Scale shape: per batch, one window over the batch's own blocks
  * (batch-sized), one left join against the index on the block-hash key
  * (shuffle of the BATCH side; the index side partition-prunes nothing
  * here but shuffles only (hash, owner) pairs — at deployment scale the
  * index would live in the Cdc-style hash-bucketed layout so the join
  * touches only the buckets the batch hashes into), one per-doc
  * regroup, and an append of the new owners. History never rewrites;
  * state lives in the store, not the stream — batch size, not corpus
  * size, bounds memory. */
object BlockDedupFeed {

  private val idxSchema = StructType(Seq(
    StructField("bh", StringType), StructField("owner", LongType)))

  private def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val fs = new Path(indexDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(indexDir))) spark.read.schema(idxSchema).parquet(indexDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], idxSchema)
  }

  /** Deduplicate one document batch against (and into) the index at
    * `indexDir`; returns the x43-shaped rewrite of the batch. Owners
    * are appended BEFORE the caller writes the output — either order
    * is crash-safe (see object doc), this one makes the returned frame
    * independently re-derivable. */
  def applyBatch(batch: DataFrame, indexDir: String): DataFrame = {
    val spark = batch.sparkSession
    val blocks = Rewrite.blockFrame(batch.select(col("doc_id"), col("text")))
      .withColumn("bh", md5(col("btxt")))
      .withColumn("p", Rewrite.packedCol)
      .localCheckpoint() // read twice (flag + append); batch-sized
    val idx = readIndex(spark, indexDir)
    val flagged = blocks
      .withColumn("bf", col("p") === min(col("p")).over(Window.partitionBy(col("bh"))))
      .join(idx, Seq("bh"), "left")
      .withColumn("keep", col("bf") && (col("owner").isNull || col("owner") === col("p")))
      .localCheckpoint() // decisions must not shift between append and output
    val newOwners = flagged
      .filter(col("bf") && col("owner").isNull)
      .select(col("bh"), col("p").as("owner"))
    if (!newOwners.isEmpty)
      newOwners.write.mode("append").parquet(indexDir)
    Rewrite.reassemble(flagged.select(col("doc_id"), col("blk"), col("btxt"), col("keep")))
  }

  /** The continuous pipeline: document drops in, per-batch rewritten
    * corpus out (one directory per micro-batch — idempotent under
    * replay), block index maintained incrementally. */
  def run(spark: SparkSession, inDir: String, indexDir: String,
      outDir: String, checkpointDir: String): StreamingQuery =
    DocFeed.readDocs(spark, inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, indexDir)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
}
