package graft.streaming

import graft.etl.Etl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Change-data-capture apply as a continuous pipeline: a stream of row
  * images (inserts + updates, keyed) MERGEd into the parquet snapshot
  * store per micro-batch — the streaming face of `Etl.merge`, sibling of
  * WeeklyFeed's insert-only feed.
  *
  * Scale notes: each micro-batch pays one keyed full-outer join against
  * the store (AQE broadcasts small batches); state lives in the store,
  * not the stream — no streaming state at all, so batch size, not
  * history, bounds memory. Replays are idempotent because MERGE of the
  * same images is a fixpoint. */
object Cdc {

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
      keys: Seq[String], orderCol: String): StreamingQuery =
    readImages(spark, inDir, schema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoStore(batch, storeDir, keys, orderCol)
      }
      .start()

  /** MERGE a batch of row images into the parquet snapshot. Newest image
    * per key wins GLOBALLY, not just within the batch: the store row
    * competes on `orderCol` too, so a stale image re-delivered in a later
    * micro-batch (or files replayed out of order into a fresh checkpoint)
    * can never overwrite a newer store row — without this, "newest wins"
    * held only within one batch and replay order changed the result. On
    * an `orderCol` tie the incoming image wins (MERGE update semantics).
    * Committed via the shared SnapshotStore version-and-swap. */
  def mergeIntoStore(batch: DataFrame, storeDir: String,
      keys: Seq[String], orderCol: String): Unit = {
    val newest = Etl.dedupFirst(batch, keys, Seq(col(orderCol).desc))
    SnapshotStore.commit(newest, storeDir) { (existing, incoming) =>
      Etl.dedupFirst(
        existing.withColumn("__src", lit(0))
          .unionByName(incoming.withColumn("__src", lit(1))),
        keys, Seq(col(orderCol).desc, col("__src").desc))
        .drop("__src")
    }
  }
}
