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

  /** MERGE a batch of row images into the parquet snapshot: collapse the
    * batch to one image per key first (a full-outer MERGE with duplicate
    * update keys would multiply rows), then update-matched /
    * insert-unmatched / retain-rest, committed with the same
    * version-and-swap as WeeklyFeed. */
  def mergeIntoStore(batch: DataFrame, storeDir: String,
      keys: Seq[String], orderCol: String): Unit = {
    val spark = batch.sparkSession
    val newest = Etl.dedupFirst(batch, keys, Seq(col(orderCol).desc))
    val store = new java.io.File(storeDir)
    val merged =
      if (store.exists() && store.listFiles().exists(_.getName.endsWith(".parquet"))) {
        val existing = spark.read.parquet(storeDir)
        Etl.merge(existing, newest.select(existing.columns.map(col): _*), keys)
      } else newest
    val tmp = storeDir + ".next"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(storeDir)
  }
}
