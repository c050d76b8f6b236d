package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The one snapshot-store commit protocol, shared by every foreachBatch
  * writer (WeeklyFeed's insert-only feed, Cdc's MERGE apply): read the
  * current snapshot if one exists, combine it with the batch, then
  * version-and-swap — materialize to `<store>.next` and only then
  * overwrite the store, the batch analog of the reference's
  * single-transaction commit (load-hhs.py:28-33). Keeping the protocol
  * in one place means a crash-safety fix lands everywhere at once. */
object SnapshotStore {

  /** Apply `combine(existing, batch-aligned-to-existing-columns)` when a
    * snapshot exists, else seed the store with the batch. */
  def commit(batch: DataFrame, storeDir: String)(
      combine: (DataFrame, DataFrame) => DataFrame): Unit = {
    val spark = batch.sparkSession
    val store = new java.io.File(storeDir)
    val merged =
      if (store.exists() && store.listFiles().exists(_.getName.endsWith(".parquet"))) {
        val existing = spark.read.parquet(storeDir)
        combine(existing, batch.select(existing.columns.map(col): _*))
      } else batch
    val tmp = storeDir + ".next"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(storeDir)
  }
}
