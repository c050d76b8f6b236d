package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The curation stage as a continuous pipeline: documents arriving as a
  * stream (crawl drops), deduplicated and scored on the way in.
  *
  * Two properties carry over from the batch operators unchanged:
  *  - exact dedup (x1) becomes `dropDuplicatesWithinWatermark` on the
  *    content hash — state holds one 16-byte key per distinct document
  *    seen inside the watermark window, NOT per document ever seen, so
  *    state is bounded at any corpus size (re-deliveries outside the
  *    window are the store-level upsert's job, as in WeeklyFeed);
  *  - the map-only curation signals (x8 quality ratios, x24 scrub) are
  *    pure Column expressions, so the SAME expressions run on the stream
  *    with no code change and no state at all.
  */
object DocFeed {

  /** Schema of a document drop: the documents table plus an arrival
    * timestamp (a crawl/ingest time — `documents` itself is timeless). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("ingest_ts", TimestampType)))

  def readDocs(spark: org.apache.spark.sql.SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)

  /** Streaming exact dedup: first arrival of each content hash survives;
    * re-deliveries within the watermark window are dropped with bounded
    * state. */
  def dedupStream(feed: DataFrame): DataFrame =
    feed
      .withWatermark("ingest_ts", "1 hour")
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming curation signals — the x8/x24 Column expressions applied
    * verbatim to the stream (stateless, map-only). */
  def curateStream(feed: DataFrame): DataFrame = {
    // The scrub Columns are Curation's own definitions (not a re-statement
    // of them), so the batch x24 path and this stream cannot drift.
    val t = graft.ext.Curation.scrubTokens
    feed.select(
      col("doc_id"),
      (size(array_distinct(t)).cast("double") / size(t)).as("uniq_ratio"),
      graft.ext.Curation.scrubCleanText.as("clean_text"),
      graft.ext.Curation.scrubNumRemoved.as("n_removed"))
  }
}
