package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, processed in batched
  * per-partition passes — the Scala analog of `mapInPandas` (an iterator
  * of batches in, an iterator of batches out; the runtime never
  * materializes a whole partition).
  *
  * The container has no image/audio codecs, so `decodeStub` below is a
  * clearly-marked DETERMINISTIC FAKE: it derives "decoded" features from
  * the bytes alone. Everything around it — the binary column, the typed
  * feature schema, the Encoder, the batch shape, the partition-preserving
  * execution — is the real plumbing a codec would drop into.
  *
  * Scale notes: media blobs dominate row size; the pipeline keeps them in
  * a single projected binary column (parquet reads it lazily), never
  * groups or shuffles on blob bytes (only on ids/fingerprints), and all
  * feature extraction is a map-only stage.
  */
object Multimodal {

  /** Typed metadata for a decoded media object. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      mean_luma: Double)

  /** DETERMINISTIC FAKE of a media decode (`???`-equivalent): a real
    * implementation would parse the container header and decode frames.
    * This one derives stable pseudo-features from the byte content so the
    * pipeline is testable end-to-end without codecs. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
    val lumaSum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeatures(
      doc_id = id,
      n_bytes = bytes.length,
      format = if ((h & 1) == 0) "png" else "jpeg",
      width = 64 + math.floorMod(h, 960),
      height = 64 + math.floorMod(h >> 10, 960),
      mean_luma = if (bytes.isEmpty) 0.0 else lumaSum.toDouble / bytes.length)
  }

  /** Batched feature extraction over a (id, blob) dataset — iterator in,
    * iterator out, `grouped(batchSize)` giving the arrow-batch shape. */
  def extractFeatures(blobs: Dataset[(Long, Array[Byte])], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, bytes) => decodeStub(id, bytes) }
      }
    }
  }

  /** `documents.text` encoded to UTF-8 bytes plays the media blob. */
  def blobTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))

  /** x11: the full pipeline — binary column in, byte-level metadata via
    * native expressions, decoded features via the batched stub. Rows-only
    * driver check (feature values hinge on the stub); MultimodalSpec
    * pins determinism and batch behavior. */
  val pipeline = Q(
    "x11_multimodal_features",
    "binary media column → batched decode → typed features")(
    (s, dir) => {
      import s.implicits._
      val blobs = blobTable(s, dir).as[(Long, Array[Byte])]
      val feats = extractFeatures(blobs)
      val meta = blobTable(s, dir).select(
        col("doc_id"),
        octet_length(col("media")).as("blob_bytes"),
        hex(substring(col("media"), 1, 8)).as("header_hex"))
      meta.join(feats.toDF(), "doc_id")
        .select(col("doc_id"), col("blob_bytes"), col("header_hex"),
          col("format"), col("width"), col("height"), col("mean_luma"))
        .orderBy(col("doc_id"))
    })

  /** Frame-sampling analog on the byte axis: every k-th 16-byte slice of
    * the blob, as (doc_id, frame_no, frame_hex) — the explode-shaped
    * transform a video pipeline needs. */
  def sampleFrames(blobs: DataFrame, stride: Int = 64): DataFrame = {
    val nFrames = floor(octet_length(col("media")) / stride).cast("int")
    blobs
      .withColumn("frame_no", explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .select(col("doc_id"), col("frame_no"),
        hex(col("media").substr(col("frame_no") * stride + 1, lit(16))).as("frame_hex"))
  }

  val all: Seq[Q] = Seq(pipeline)
}
