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
  * The decode is REAL for the raster formats the JDK ships codecs for
  * (PNG/JPEG/GIF/BMP via `javax.imageio`, zero external dependencies):
  * format sniffed from magic bytes, then width/height/mean-luma from the
  * decoded pixels. For everything else (audio/video containers — no codec
  * in a bare JVM) `decodeStub` remains the clearly-marked DETERMINISTIC
  * FAKE fallback, so the pipeline stays total and testable end-to-end.
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

  /** Magic-byte format sniff for the raster formats `javax.imageio` can
    * decode. Returns None for anything else (text blobs, audio/video). */
  def detectImageFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
             (bytes(1) & 0xff) == 0xd8) Some("jpeg")
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
             bytes(2) == 'F' && bytes(3) == '8') Some("gif")
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else None

  /** REAL media decode for JDK-supported raster images: dimensions from
    * the decoded raster, mean luma as Rec.601 luminance over all pixels.
    * Falls back to `decodeStub` when the blob is not a decodable image
    * (wrong magic, truncated file, or a format the JVM has no codec for),
    * so the batched pipeline never throws on dirty data — the production
    * posture for a 100 TB crawl where a fraction of blobs is always
    * corrupt. */
  def decode(id: Long, bytes: Array[Byte]): MediaFeatures =
    detectImageFormat(bytes) match {
      case Some(fmt) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) decodeStub(id, bytes)
        else {
          val w = img.getWidth
          val h = img.getHeight
          // bulk row reads: per-pixel getRGB pays ColorModel dispatch per
          // call, which dominates decode on megapixel images in the
          // batched hot path — one packed-ARGB row fetch amortizes it
          val row = new Array[Int](w)
          var lumaSum = 0.0
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val rgb = row(x)
              lumaSum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          MediaFeatures(id, bytes.length, fmt, w, h, lumaSum / (w.toLong * h))
        }
      case None => decodeStub(id, bytes)
    }

  /** DETERMINISTIC FAKE fallback for blobs without a JVM codec: a real
    * implementation would parse the container and decode frames. This one
    * derives stable pseudo-features from the byte content so the pipeline
    * is testable end-to-end on any blob. */
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
        batch.map { case (id, bytes) => decode(id, bytes) }
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
