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

  /** x192 frame geometry — ONE pair of constants interpolated into the
    * Spark form AND the oracle SQL (stride in bytes between frames;
    * header bytes sliced per frame), so the two can never desynchronize. */
  val FrameStride = 64
  val FrameHeader = 16

  /** Frame-sampling analog on the byte axis: every k-th header slice of
    * the blob, as (doc_id, frame_no, frame_hex) — the explode-shaped
    * transform a video pipeline needs. */
  def sampleFrames(blobs: DataFrame, stride: Int = FrameStride,
      header: Int = FrameHeader): DataFrame = {
    val nFrames = floor(octet_length(col("media")) / stride).cast("int")
    blobs
      .withColumn("frame_no", explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .select(col("doc_id"), col("frame_no"),
        hex(col("media").substr(col("frame_no") * stride + 1, lit(header))).as("frame_hex"))
  }

  /** 64-bit average-hash (aHash) — the classic perceptual image
    * fingerprint: 8×8 grid of block-mean lumas, each bit = "block above
    * the global mean". Near-identical images (recompress, small edits,
    * resize) flip only a few bits, so near-dup detection is a small
    * Hamming ball around each hash. Decodable rasters hash their PIXEL
    * lumas over integer-arithmetic block boundaries (resize-free — the
    * 8×8 "resize" IS the block-mean grid); non-image blobs fall back to
    * the same thresholding over a 64-bucket histogram of hashed byte
    * 4-GRAMS — shift-robust (an edit moves only the buckets of the
    * ≤ 7 grams it touches; equal byte SLICES were tried first and
    * realign wholesale on one insertion) yet content-discriminating
    * (unrelated blobs draw different gram sets, so ~half the bits
    * disagree; a plain byte-VALUE histogram was tried second and
    * collapsed a same-vocabulary corpus into one hash). Byte-identical
    * blobs collide exactly; the pipeline stays total on dirty data. */
  def aHash(bytes: Array[Byte]): Long = {
    val means: Array[Double] = detectImageFormat(bytes).flatMap { _ =>
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }
      img.map { im =>
        val w = im.getWidth; val h = im.getHeight
        val sums = new Array[Double](64)
        val cnts = new Array[Long](64)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          im.getRGB(0, y, w, 1, row, 0, w)
          val by = (y.toLong * 8 / h).toInt
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val luma = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            val b = by * 8 + (x.toLong * 8 / w).toInt
            sums(b) += luma; cnts(b) += 1
            x += 1
          }
          y += 1
        }
        Array.tabulate(64)(i => if (cnts(i) == 0) 0.0 else sums(i) / cnts(i))
      }
    }.getOrElse {
      // bag-of-4-grams fallback: 64-bucket histogram of hashed byte 4-grams
      val counts = new Array[Double](64)
      var j = 0
      while (j + 3 < bytes.length) {
        var h = 0
        var k = 0
        while (k < 4) { h = h * 131 + (bytes(j + k) & 0xff); k += 1 }
        counts((h * 0x9E3779B1 >>> 26) & 63) += 1
        j += 1
      }
      counts
    }
    val mean = means.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (means(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Bands for the Hamming-ball candidate join: 4 bands × 16 bits —
    * by pigeonhole, any pair within Hamming distance ≤ 3 shares at
    * least one exact band, so banded candidates are COMPLETE for the
    * [[MaxHamming]] verify threshold. */
  private val PhashBands = 4
  private val MaxHamming = 3L

  /** x133: perceptual near-dup image pairs over the media column —
    * aHash per blob (batched map, blobs never shuffled), then the x3
    * SimHash plan shape: 4 exact band keys per hash, candidates =
    * band-mates, verified by exact Hamming distance ≤ [[MaxHamming]]
    * via bit_count(xor). No oracle by design (the decode cannot run in
    * SQL); MultimodalSpec pins the hash on crafted REAL PNGs (one-pixel
    * edit → few bits flip → pair found; distinct images → no pair) and
    * byte-identical blobs at distance 0. */
  /** Banded Hamming-ball pair join over a (doc_id, ah) hash table —
    * candidates share an exact 16-bit band, verified by bit_count(xor). */
  private[graft] def phashPairs(hashes: DataFrame): DataFrame = {
    val banded = hashes.withColumn("band", explode(array(
        (0 until PhashBands).map(b =>
          struct(lit(b).as("b"),
            expr(s"shiftright(ah, ${b * 16}) & 65535").as("key"))): _*)))
      .select(col("doc_id"), col("ah"), col("band.b").as("b"),
        col("band.key").as("key"))
    banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.key") === col("y.key")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.ah ^ y.ah)").cast("long").as("hamming"))
      .distinct() // a pair may share several bands
      .filter(col("hamming") <= MaxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val phashDedup = Q(
    "x133_image_phash_dedup",
    "perceptual aHash near-dup pairs over the media column (banded Hamming join)")(
    (s, dir) => {
      import s.implicits._
      val hashes = blobTable(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => (id, aHash(bytes)) })
        .toDF("doc_id", "ah")
      phashPairs(hashes)
    })

  /** x192: the frame-sampling transform REGISTERED and fully oracled —
    * the explode-shaped video-pipeline step ([[sampleFrames]], until now
    * spec-only): every 64-byte "frame" of the binary media column yields
    * its 16-byte header slice as hex. Unlike x11/x133 (whose features
    * hinge on raster decode), frame geometry is pure byte arithmetic, so
    * this member of the multimodal family gets a DuckDB oracle: DuckDB
    * cannot slice BLOBs, but slicing the HEX STRING is byte-precise at
    * aligned offsets (byte k ↔ hex chars 2k, 2k+1) — the Spark side
    * keeps the binary-native form (`substr` on BinaryType), the oracle
    * slices `hex(media)`, and the two agree exactly at every 64-byte
    * frame boundary.
    *
    * Scale shape: a pure map+explode (zero shuffles, zero joins) — the
    * blob never moves, each output row is 16 bytes of it; at 100 TB the
    * transform runs at scan speed with output bounded by
    * (blob bytes)/4. Short blobs (< one stride) still emit frame 0 with
    * whatever header bytes exist — the pipeline stays total. */
  val frameSample = Q.withOracle(
    "x192_frame_sample",
    s"x192: stride-$FrameStride frame sampling over the binary media column ($FrameHeader-byte header slice per frame, pure map+explode)",
    s"""WITH b AS (
      |  SELECT doc_id, encode(text) AS media FROM documents),
      |f AS (
      |  SELECT doc_id, hex(media) AS mhex,
      |    unnest(generate_series(0,
      |      greatest(CAST(octet_length(media) // $FrameStride AS INT) - 1, 0))) AS frame_no
      |  FROM b)
      |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
      |  substring(mhex, CAST(frame_no * ${FrameStride * 2} + 1 AS INT), ${FrameHeader * 2}) AS frame_hex
      |FROM f ORDER BY doc_id, frame_no""".stripMargin)(
    (s, dir) =>
      sampleFrames(blobTable(s, dir))
        .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
          col("frame_hex"))
        .orderBy(col("doc_id"), col("frame_no")))

  val all: Seq[Q] = Seq(pipeline, phashDedup, frameSample)
}
