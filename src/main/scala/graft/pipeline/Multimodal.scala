package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, batch feature extraction via `mapPartitions`
  * (the Scala analogue of a vectorized/batched UDF: one decode context per
  * partition, amortized over rows).
  *
  * IMAGE decode is REAL: [[decodeImage]]/[[decodeImages]] run the JDK's
  * `javax.imageio` readers (PNG/JPEG/GIF/BMP ship in every JRE) over the
  * payload bytes — container format, dimensions, and exact per-channel
  * pixel sums from the decoded raster. Only the VIDEO frame codec remains
  * stubbed (`decodeFrameStub` — no container/codec library ships in the
  * JDK); its Spark-side contract (schema, partitioning, batch shape) is
  * real and tested.
  */
object Multimodal {

  /** One decoded image: format from the container's reader, exact integer
    * channel sums from the raster (sums, not means: integer arithmetic is
    * bit-portable across engines; a mean is one division away).
    */
  final case class DecodedImage(doc_id: Long, format: String, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL single-image decode via `javax.imageio`: the reader is chosen by
    * container sniffing (so one pipeline handles PNG/JPEG/GIF/BMP mixed),
    * `format` is the reader's name lowercased, and the channel sums walk
    * the decoded raster — a header-only peek could not produce them.
    * Undecodable payloads raise (callers running untrusted corpora filter
    * or quarantine first; silently zeroed pixels would poison downstream
    * stats).
    */
  def decodeImage(id: Long, bytes: Array[Byte]): DecodedImage = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no image reader recognizes payload of doc $id")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val fmt = reader.getFormatName.toLowerCase
        val img = reader.read(0)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        DecodedImage(id, fmt, img.getWidth, img.getHeight, sr, sg, sb)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Batched real decode over a media table (doc_id, media): same
    * one-context-per-partition `mapPartitions` shape as the stubs — the
    * imageio reader registry lookup is amortized per partition by the
    * JDK's static registry, and payload bytes never enter an exchange.
    */
  def decodeImages(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) => decodeImage(id, bytes) })
  }

  /** Real PNG encode (the test/fixture side of [[decodeImage]]): pixel
    * (x, y) gets the RGB triple from `px`. PNG is lossless, so
    * encode-then-decode round-trips sums exactly.
    */
  def encodePng(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w >= 1 && h >= 1, s"w=$w h=$h")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** One media row: payload + typed metadata, mirroring how a 100 TB corpus
    * stores media (payload column stays opaque; metadata is columnar and
    * prunable so metadata-only queries never touch bytes).
    */
  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
      width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, n_bytes: Long, format: String,
      aspect_ratio: Double, feature: Array[Float])

  /** STUB standing in for a real EMBEDDING model (deterministic): derives a
    * fake 4-dim feature from payload bytes — feature extraction needs a
    * trained model, which no JDK ships. Actual image DECODE is real
    * ([[decodeImage]]); this stub remains only where a learned feature
    * vector is the contract (extractFeatures, the video frame path).
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    Array(
      (h & 0xffff).toFloat / 65535f,
      ((h >>> 16) & 0xffff).toFloat / 65535f,
      ((h >>> 32) & 0xffff).toFloat / 65535f,
      bytes.length.toFloat)
  }

  /** Batched feature extraction: one pass per partition, decoder state would
    * be initialized once per partition in a real codec (the expensive part
    * this shape amortizes).
    */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map { r =>
        val feat = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.media.length.toLong, r.format,
          if (r.height == 0) 0.0 else r.width.toDouble / r.height, feat)
      }
    }
  }

  /** Build a media table from the documents corpus (payload = utf8 bytes —
    * the deterministic stand-in for real image bytes).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long"),
      col("text").cast("binary").as("media"),
      lit("utf8").as("format"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"))

  /** Metadata-only projection — must prune the payload column at scan time
    * (verify via explain: ReadSchema excludes `media`).
    */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy(col("format"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("width").cast("long") * col("height").cast("long")).as("total_pixels"))

  /** REAL image resize via the JDK: decode ([[decodeImage]]'s reader path),
    * nearest-neighbor rescale into a fresh RGB raster (explicit source-pixel
    * arithmetic `sx = x*srcW/dstW` — exact integer floor division, so the
    * mapping is bit-deterministic and engine-independent, unlike
    * Graphics2D's interpolation pipeline), re-encode as PNG (lossless).
    */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW >= 1 && targetH >= 1, s"targetW=$targetW targetH=$targetH")
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(src != null, "payload is not a decodable image")
    val dst = new java.awt.image.BufferedImage(targetW, targetH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < targetH) {
      val sy = (y.toLong * src.getHeight / targetH).toInt
      var x = 0
      while (x < targetW) {
        val sx = (x.toLong * src.getWidth / targetW).toInt
        dst.setRGB(x, y, src.getRGB(sx, sy) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    out.toByteArray
  }

  /** Batched real image resize: payload replaced by the re-encoded PNG,
    * metadata kept in sync — same one-context-per-partition shape as
    * [[decodeImages]].
    */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(r =>
      r.copy(media = resizeImage(r.media, targetW, targetH),
        format = "png", width = targetW, height = targetH)))
  }

  /** STUB for a resize of NON-image media ((bytes, w, h) -> bytes):
    * deterministic proportional byte sampling standing in for a codec-aware
    * downscale; the signature is the production contract. Image payloads
    * use the REAL [[resizeImage]].
    */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] =
    // empty/corrupt payloads pass through empty instead of indexing into a
    // zero-length array
    if (bytes.isEmpty) bytes
    else {
      val n = math.max(1, math.min(bytes.length, targetW * targetH / 64))
      Array.tabulate(n)(i => bytes((i.toLong * bytes.length / n).toInt))
    }

  /** Batched resize over the media table: payload replaced, metadata kept in
    * sync — same one-codec-context-per-partition shape as extractFeatures.
    */
  def resizeMedia(media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(media = resizeStub(r.media, targetW, targetH),
        width = targetW, height = targetH))
    }
  }

  final case class FrameRow(doc_id: Long, frame_idx: Int, ts_sec: Double,
      feature: Array[Float])

  /** STUB for a per-frame decode (seek + decode one frame): deterministic
    * fake keyed by (payload, frame index). Signature is the production
    * contract — a real codec opens the container once per row and seeks.
    */
  def decodeFrameStub(bytes: Array[Byte], frameIdx: Int): Array[Float] = {
    val base = decodeStub(bytes)
    base.indices.map(i => base(i) + frameIdx.toFloat / 1000f).toArray
  }

  /** Video frame sampling: every `stride`-th frame index is derived from
    * METADATA alone (`n_frames` — a columnar sequence+explode, the payload
    * untouched), then only the selected frames batch-decode in
    * `mapPartitions`. At 100 TB the payload is fetched once per doc row and
    * the per-frame decode loop is the amortized hot path; frame selection
    * itself never reads a byte of media.
    */
  def sampleFrames(videos: DataFrame, stride: Int)(
      implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    require(stride > 0, s"stride: $stride")
    // zero/negative-frame rows (corrupt containers) emit NO frames instead
    // of killing the job: sequence(0, -1, +stride) is a runtime error
    videos.select(col("doc_id").cast("long"), col("media"),
        // NULL fps is the same corrupt-container class as n_frames <= 0:
        // the typed tuple below decodes fps into a PRIMITIVE double, and a
        // NULL would fail the encoder and kill the job instead of
        // degrading to ts 0.0 like the fps == 0 guard
        coalesce(col("fps").cast("double"), lit(0.0)),
        explode(when(col("n_frames") > 0,
            sequence(lit(0), col("n_frames").cast("int") - 1, lit(stride)))
          .otherwise(array().cast("array<int>")))
          .as("frame_idx"))
      .as[(Long, Array[Byte], Double, Int)]
      .mapPartitions { rows =>
        // real impl: container opened once per doc_id run, seek per frame
        rows.map { case (id, media, fps, idx) =>
          FrameRow(id, idx, if (fps == 0) 0.0 else idx / fps,
            decodeFrameStub(media, idx))
        }
      }
  }
}
