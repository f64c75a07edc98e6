package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, batch feature extraction via `mapPartitions`
  * (the Scala analogue of a vectorized/batched UDF: one decode context per
  * partition, amortized over rows).
  *
  * The actual codec is STUBBED — no image/audio libraries ship in this
  * container. `decodeStub` is a deterministic fake standing in for e.g. a
  * JPEG decode; the Spark-side contract (schema, partitioning, batch shape)
  * is real and tested.
  */
object Multimodal {

  /** One media row: payload + typed metadata, mirroring how a 100 TB corpus
    * stores media (payload column stays opaque; metadata is columnar and
    * prunable so metadata-only queries never touch bytes).
    */
  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
      width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, n_bytes: Long, format: String,
      aspect_ratio: Double, feature: Array[Float])

  /** STUB standing in for a real decoder (`???`-equivalent, deterministic):
    * derives a fake 4-dim feature from payload bytes. Replace with an actual
    * codec call; the signature (bytes -> fixed-dim float vector) is the
    * production contract.
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

  /** STUB for a resize ((bytes, w, h) -> bytes): deterministic proportional
    * byte sampling standing in for a nearest-neighbor downscale; the
    * signature is the production contract.
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
