package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: the multimodal column pattern — an opaque binary
  * payload plus typed metadata. */
final case class MediaAsset(
    asset_id: Long,
    kind: String,          // image | audio | video
    media: Array[Byte],    // opaque payload (e.g. JPEG/WAV/MP4 bytes)
    mime: String,
    source: String,
)

final case class DecodedMeta(
    asset_id: Long,
    kind: String,
    width: Int,
    height: Int,
    channels: Int,
    duration_ms: Long,
    feature: Array[Float], // extracted feature vector
)

/** Multimodal-column operators: decode / feature-extract / resize /
  * frame-sample over opaque binary columns.
  *
  * The Spark-side plumbing is real and tested: binary columns travel as
  * `BinaryType`, work happens in `mapPartitions` batches over a typed
  * Dataset (the Scala analogue of `mapInPandas` — one iterator per
  * partition, so a real decoder could batch to native code), partitioning
  * and schemas are production-shaped. The codec itself is a STUB: no
  * image/audio libraries exist in this container, so `decodeStub` parses a
  * deterministic synthetic header instead of running libjpeg/ffmpeg. The
  * seam to replace is marked below.
  */
object Multimodal {

  /** Synthetic asset payload: 16-byte header (magic, w, h, ch) + body.
    * Stands in for a real container format in tests/benchmarks. */
  def syntheticMedia(id: Long, kind: String): Array[Byte] = {
    val w = 64 + (id % 64).toInt
    val h = 48 + (id % 48).toInt
    val ch = if (kind == "audio") 1 else 3
    val body = new Array[Byte](256)
    var i = 0
    while (i < body.length) {
      body(i) = ((id * 31 + i * 131) & 0xFF).toByte; i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(16 + body.length)
    bb.putInt(0x47524654) // "GRFT"
    bb.putInt(w); bb.putInt(h); bb.putInt(ch)
    bb.put(body)
    bb.array()
  }

  /** THE STUB SEAM: a real implementation calls the codec (libjpeg /
    * libsndfile / ffmpeg) on the payload bytes here. This deterministic
    * fake parses the synthetic header and derives a feature vector from
    * the body — same signature, same batch shape. */
  def decodeStub(media: Array[Byte]): (Int, Int, Int, Long, Array[Float]) = {
    val bb = java.nio.ByteBuffer.wrap(media)
    require(bb.getInt() == 0x47524654, "bad magic — not a GRFT payload")
    val w = bb.getInt(); val h = bb.getInt(); val ch = bb.getInt()
    val feat = new Array[Float](8)
    var i = 16
    while (i < media.length) {
      feat(i % 8) += (media(i) & 0xFF) / 255.0f
      i += 1
    }
    val n = math.max(1, (media.length - 16) / 8)
    (0 until 8).foreach(j => feat(j) = feat(j) / n)
    (w, h, ch, (media.length - 16).toLong * 10, feat)
  }

  /** Decode + feature-extract: batched per partition over the typed
    * Dataset. Output schema is fixed and columnar-friendly. */
  def decodeAndExtract(assets: Dataset[MediaAsset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: initialize the codec ONCE per partition here
      it.map { a =>
        val (w, h, ch, dur, feat) = decodeStub(a.media)
        DecodedMeta(a.asset_id, a.kind, w, h, ch, dur, feat)
      }
    }
  }

  /** "Resize": produces a new payload with scaled header dims (stub body
    * passthrough) — demonstrates binary→binary transform plumbing. */
  def resize(assets: Dataset[MediaAsset], maxDim: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val (w, h, ch, _, _) = decodeStub(a.media)
      val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
      val nw = math.max(1, (w * scale).toInt)
      val nh = math.max(1, (h * scale).toInt)
      val bb = java.nio.ByteBuffer.allocate(a.media.length)
      bb.putInt(0x47524654); bb.putInt(nw); bb.putInt(nh); bb.putInt(ch)
      bb.put(a.media, 16, a.media.length - 16)
      a.copy(media = bb.array())
    }
  }

  /** Frame-sample: every nth 32-byte "frame" of the body as its own row
    * (binary explode pattern — video → frames). */
  def frameSample(assets: Dataset[MediaAsset], everyNth: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val body = a.media.drop(16)
      body.grouped(32).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (frame, idx) => (a.asset_id, idx, frame) }
    }.toDF("asset_id", "frame_idx", "frame_bytes")
  }

  /** Deterministic synthetic asset table (tests + bench). */
  def syntheticAssets(spark: SparkSession, n: Long): Dataset[MediaAsset] = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(0, n).map { i =>
      val kind = kinds((i % 3).toInt)
      MediaAsset(i, kind, syntheticMedia(i, kind),
        s"application/x-grft-$kind", s"src${i % 7}")
    }
  }
}
