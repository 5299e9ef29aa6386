package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.G12): image/audio/video as opaque `binary`
  * content plus a typed metadata struct, with decode / feature-extract /
  * frame-sample as `mapPartitions` stages.
  *
  * The Spark-side plumbing — schema, typed Datasets, per-partition batch
  * iteration, partition sizing — is REAL and tested. The codec is a
  * PLUGGABLE SEAM (r12 — the `cypherExecute` injectable-factory device):
  * [[decodeFeatures]] takes any serializable [[Decoder]]; the default
  * [[FakeDecoder]] is a clearly marked DETERMINISTIC FAKE (this container
  * ships no media codecs, so it derives "pixels" from the bytes
  * reproducibly), and [[ImageIoDecoder]] wires the JDK's own
  * `javax.imageio` for real PNG/JPEG pixel stats — a production drop-in
  * (OpenCV, ffmpeg bindings) implements the same one-method trait and NO
  * operator, schema, or plan changes.
  */
object Multimodal {

  /** The codec seam: decode one media row to its features. Implementations
    * MUST be serializable (the instance ships inside the `mapPartitions`
    * closure to executors) and deterministic per row if downstream oracles
    * are to replay. Per-partition init (loading a native codec, pinning a
    * GPU) belongs in [[Decoder.open]], called once per partition before
    * the row loop.
    */
  trait Decoder extends Serializable {
    /** once-per-partition initialization hook (default no-op). */
    def open(): Unit = {}
    def decode(m: Media, frameStride: Int): MediaFeatures
  }

  /** A media row: opaque bytes + typed metadata. */
  final case class Media(id: Long, content: Array[Byte], format: String,
                         width: Int, height: Int, n_frames: Int)

  /** Decoded per-media features (what a real pipeline would hand to a
    * training-data filter: size stats + sampled frame "signatures").
    */
  final case class MediaFeatures(id: Long, format: String, n_bytes: Int,
                                 byte_sum: Long, mean_byte: Double,
                                 frame_hashes: Seq[Long])

  /** Deterministic fake media over any id column: content bytes derive from
    * md5(id), metadata from the id. Lets every downstream stage (and its
    * partitioning behavior) run for real on synthetic tables.
    */
  def fakeMedia(spark: SparkSession, df: DataFrame, idCol: String): Dataset[Media] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"media:$id".getBytes("UTF-8"))
      // repeat the digest to a deterministic pseudo-payload
      val content = Array.tabulate[Byte](256 + (id % 64).toInt * 16)(i => md(i % 16))
      val fmt = Seq("png", "jpg", "mp4")((id % 3).toInt)
      Media(id, content, fmt, 16 + (id % 32).toInt, 16 + (id % 24).toInt,
        if (fmt == "mp4") 8 + (id % 16).toInt else 1)
    }
  }

  /** ===== FAKE DECODE (the default [[Decoder]]) =====
    * Real version: decode `m.content` with an image/video library and
    * compute per-frame features. This deterministic fake folds the bytes
    * instead — same signature, same cost shape (touches every byte) — and
    * is what q_multimodal's oracle replays.
    */
  object FakeDecoder extends Decoder {
    def decode(m: Media, frameStride: Int): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < m.content.length) { sum += (m.content(i) & 0xff); i += 1 }
      val frames = (0 until m.n_frames by frameStride).map { f =>
        // fake per-frame hash: mix frame index with content prefix
        var h = 1125899906842597L
        var j = 0
        val limit = math.min(m.content.length, 64)
        while (j < limit) { h = 31 * h + (m.content(j) & 0xff); j += 1 }
        31 * h + f
      }
      MediaFeatures(m.id, m.format, m.content.length, sum,
        sum.toDouble / math.max(m.content.length, 1), frames)
    }
  }

  /** A REAL decoder over the JDK's own imaging stack (`javax.imageio` —
    * present in every JRE, no extra dependency): PNG/JPEG bytes decode to
    * pixels; n_bytes stays the payload size, byte_sum/mean_byte become
    * pixel-luminance statistics, and each sampled frame hashes its pixel
    * rows (single-frame stills hash frame 0). Bytes ImageIO cannot parse
    * (synthetic payloads, unsupported codecs) fall back to [[FakeDecoder]]
    * rather than fail the partition — a crawl's occasional corrupt image
    * must not kill the batch.
    */
  object ImageIoDecoder extends Decoder {
    def decode(m: Media, frameStride: Int): MediaFeatures = {
      // NonFatal, not just IOException: ImageIO throws unchecked
      // exceptions on plenty of real corrupt images (CMMException on bad
      // ICC profiles, IllegalArgumentException / AIOOBE on truncated
      // headers) — any of them escaping decode() inside mapPartitions
      // would fail the task and, after retries, the whole batch
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) FakeDecoder.decode(m, frameStride)
      else {
        var lum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            lum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val nPix = math.max(img.getWidth * img.getHeight, 1)
        val frames = (0 until m.n_frames by frameStride).map { f =>
          31L * lum + f // stills: one decoded plane hashed per kept frame
        }
        MediaFeatures(m.id, m.format, m.content.length, lum,
          lum.toDouble / (3.0 * nPix), frames)
      }
    }
  }

  /** Decode + feature-extract as a `mapPartitions` stage: one iterator per
    * partition (codecs amortize per-partition init in [[Decoder.open]],
    * called exactly here), rows stream through without materializing the
    * whole partition. The decoder defaults to the deterministic
    * [[FakeDecoder]]; swap [[ImageIoDecoder]] (or any [[Decoder]]) in and
    * every schema, partition shape, and downstream plan stays identical —
    * the spec pins that law.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[Media],
                     frameStride: Int = 2,
                     decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      decoder.open() // once per partition: codec/library init
      it.map(m => decoder.decode(m, frameStride))
    }
  }

  /** Frame sampling plan for video rows: one output row per kept frame —
    * pure relational (posexplode of the frame index range), no decode.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.select(col("id"), col("format"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .where(col("n_frames") > 1)
}
