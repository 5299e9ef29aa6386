package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.G12): image/audio/video as opaque `binary`
  * content plus a typed metadata struct, with decode / feature-extract /
  * frame-sample as `mapPartitions` stages.
  *
  * The Spark-side plumbing — schema, typed Datasets, per-partition batch
  * iteration, partition sizing — is REAL and tested. The codec itself is a
  * clearly marked DETERMINISTIC FAKE (`fakeDecode`): the container has no
  * image/audio libraries, so the stub derives "pixels" from the bytes in a
  * reproducible way. Swapping in a real codec changes only the body of
  * `fakeDecode`; every schema and plan stays identical.
  */
object Multimodal {

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

  /** ===== FAKE DECODE (stand-in for a real codec) =====
    * Real version: decode `m.content` with an image/video library and
    * compute per-frame features. This deterministic fake folds the bytes
    * instead — same signature, same cost shape (touches every byte).
    */
  private def fakeDecode(m: Media, frameStride: Int): MediaFeatures = {
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

  /** Decode + feature-extract as a `mapPartitions` stage: one iterator per
    * partition (real codecs amortize per-partition init — e.g. loading a
    * decoder — exactly here), rows stream through without materializing the
    * whole partition.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[Media],
                     frameStride: Int = 2): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real pipeline: init codec once per partition here
      it.map(m => fakeDecode(m, frameStride))
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
