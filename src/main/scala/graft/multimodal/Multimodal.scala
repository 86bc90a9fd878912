package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2): media as opaque `binary`
  * columns + typed metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — schema, partition-parallel batch
  * decode, typed output Encoder — while the codec itself is a STUB
  * (this container has no image/audio libraries): `stubDecode` parses a
  * deterministic fake header instead of calling a real decoder. Swap
  * `stubDecode` for an actual codec (JNI/javacv) and nothing else
  * changes. At 100 TB the binary column rides parquet/ORC page-level
  * projection: metadata-only queries never touch the bytes.
  */
object Multimodal {

  final case class MediaMeta(
      id: Long, byte_len: Int, width: Int, height: Int, channels: Int,
      checksum: String)

  /** STUB decoder — deterministic fake header parse standing in for a
    * real image decode. Reads "dimensions" from the first bytes. */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    def b(i: Int): Int = if (i < bytes.length) bytes(i) & 0xFF else 0
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(bytes).map("%02x".format(_)).mkString
    MediaMeta(id, bytes.length,
      width = 1 + (b(0) << 4 | b(1) >> 4) % 4096,
      height = 1 + (b(2) << 4 | b(3) >> 4) % 4096,
      channels = 1 + b(4) % 4,
      checksum = checksum)
  }

  /** Batch decode: one decoder state per partition (the real-codec
    * pattern — init once, stream the batch through), typed output. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs allocate here, once per partition
        it.map { case (id, bytes) => stubDecode(id, bytes) }
      }
  }

  /** Documents-as-media: treats utf8 text bytes as the opaque payload so
    * the plumbing is exercised on real tables. */
  def documentsAsMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    decodeMeta(
      docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
      "doc_id", "media").toDF()
  }

  final case class MediaFeatures(id: Long, byte_len: Int, hist: Array[Double])
  final case class Frame(id: Long, frame_idx: Int, frame_hash: String)

  /** Feature-extract stage (stub model): fixed-width per-media feature
    * vector — here an 8-bin L1-normalized byte histogram. The plumbing
    * (typed partition batches, per-partition model init, fixed-width
    * array output ready for the similarity/clustering packs) is real; a
    * real image/audio embedding model drops in behind the same
    * signature. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real model loads weights here, once per partition
        it.map { case (id, bytes) =>
          val h = new Array[Double](8)
          var i = 0
          while (i < bytes.length) { h((bytes(i) & 0xFF) >> 5) += 1.0; i += 1 }
          val n = math.max(1, bytes.length).toDouble
          MediaFeatures(id, bytes.length,
            h.map(v => math.rint(v / n * 10000) / 10000))
        }
      }
  }

  final case class ResizedMedia(id: Long, src_w: Int, src_h: Int,
      dst_w: Int, dst_h: Int, out_len: Int, checksum: String)

  /** Resize stage (stub codec): parses the fake header, "resamples" to
    * the target box preserving aspect ratio, and emits the resized
    * payload's metadata + checksum. The real-codec contract is the
    * same: bytes in, bytes+metadata out, pure per-row, partition-
    * parallel; swap the stub arithmetic for libvips/javacv and the
    * plumbing stands. */
  def resize(df: DataFrame, idCol: String, binCol: String,
      maxW: Int = 256, maxH: Int = 256): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val m = stubDecode(id, bytes)
          val scale = math.min(1.0,
            math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
          val (dw, dh) = (math.max(1, (m.width * scale).toInt),
            math.max(1, (m.height * scale).toInt))
          // stub "resampled" payload: every k-th byte of the source,
          // where k tracks the area ratio — deterministic, length ∝ scale²
          val k = math.max(1, (1.0 / math.max(scale * scale, 1e-9)).toInt)
          val out = bytes.indices.collect { case i if i % k == 0 => bytes(i) }.toArray
          md.reset()
          ResizedMedia(id, m.width, m.height, dw, dh, out.length,
            md.digest(out).map("%02x".format(_)).mkString)
        }
      }
  }

  /** Frame-sampling stage for video-style payloads: every `stride`
    * bytes emits one 16-byte "frame" row — the flatMap shape of real
    * frame extraction (rows out ∝ media length / stride, partition-
    * parallel, no driver involvement). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      stride: Int = 64): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until math.max(1, bytes.length / stride)).iterator.map { f =>
          val from = f * stride
          val frame = java.util.Arrays.copyOfRange(
            bytes, from, math.min(bytes.length, from + 16))
          md.reset()
          Frame(id, f, md.digest(frame).map("%02x".format(_)).mkString)
        }
      }
  }
}
