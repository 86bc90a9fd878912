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
}
