package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §2): media as opaque `binary`
  * columns + typed metadata, processed per-partition in batches with a
  * REAL codec — the JDK's `javax.imageio` PNG/BMP readers and writers
  * (pure-JDK, public API, no native deps).
  *
  * The corpus is generated, not stored: each doc of the `documents`
  * table gets a deterministic RGB image whose pixel values are a pure
  * integer function of (id, x, y, channel), encoded through the real
  * PNG (even ids) / BMP (odd ids) ImageIO writers. Because both codecs
  * are LOSSLESS for 8-bit RGB, every decode-side statistic (dimensions,
  * per-channel pixel sums, histograms, resampled sums) is re-derivable
  * by the DuckDB oracle from the generator formula alone — so the
  * decode path is HASH-GATED end to end: if `ImageIO.read` mangled one
  * pixel, the oracle compare fails. (Rounds ≤10 used a declared stub
  * header-parse here; this replaces it per the round-10 verdict.)
  *
  * At 100 TB the binary column rides parquet page-level projection
  * (metadata-only queries never touch the bytes), decode is
  * partition-parallel with codec state allocated once per partition,
  * and nothing ever shuffles pixel data — only k-row statistics.
  */
object Multimodal {

  /** Image dims for a doc id: 4–16 × 4–14 (coprime moduli, so the
    * corpus covers all 143 shapes). Tiny by design — the gate is codec
    * CORRECTNESS; byte volume is the benchmark corpus's job. */
  def synthDims(id: Long): (Int, Int) =
    ((4 + id % 13).toInt, (4 + id % 11).toInt)

  /** Frames per synthetic video container: 1–5. */
  def synthFrameCount(id: Long): Int = (1 + id % 5).toInt

  /** The pixel generator — channel value of frame `f` at (x, y).
    * Shared, in this exact form, by the encoder AND every DuckDB
    * oracle (`(id·31 + f·17 + x·7 + y·13 + c·101) mod 256`). */
  def pixel(id: Long, f: Int, x: Int, y: Int, c: Int): Int =
    ((id * 31 + f * 17L + x * 7L + y * 13L + c * 101L) % 256L).toInt

  private def synthFrame(id: Long, f: Int): BufferedImage = {
    val (w, h) = synthDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixel(id, f, x, y, 0) << 16) |
            (pixel(id, f, x, y, 1) << 8) |
            pixel(id, f, x, y, 2))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real encode: frame 0 through the JDK PNG writer (even ids) or BMP
    * writer (odd ids). Both lossless 24-bit RGB. */
  def imageBytes(id: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(synthFrame(id, 0), if (id % 2 == 0) "png" else "bmp", bos)
    bos.toByteArray
  }

  /** Synthetic video container: `GFV1` magic, 4-byte BE frame count,
    * then per frame a 4-byte BE length + a real PNG payload — the
    * shape of any length-prefixed media container. */
  def videoBytes(id: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBytes("GFV1")
    val n = synthFrameCount(id)
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(synthFrame(id, f), "png", bos)
      dos.writeInt(bos.size())
      bos.writeTo(dos)
      f += 1
    }
    dos.flush()
    out.toByteArray
  }

  /** Doc-id list feeding the corpus synthesizers. With `spread` the
    * ids are hash-repartitioned to full cluster parallelism BEFORE the
    * per-id encode (r17 optimization): the encode is the expensive
    * stage and the id list is 8 bytes/row, so the exchange is free at
    * any scale — the heavy media bytes are synthesized AFTER it and
    * never shuffled (§8's "move heavy bytes once" discipline, here
    * "zero times"). Without it a single-row-group documents.parquet
    * pins EVERY decode-side key to one scan task. Measured at sf0.1:
    * the spread wins ~10 s across the ImageIO corpora (mm_shot_bounds
    * 4.43→1.35 s, mm_video_dedup 4.64→2.57) but LOSES ~0.7-1.0 s per
    * key on the cheap PCM-synth audio corpora (mm_audio_fingerprint
    * 0.63→1.41 — the extra exchange+stage outweighs a sub-second
    * synth), so the WAV corpora keep the direct scan. Hash
    * repartition on doc_id: deterministic under retries, and the
    * explicit numPartitions pins the stage against AQE's byte-based
    * coalescing (ids are byte-light but compute-heavy). */
  private def docIds(spark: SparkSession, sfDir: String,
                     spread: Boolean = true): Dataset[Long] = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"))
    (if (spread)
       ids.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
     else ids).as[Long]
  }

  /** The media corpus over `documents`: (id, media) with real encoded
    * image bytes. Encoding runs partition-parallel over the spread id
    * list — at scale this stage is the ingest job that wrote the
    * binary column. */
  def imageCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, sfDir)
      .mapPartitions { it =>
        ImageIO.setUseCache(false) // memory-backed streams, no /tmp spill
        it.map(id => (id, imageBytes(id)))
      }
      .toDF("id", "media")
  }

  /** Video-container corpus over `documents`: (id, media). */
  def videoCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, sfDir)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => (id, videoBytes(id)))
      }
      .toDF("id", "media")
  }

  /** Mirror corpus for perceptual dedup: doc ids 2c and 2c+1 carry the
    * SAME pixel content (key c = id div 2) through DIFFERENT real
    * containers — PNG for even ids, BMP for odd. Byte-level dedup sees
    * two unrelated blobs; a perceptual hash sees one image twice. This
    * is the recompressed-copy regime image dedup exists for. */
  /** One mirror-corpus payload: content `id div 2` through the PNG
    * writer (even ids) or BMP writer (odd ids). */
  def mirrorBytes(id: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(synthFrame(id / 2, 0),
      if (id % 2 == 0) "png" else "bmp", bos)
    bos.toByteArray
  }

  def mirrorCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, sfDir)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => (id, mirrorBytes(id)))
      }
      .toDF("id", "media")
  }

  final case class MediaHash(id: Long, ahash: Long, bytes_md5: String,
      width: Int, height: Int)

  /** THE aHash definition — shared by the batch operator and
    * `StreamingOps.mediaDecodeStream` so the two faces cannot drift:
    * nearest-neighbor downsample to 8×8 (sx = (dx·w) div 8 — every
    * sample a real decoded pixel), integer grayscale (r+g+b) div 3,
    * threshold at the integer mean (div 64), bit (dy·8+dx) set iff
    * g > mean. All integer, so the oracle replays it bit-exactly
    * from the generator lattice through the encode→decode round
    * trip. */
  private[graft] def ahashOf(img: BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val g = new Array[Int](64)
    var sum = 0L
    var dy = 0
    while (dy < 8) {
      var dx = 0
      while (dx < 8) {
        val rgb = img.getRGB(dx * w / 8, dy * h / 8)
        val v = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
        g(dy * 8 + dx) = v
        sum += v
        dx += 1
      }
      dy += 1
    }
    val mean = sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (g(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Decode a payload or fail loudly — the single `ImageIO.read`
    * entry both batch and stream go through. */
  private[graft] def decodeImage(id: Long, bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable media payload for id=$id")
    img
  }

  /** Perceptual average-hash over the REAL decoded pixels
    * ([[ahashOf]]), plus md5 of the CONTAINER bytes (the byte-level
    * identity a naive dedup would key on). */
  def averageHash(df: DataFrame, idCol: String, binCol: String): Dataset[MediaHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val img = decodeImage(id, bytes)
          md.reset()
          val dig = md.digest(bytes)
          MediaHash(id, ahashOf(img), dig.map("%02x".format(_)).mkString,
            img.getWidth, img.getHeight)
        }
      }
  }

  /** Quantized DCT-II cosine weights for a 16-sample row:
    * wq(u)(x) = ⌊cos(π(2x+1)u/32)·2¹⁴⌋. Computed ONCE here and
    * INLINED into the oracle SQL as a VALUES literal (the
    * trained-artifact stash), so both engines multiply the same
    * integers — the whole DCT is exact integer arithmetic. */
  private[graft] val DctW: Array[Array[Long]] =
    Array.tabulate(8, 16)((u, x) =>
      math.floor(math.cos(math.Pi * (2 * x + 1) * u / 32.0) * 16384.0)
        .toLong)

  final case class DctProfile(id: Long, phash: Long, dc: Long,
      e_low: Long, e_high: Long)

  /** THE pHash/DCT definition (Zauner 2010's pHash recipe at demo
    * scale): 16×16 NN grayscale sample ([[ahashOf]]'s contract at 16),
    * integer 2-D DCT-II c(u,v) = Σ g(y,x)·wq(u,x)·wq(v,y) over the
    * 8×8 low-frequency block, 63-bit hash thresholded at the MEDIAN
    * non-DC coefficient (element 32 of 63 under the (c,u,v) order —
    * exact, no float), plus the frequency-energy split: e_low =
    * Σ|c| over the non-DC (u,v < 4) block, e_high = Σ|c| over the
    * rest. Everything integer end to end. The floor-quantized weight
    * rows do NOT sum to exactly zero, so a perfectly flat image leaks
    * ~1e-7 of its DC mass into the AC block — bounded bias, identical
    * in both engines, spec-pinned. */
  private[graft] def dctProfileOf(id: Long, img: BufferedImage): DctProfile = {
    val (w, h) = (img.getWidth, img.getHeight)
    val g = Array.ofDim[Long](16, 16)
    var dy = 0
    while (dy < 16) {
      var dx = 0
      while (dx < 16) {
        val rgb = img.getRGB(dx * w / 16, dy * h / 16)
        g(dy)(dx) =
          ((((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3)
            .toLong
        dx += 1
      }
      dy += 1
    }
    val c = Array.ofDim[Long](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            s += g(y)(x) * DctW(u)(x) * DctW(v)(y)
            x += 1
          }
          y += 1
        }
        c(u)(v) = s
        v += 1
      }
      u += 1
    }
    val nonDc = (for {
      uu <- 0 until 8; vv <- 0 until 8 if uu != 0 || vv != 0
    } yield (c(uu)(vv), uu, vv)).sortBy(t => (t._1, t._2, t._3))
    val med = nonDc(31)._1
    var hash = 0L
    nonDc.foreach { case (cv, uu, vv) =>
      if (cv > med) hash |= 1L << (uu * 8 + vv - 1)
    }
    val eLow = (for {
      uu <- 0 until 4; vv <- 0 until 4 if uu != 0 || vv != 0
    } yield math.abs(c(uu)(vv))).sum
    val eHigh = (for {
      uu <- 0 until 8; vv <- 0 until 8 if uu >= 4 || vv >= 4
    } yield math.abs(c(uu)(vv))).sum
    DctProfile(id, hash, c(0)(0), eLow, eHigh)
  }

  /** DCT perceptual hash + frequency profile over the REAL decoded
    * pixels — one typed mapPartitions, stateless, the same batch
    * shape as [[averageHash]]. */
  def dctProfile(df: DataFrame, idCol: String, binCol: String): Dataset[DctProfile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) => dctProfileOf(id, decodeImage(id, bytes)) }
      }
  }

  final case class DecodedImage(id: Long, fmt: String, width: Int,
      height: Int, channels: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Container sniff from magic bytes — the real-world dispatch step
    * (the format is a property of the payload, not a column). */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else "unknown"

  private[graft] def decodeOne(id: Long, bytes: Array[Byte]): DecodedImage =
    statsOf(id, sniffFormat(bytes), decodeImage(id, bytes))

  /** Per-image decode statistics over an already-decoded raster — the
    * single stats kernel batch `decodeMeta` and the streaming face
    * share. */
  private[graft] def statsOf(id: Long, fmt: String,
      img: BufferedImage): DecodedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    DecodedImage(id, fmt,
      w, h, img.getColorModel.getNumComponents, sr, sg, sb)
  }

  /** Batch decode: REAL `ImageIO.read` per row, reader state per
    * partition, typed output. Emits dimensions + per-channel pixel
    * sums — integer statistics the oracle re-derives exactly. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  final case class ResizedImage(id: Long, src_w: Int, src_h: Int,
      dst_w: Int, dst_h: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Resize: real decode, then nearest-neighbor downsample to half the
    * source box (dw = max(1, w div 2)) with the canonical NN source
    * mapping sx = (dx·w) div dw — exact integer semantics both engines
    * replay. NN (not area-average) so every output pixel is a REAL
    * decoded source pixel and the oracle gate stays bit-exact; a
    * production pipeline swaps the kernel, not the plumbing. */
  def resizeNN(df: DataFrame, idCol: String, binCol: String): Dataset[ResizedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"undecodable media payload for id=$id")
          val (w, h) = (img.getWidth, img.getHeight)
          val (dw, dh) = (math.max(1, w / 2), math.max(1, h / 2))
          var (sr, sg, sb) = (0L, 0L, 0L)
          var dy = 0
          while (dy < dh) {
            var dx = 0
            while (dx < dw) {
              val rgb = img.getRGB(dx * w / dw, dy * h / dh)
              sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
              dx += 1
            }
            dy += 1
          }
          ResizedImage(id, w, h, dw, dh, sr, sg, sb)
        }
      }
  }

  final case class ChannelHistBin(id: Long, channel: Int, bin: Int, cnt: Long)

  /** Per-channel 4-bin intensity histogram (bin = v div 64) over the
    * REAL decoded pixels, long format — the feature-extract stage.
    * Zero-count bins are absent (group-by semantics, same as SQL). */
  def channelHistogram(df: DataFrame, idCol: String, binCol: String): Dataset[ChannelHistBin] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"undecodable media payload for id=$id")
          val counts = Array.ofDim[Long](3, 4)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              counts(0)(((rgb >> 16) & 0xFF) / 64) += 1
              counts(1)(((rgb >> 8) & 0xFF) / 64) += 1
              counts(2)((rgb & 0xFF) / 64) += 1
              x += 1
            }
            y += 1
          }
          for {
            c <- 0 until 3; b <- 0 until 4 if counts(c)(b) > 0
          } yield ChannelHistBin(id, c, b, counts(c)(b))
        }
      }
  }

  final case class MediaFeatures(id: Long, hist: Array[Double])

  /** Fixed-width 12-dim feature vector (3 channels × 4 bins,
    * L1-normalized over the pixel count, rounded to 1e-4) from the
    * real decoded histogram — the embedding stand-in that feeds the
    * similarity pack's semDedup bridge. A learned image model drops in
    * behind the same (id, Array[Double]) signature. */
  def featureVectors(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    // per-row column math in the decode pass — no shuffle: the 12-dim
    // vector is a pure function of one payload
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"undecodable media payload for id=$id")
          val h = new Array[Double](12)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              h(((rgb >> 16) & 0xFF) / 64) += 1
              h(4 + (((rgb >> 8) & 0xFF) / 64)) += 1
              h(8 + ((rgb & 0xFF) / 64)) += 1
              x += 1
            }
            y += 1
          }
          val n = math.max(1, img.getWidth * img.getHeight).toDouble
          MediaFeatures(id, h.map(v => math.rint(v / n * 10000) / 10000))
        }
      }
  }

  final case class FrameStats(id: Long, frame_idx: Int, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Frame sampling over the GFV1 container: parse the length-prefixed
    * frame table, decode every `stride`-th frame with the real PNG
    * reader, emit per-frame pixel statistics — the flatMap shape of
    * real video sampling (rows out ∝ frames/stride, partition-
    * parallel, no driver involvement). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      stride: Int = 2): Dataset[FrameStats] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        ImageIO.setUseCache(false)
        val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
        val magic = new Array[Byte](4)
        in.readFully(magic)
        require(new String(magic, "US-ASCII") == "GFV1",
          s"not a GFV1 container for id=$id")
        val n = in.readInt()
        (0 until n).iterator.flatMap { f =>
          val len = in.readInt()
          val payload = new Array[Byte](len)
          in.readFully(payload)
          if (f % stride != 0) None
          else {
            val d = decodeOne(id, payload)
            Some(FrameStats(id, f, d.width, d.height, d.sum_r, d.sum_g, d.sum_b))
          }
        }.toSeq
      }
  }

  final case class VideoFingerprint(id: Long, n_frames: Int, vhash: Long,
      drift: Int)

  /** Video-level perceptual fingerprint (round 16): per container,
    * every frame through the REAL decode → [[ahashOf]], then the
    * frame-hash sequence collapses to ONE 64-bit signature by per-bit
    * MAJORITY vote (bit b set iff ≥ half the frames set it — SimHash's
    * vote, Charikar STOC 2002, over the frame axis), plus
    * `drift` = popcount(first ⊕ last) — how far the content moves
    * across the clip (0 = static, ~32 = unrelated endpoints). The
    * majority vote is what makes the signature a VIDEO identity:
    * re-encoded copies, dropped tail frames, or a re-sampled frame
    * rate perturb few votes, where any frame-list digest flips
    * completely. Per-row work bounded by frames × decode;
    * embarrassingly parallel mapPartitions, nothing leaves the task
    * but the 4-field row. */
  def videoFingerprints(df: DataFrame, idCol: String,
      binCol: String): Dataset[VideoFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        ImageIO.setUseCache(false)
        val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
        val magic = new Array[Byte](4)
        in.readFully(magic)
        require(new String(magic, "US-ASCII") == "GFV1",
          s"not a GFV1 container for id=$id")
        val n = in.readInt()
        val hs = (0 until n).map { _ =>
          val len = in.readInt()
          val payload = new Array[Byte](len)
          in.readFully(payload)
          ahashOf(decodeImage(id, payload))
        }
        var vh = 0L
        var b = 0
        while (b < 64) {
          val cnt = hs.count(h => ((h >>> b) & 1L) == 1L)
          if (2 * cnt >= n) vh |= (1L << b)
          b += 1
        }
        VideoFingerprint(id, n, vh,
          java.lang.Long.bitCount(hs.head ^ hs.last))
      }
  }

  // ---- shot-boundary corpus (round 14): a planted scene cut ----

  /** Frames per shot-test video: 8–12 — long enough that one cut's
    * diff cannot dominate the mean by count alone. */
  def shotFrameCount(id: Long): Int = (8 + id % 5).toInt

  /** The planted cut frame: 3–6, always ≥ 2 frames from either end. */
  def shotCutAt(id: Long): Int = (3 + id % 4).toInt

  /** The shot-corpus pixel generator — shared, in this exact form, by
    * the encoder and the DuckDB oracle: within a scene frames drift
    * GENTLY (f·3 — consecutive-frame channel deltas are 3 except at
    * the rare mod-256 wrap), and the cut changes the SPATIAL
    * coefficients, so the cross-cut per-pixel delta varies with
    * (x, y, c) — effectively uniform on 0..255, mean ≈ 85 against the
    * within-scene ≈ 6. (A constant additive scene term would NOT work:
    * adding k mod 256 is a uniform shift whose |Δ| takes only two
    * values — measured mean 15.5, under the 3×-mean spike rule.) */
  def shotPixel(id: Long, f: Int, x: Int, y: Int, c: Int): Int = {
    val spatial =
      if (f >= shotCutAt(id)) x * 19L + y * 23L + c * 57L + 9973L
      else x * 7L + y * 13L + c * 101L
    ((id * 31 + f * 3L + spatial) % 256L).toInt
  }

  private def shotFrame(id: Long, f: Int): BufferedImage = {
    val (w, h) = synthDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (shotPixel(id, f, x, y, 0) << 16) |
            (shotPixel(id, f, x, y, 1) << 8) |
            shotPixel(id, f, x, y, 2))
        x += 1
      }
      y += 1
    }
    img
  }

  /** GFV1 container around the shot frames (same wire format as
    * [[videoBytes]] — real PNG payloads). */
  def shotVideoBytes(id: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBytes("GFV1")
    val n = shotFrameCount(id)
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(shotFrame(id, f), "png", bos)
      dos.writeInt(bos.size())
      bos.writeTo(dos)
      f += 1
    }
    dos.flush()
    out.toByteArray
  }

  def shotCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, sfDir)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => (id, shotVideoBytes(id)))
      }
      .toDF("id", "media")
  }

  final case class FrameDiff(id: Long, frame_idx: Int, sad: Long)

  /** Inter-frame difference energy over a GFV1 container: decode the
    * frames SEQUENTIALLY (the container is already an ordered stream),
    * keep only the previous frame's raster in local state, and emit
    * per frame f ≥ 1 the sum of absolute channel differences — THE
    * classic shot-boundary signal. Decode-local and partition-
    * parallel: pixels never leave the task; only (id, frame, sad)
    * rows — O(frames) per clip — reach the plan. */
  def frameDiffs(df: DataFrame, idCol: String, binCol: String)
      : Dataset[FrameDiff] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        ImageIO.setUseCache(false)
        val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
        val magic = new Array[Byte](4)
        in.readFully(magic)
        require(new String(magic, "US-ASCII") == "GFV1",
          s"not a GFV1 container for id=$id")
        val n = in.readInt()
        var prev: BufferedImage = null
        (0 until n).iterator.flatMap { f =>
          val len = in.readInt()
          val payload = new Array[Byte](len)
          in.readFully(payload)
          val img = decodeImage(id, payload)
          val out = if (f == 0) None else {
            var sad = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val a = img.getRGB(x, y)
                val b = prev.getRGB(x, y)
                sad += math.abs(((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) +
                  math.abs(((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) +
                  math.abs((a & 0xFF) - (b & 0xFF))
                x += 1
              }
              y += 1
            }
            Some(FrameDiff(id, f, sad))
          }
          prev = img
          out
        }.toSeq
      }
  }

  // ---- audio (round 13): REAL WAV codec via javax.sound.sampled ----

  /** Samples per synthetic clip: 400–610 (varying, prime modulus so
    * lengths cover the range). At 8 kHz that is 50–76 ms — tiny by
    * design, same argument as [[synthDims]]. */
  def synthSampleCount(id: Long): Int = (400 + id % 211).toInt

  /** The PCM16 sample generator — shared, in this exact form, by the
    * encoder and the DuckDB oracle: `((id·31 + t·7919) mod 65536) −
    * 32768`, covering the full signed 16-bit range including the
    * −32768 edge. */
  def sample(id: Long, t: Int): Int =
    ((id * 31 + t * 7919L) % 65536L).toInt - 32768

  private val WavRate = 8000f

  /** Real encode: the synthetic PCM16 mono clip through the JDK WAV
    * writer (`AudioSystem.write`, `Type.WAVE` — pure JDK, public API,
    * lossless for PCM). */
  def wavBytes(id: Long): Array[Byte] =
    encodePcm((0 until synthSampleCount(id)).map(t => sample(id, t)))

  /** PCM16LE mono samples through the real JDK WAV writer. */
  private def encodePcm(samples: Seq[Int]): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val n = samples.length
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = samples(t)
      pcm(2 * t) = (s & 0xFF).toByte // little-endian
      pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new AudioFormat(WavRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio corpus over `documents`: (id, media) with real WAV
    * containers, encoded in the scan's partitions like [[imageCorpus]]. */
  def audioCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, sfDir, spread = false)
      .mapPartitions(it => it.map(id => (id, wavBytes(id))))
      .toDF("id", "media")
  }

  // ---- audio-dup corpus (round 17): planted re-leveled copies ----

  /** Sample for the audio-dedup corpus: content key cid = id div 2;
    * even ids carry [[sample]](cid, ·), odd ids the RE-LEVELED
    * (half-amplitude) copy. The truncating halving runs on the
    * non-negative raw value so Scala `/` and DuckDB `//` agree:
    * raw = (cid·31 + t·7919) mod 65536 ∈ [0, 65536); even → raw −
    * 32768, odd → raw/2 − 16384 (≈ s/2 with ≤ 1 LSB of truncation
    * noise — exactly the imperfect re-encode the fingerprint must
    * shrug off). */
  def dupSample(id: Long, t: Int): Int = {
    val cid = id / 2
    // the per-10-sample-block offset is what gives each content its
    // own ENERGY structure (the plain sawtooth is phase-shifted only,
    // collapsing unrelated clips' delta-delta signs — measured: 125
    // distinct fingerprints over 500 clips without it, 245 with)
    val raw = (cid * 31 + t * 7919L +
      (t / 10).toLong * 104729L * (1 + cid % 1009)) % 65536L
    if (id % 2 == 0) raw.toInt - 32768 else (raw / 2L).toInt - 16384
  }

  /** Audio-dedup corpus: ids 2c and 2c+1 carry the SAME recording at
    * different levels (clip length from the content key, so copies
    * share their frame count). Byte dedup sees unrelated blobs; the
    * amplitude-invariant [[audioFingerprints]] word lands within a
    * few bits. */
  def audioDupCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, sfDir, spread = false)
      .mapPartitions(it => it.map { id =>
        val n = synthSampleCount(id / 2)
        (id, encodePcm((0 until n).map(t => dupSample(id, t))))
      })
      .toDF("id", "media")
  }

  // ---- video-dup corpus (round 17): planted trimmed re-encodes ----

  /** Frames per video-dedup content: 4–7 — enough that a trimmed
    * copy still shares most of the clip. */
  def dupFrameCount(cid: Long): Int = (4 + cid % 4).toInt

  /** Video-dedup payload: content cid = id div 2 through the real
    * GFV1 encoder; odd ids are the TRIMMED RE-ENCODE (the same frames
    * minus the last — a fresh container write of a cut copy). The
    * codecs are lossless and deterministic, so the shared frames'
    * decoded rasters — and their aHashes — are bit-identical across
    * the two containers. */
  def videoDupBytes(id: Long): Array[Byte] = {
    val cid = id / 2
    val n = dupFrameCount(cid) - (if (id % 2 == 0) 0 else 1)
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBytes("GFV1")
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(synthFrame(cid, f), "png", bos)
      dos.writeInt(bos.size())
      bos.writeTo(dos)
      f += 1
    }
    dos.flush()
    out.toByteArray
  }

  def videoDupCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, sfDir)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map(id => (id, videoDupBytes(id)))
      }
      .toDF("id", "media")
  }

  final case class FrameHash(id: Long, frame_idx: Int, ahash: Long)

  /** Per-frame perceptual hashes over the GFV1 container — the
    * inverted-index face of [[videoFingerprints]]: each frame through
    * the real decode → [[ahashOf]], one row per frame. This is the
    * identity video dedup joins on (frame-level containment survives
    * trims and re-encodes that perturb any clip-level digest).
    * flatMap shape, partition-parallel, 3 integers per frame leave
    * the task. */
  def frameHashes(df: DataFrame, idCol: String,
      binCol: String): Dataset[FrameHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        ImageIO.setUseCache(false)
        val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
        val magic = new Array[Byte](4)
        in.readFully(magic)
        require(new String(magic, "US-ASCII") == "GFV1",
          s"not a GFV1 container for id=$id")
        val n = in.readInt()
        (0 until n).map { f =>
          val len = in.readInt()
          val payload = new Array[Byte](len)
          in.readFully(payload)
          FrameHash(id, f, ahashOf(decodeImage(id, payload)))
        }
      }
  }

  // ---- speech-gap corpus (round 14): planted silence ----

  /** Samples per speech-test clip: 1600–2000 (20–25 full 80-sample
    * frames at 8 kHz). */
  def speechSampleCount(id: Long): Int = (1600 + id % 401).toInt

  /** The planted silence: (start, length), both FRAME-ALIGNED
    * (multiples of 80), 3–5 frames long, starting at frame 5–11 —
    * always full active runs on both sides. */
  def speechGap(id: Long): (Int, Int) =
    ((400 + (id % 7) * 80).toInt, (240 + (id % 3) * 80).toInt)

  /** The speech-corpus sample generator — shared, in this exact form,
    * by the encoder and the DuckDB oracle: full-range pseudo-signal
    * ([[sample]]) outside the gap, |s| ≤ 4 inside it. */
  def speechSample(id: Long, t: Int): Int = {
    val (g0, gl) = speechGap(id)
    if (t >= g0 && t < g0 + gl) (((id + t * 13L) % 9L) - 4L).toInt
    else sample(id, t)
  }

  /** Real WAV encode of the speech clip ([[wavBytes]]' codec path). */
  def speechWavBytes(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val n = speechSampleCount(id)
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = speechSample(id, t)
      pcm(2 * t) = (s & 0xFF).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new AudioFormat(WavRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def speechCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, sfDir, spread = false)
      .mapPartitions(it => it.map(id => (id, speechWavBytes(id))))
      .toDF("id", "media")
  }

  final case class FrameEnergy(id: Long, frame_idx: Int, energy: Long)

  /** Per-frame energy over a PCM16 WAV: Σ s² per full `frameLen`-
    * sample frame (exact longs; the partial tail frame is dropped —
    * documented cut, both engines). Decode-local and partition-
    * parallel like [[frameDiffs]]: samples never leave the task, only
    * O(frames) rows reach the plan. */
  def wavFrameEnergies(df: DataFrame, idCol: String, binCol: String,
      frameLen: Int = 80): Dataset[FrameEnergy] = {
    import javax.sound.sampled.AudioSystem
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          && !fmt.isBigEndian, s"unexpected WAV format for id=$id: $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        (0 until n / frameLen).map { f =>
          var e = 0L
          var t = f * frameLen
          while (t < (f + 1) * frameLen) {
            val s = ((pcm(2 * t) & 0xFF) | (pcm(2 * t + 1) << 8))
              .toShort.toInt
            e += s.toLong * s
            t += 1
          }
          FrameEnergy(id, f, e)
        }
      }
  }

  final case class AudioFingerprint(id: Long, n_frames: Int, fp: Long)

  /** Clip-level audio fingerprint (round 16) — the Haitsma & Kalker
    * (2002) robust-hash recipe with 8 sub-segment energies standing in
    * for FFT bands (no FFT dependency exists in this container; the
    * time–frequency DIFFERENCE structure is the recipe's robustness,
    * not the band transform): per 80-sample frame f, 8 energies
    * E(f,k) = Σs² over 10-sample sub-segments, bit(f,k) = 1 iff
    * (E(f,k) − E(f,k+1)) − (E(f−1,k) − E(f−1,k+1)) > 0 — the sign of
    * the time-delta of the spectral-shape delta, k = 0..6, f ≥ 1;
    * clip fingerprint = the ≤42-bit word of all bits. Signs are
    * invariant under amplitude scaling (energies scale by c² > 0
    * uniformly), which is what makes it a dedup identity for
    * re-leveled/re-encoded copies of the same recording — the audio
    * face of [[videoFingerprints]]' majority vote. Real JDK decode per
    * row, partition-parallel, 3 fields leave the task. */
  def audioFingerprints(df: DataFrame, idCol: String,
      binCol: String): Dataset[AudioFingerprint] = {
    import javax.sound.sampled.AudioSystem
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          && !fmt.isBigEndian, s"unexpected WAV format for id=$id: $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val nf = n / 80
        val e = Array.ofDim[Long](nf, 8)
        var t = 0
        while (t < nf * 80) {
          val s = ((pcm(2 * t) & 0xFF) | (pcm(2 * t + 1) << 8))
            .toShort.toLong
          e(t / 80)((t % 80) / 10) += s * s
          t += 1
        }
        var fp = 0L
        var f = 1
        // bit (f−1)·7+k must stay under 64 (Scala's << wraps mod 64,
        // silently folding later frames onto earlier bits) — the word
        // covers the first 10 frames (bits 0..62); longer clips
        // fingerprint their opening 800 samples, mirrored in the
        // oracle's `f < 10` cap
        val fCap = math.min(nf, 10)
        while (f < fCap) {
          var k = 0
          while (k < 7) {
            val d = (e(f)(k) - e(f)(k + 1)) - (e(f - 1)(k) - e(f - 1)(k + 1))
            if (d > 0) fp |= 1L << ((f - 1) * 7 + k)
            k += 1
          }
          f += 1
        }
        AudioFingerprint(id, nf, fp)
      }
  }

  final case class AudioWord(id: Long, n_frames: Int, widx: Int,
    word: Long)

  /** FULL-CLIP audio fingerprint (round 18) — [[audioFingerprints]]
    * without its 10-frame horizon: the same Haitsma–Kalker sign bits
    * (bit j = (f−1)·7 + k globally, f = 1..nf−1), packed 63 bits per
    * word so no bit ever wraps Scala's mod-64 shift, emitted as one
    * (id, widx, word) row per 63-bit window. Word 0 is BIT-IDENTICAL
    * to [[audioFingerprints]]' `fp` (same bits 0..62), so the legacy
    * single-word face is exactly this one's first row; words 1+ are
    * what it was missing — two clips identical in their opening
    * 0.1 s but different after now differ in some later word. Every
    * clip emits ≥ 1 word (an empty/short clip emits word 0 = 0,
    * mirroring the legacy coalesce-to-0), and the per-window words
    * are ALSO what gives dedup banding real entropy: banding over
    * (widx, band) has nWords·7 buckets of signal instead of 7. */
  def audioFingerprintWords(df: DataFrame, idCol: String,
      binCol: String): Dataset[AudioWord] = {
    import javax.sound.sampled.AudioSystem
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          && !fmt.isBigEndian, s"unexpected WAV format for id=$id: $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val nf = n / 80
        val e = Array.ofDim[Long](nf, 8)
        var t = 0
        while (t < nf * 80) {
          val s = ((pcm(2 * t) & 0xFF) | (pcm(2 * t + 1) << 8))
            .toShort.toLong
          e(t / 80)((t % 80) / 10) += s * s
          t += 1
        }
        val nBits = math.max(0, (nf - 1) * 7)
        val nWords = math.max(1, (nBits + 62) / 63)
        val words = new Array[Long](nWords)
        var f = 1
        while (f < nf) {
          var k = 0
          while (k < 7) {
            val d = (e(f)(k) - e(f)(k + 1)) - (e(f - 1)(k) - e(f - 1)(k + 1))
            val j = (f - 1) * 7 + k
            if (d > 0) words(j / 63) |= 1L << (j % 63)
            k += 1
          }
          f += 1
        }
        words.iterator.zipWithIndex.map { case (w, i) =>
          AudioWord(id, nf, i, w)
        }
      }
  }

  final case class WavFeatures(id: Long, n_samples: Long, sr: Int,
      duration_us: Long, energy: Long, zero_cross: Long, peak: Int)

  /** Batch audio feature extraction: REAL `AudioSystem` decode per row
    * (WAV header parse + PCM16 little-endian samples), then one pass
    * for the classic clip features — energy Σs² (exact integer; at
    * 10⁹-sample clips swap the accumulator to DECIMAL(38,0) — the
    * documented embed_dimstats discipline), zero crossings (sign
    * changes over s ≥ 0, the voiced/unvoiced heuristic), peak |s|,
    * and the µs duration n·10⁶/rate (exact at 8 kHz: n·125). The
    * oracle re-derives all of them from the generator formula, so the
    * gate covers encode → WAV container → decode → feature — if the
    * JDK codec mangled one sample anywhere, the hash compare fails.
    * Same scale shape as [[decodeMeta]]: decode is partition-parallel,
    * codec state per partition, only k-integer rows ever shuffle. */
  def wavFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[WavFeatures] = {
    import javax.sound.sampled.AudioSystem
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
            && !fmt.isBigEndian, s"unexpected WAV format for id=$id: $fmt")
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          var (energy, zc) = (0L, 0L)
          var peak = 0
          var prevNonNeg = true
          var t = 0
          while (t < n) {
            val s = ((pcm(2 * t) & 0xFF) | (pcm(2 * t + 1) << 8)).toShort.toInt
            energy += s.toLong * s
            val nonNeg = s >= 0
            if (t > 0 && nonNeg != prevNonNeg) zc += 1
            prevNonNeg = nonNeg
            if (math.abs(s) > peak) peak = math.abs(s)
            t += 1
          }
          WavFeatures(id, n.toLong, fmt.getSampleRate.toInt,
            n.toLong * 1000000L / fmt.getSampleRate.toLong, energy, zc, peak)
        }
      }
  }
}
