package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions.transform
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("a known 2x2 image decodes to its exact RGB values (png and bmp)") {
    // the round-10 verdict's done-criterion: hand-set pixels, real
    // encode, real decode, EXACT channel sums — for both JDK codecs
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000) // red
    img.setRGB(1, 0, 0x00FF00) // green
    img.setRGB(0, 1, 0x0000FF) // blue
    img.setRGB(1, 1, 0x102030)
    for (fmt <- Seq("png", "bmp")) {
      val df = Seq((9L, encode(img, fmt))).toDF("id", "media")
      val d = Multimodal.decodeMeta(df, "id", "media").collect().head
      assert(d.fmt === fmt)
      assert((d.width, d.height) === ((2, 2)))
      assert(d.sum_r === 255L + 0x10, s"$fmt red sum")
      assert(d.sum_g === 255L + 0x20, s"$fmt green sum")
      assert(d.sum_b === 255L + 0x30, s"$fmt blue sum")
    }
  }

  test("the synthetic corpus round-trips: real encode -> real decode matches the generator") {
    for (id <- Seq(0L, 1L, 7L, 38L, 499L)) {
      val (w, h) = Multimodal.synthDims(id)
      val df = Seq((id, Multimodal.imageBytes(id))).toDF("id", "media")
      val d = Multimodal.decodeMeta(df, "id", "media").collect().head
      assert(d.fmt === (if (id % 2 == 0) "png" else "bmp"))
      assert((d.width, d.height) === ((w, h)))
      def want(c: Int): Long = (for { x <- 0 until w; y <- 0 until h }
        yield Multimodal.pixel(id, 0, x, y, c).toLong).sum
      assert(d.sum_r === want(0) && d.sum_g === want(1) && d.sum_b === want(2),
        s"id=$id decoded sums must equal the generator's")
    }
  }

  test("resizeNN reads the exact nearest-neighbor source pixels") {
    // 4x4 image with distinct per-pixel values; half-box NN must read
    // source pixels (0,0),(2,0),(0,2),(2,2)
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, (y * 4 + x) << 16) // red channel encodes position
    val out = Multimodal.resizeNN(
      Seq((1L, encode(img, "png"))).toDF("id", "media"), "id", "media")
      .collect().head
    assert((out.dst_w, out.dst_h) === ((2, 2)))
    assert(out.sum_r === (0 + 2 + 8 + 10), "NN must sample (0,0),(2,0),(0,2),(2,2)")
    assert(out.sum_g === 0L && out.sum_b === 0L)
  }

  test("the GFV1 container samples every other frame with real per-frame decode") {
    val id = 38L // 1 + 38%5 = 4 frames -> sampled 0, 2
    val (w, h) = Multimodal.synthDims(id)
    val frames = Multimodal.sampleFrames(
      Seq((id, Multimodal.videoBytes(id))).toDF("id", "media"), "id", "media")
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2))
    def want(f: Int, c: Int): Long = (for { x <- 0 until w; y <- 0 until h }
      yield Multimodal.pixel(id, f, x, y, c).toLong).sum
    frames.foreach { fr =>
      assert((fr.width, fr.height) === ((w, h)))
      assert(fr.sum_r === want(fr.frame_idx, 0))
      assert(fr.sum_g === want(fr.frame_idx, 1))
      assert(fr.sum_b === want(fr.frame_idx, 2))
    }
    // stride=1 decodes all frames
    assert(Multimodal.sampleFrames(
      Seq((id, Multimodal.videoBytes(id))).toDF("id", "media"),
      "id", "media", stride = 1).count() === 4)
  }

  test("videoFingerprints: re-encoded copies collide, a dropped tail " +
      "frame barely moves the majority vote, and a frame digest would " +
      "not survive either") {
    val id = 39L // 1 + 39%5 = 5 frames
    val (w, h) = Multimodal.synthDims(id)
    def frame(f: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y,
          (Multimodal.pixel(id, f, x, y, 0) << 16) |
            (Multimodal.pixel(id, f, x, y, 1) << 8) |
            Multimodal.pixel(id, f, x, y, 2))
      img
    }
    def container(fmt: String, nFrames: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.writeBytes("GFV1"); dos.writeInt(nFrames)
      (0 until nFrames).foreach { f =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(frame(f), fmt, bos)
        dos.writeInt(bos.size()); bos.writeTo(dos)
      }
      dos.flush(); out.toByteArray
    }
    def fp(media: Array[Byte]) = Multimodal.videoFingerprints(
      Seq((id, media)).toDF("id", "media"), "id", "media")
      .collect().head
    val png = fp(Multimodal.videoBytes(id))
    val bmp = fp(container("bmp", 5))
    assert(png.n_frames === 5)
    // the recompressed-copy regime: different container bytes, same
    // decoded pixels -> identical video identity
    assert(bmp.vhash === png.vhash && bmp.drift === png.drift,
      "a lossless re-encode must not move the perceptual signature")
    // robustness of the majority vote: dropping the tail frame flips
    // only bits where frame 4 was the tiebreaker
    val dropped = fp(container("png", 4))
    val moved = java.lang.Long.bitCount(dropped.vhash ^ png.vhash)
    assert(moved <= 12,
      s"majority signature moved $moved bits on a dropped tail frame")
    // while any digest of the exact frame-hash LIST changes completely
    // (4 ≠ 5 frames) — the contrast the operator exists for
    assert(dropped.n_frames === 4)
  }

  test("audioFingerprints: a re-leveled copy keeps the sign structure " +
      "and an unrelated clip does not") {
    // planted pseudo-noise clips (the corpus generator is a phase-
    // shifted sawtooth whose energy STRUCTURE barely varies between
    // ids — 19 distinct fps over 500 clips at gate scale, honest but
    // useless for a discrimination gate; the spec owns richer inputs)
    def md5hex(str: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def noise(tag: String)(t: Int): Int =
      (java.lang.Long.parseLong(md5hex(s"$tag:$t").take(8), 16) %
        60000L - 30000L).toInt
    def wav(gen: Int => Int, scaleNum: Int, scaleDen: Int,
        n: Int = 480): Array[Byte] = {
      import javax.sound.sampled.{AudioFormat, AudioInputStream,
        AudioSystem, AudioFileFormat}
      val pcm = new Array[Byte](n * 2)
      for (t <- 0 until n) {
        val s = gen(t) * scaleNum / scaleDen
        pcm(2 * t) = (s & 0xFF).toByte
        pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def fp(media: Array[Byte]): Long = Multimodal.audioFingerprints(
      Seq((1L, media)).toDF("id", "media"), "id", "media")
      .collect().head.fp
    val full = fp(wav(noise("a"), 1, 1))
    // half-amplitude re-level: energies scale ~c² uniformly, so the
    // difference SIGNS survive up to integer-truncation noise on
    // near-tie bits — the re-encoded-copy regime the fingerprint
    // exists for
    val releveled = fp(wav(noise("a"), 1, 2))
    val moved = java.lang.Long.bitCount(full ^ releveled)
    assert(moved <= 4,
      s"re-leveled copy moved $moved of ~35 bits — not a match")
    // an unrelated clip's fingerprint must sit far away
    val other = fp(wav(noise("b"), 1, 1))
    val far = java.lang.Long.bitCount(full ^ other)
    assert(far >= 10,
      s"unrelated clip only $far bits away — fingerprint carries no " +
        "signal")
  }

  test("audioFingerprintWords covers the WHOLE clip: two clips " +
      "identical in their opening 0.1 s collide on the legacy word " +
      "but diverge in a later word, and the dedup face separates " +
      "them while still pairing a full-clip re-level") {
    def md5hex(str: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def noise(tag: String)(t: Int): Int =
      (java.lang.Long.parseLong(md5hex(s"$tag:$t").take(8), 16) %
        60000L - 30000L).toInt
    def wav(gen: Int => Int, scaleNum: Int, scaleDen: Int,
        n: Int): Array[Byte] = {
      import javax.sound.sampled.{AudioFormat, AudioInputStream,
        AudioSystem, AudioFileFormat}
      val pcm = new Array[Byte](n * 2)
      for (t <- 0 until n) {
        val s = gen(t) * scaleNum / scaleDen
        pcm(2 * t) = (s & 0xFF).toByte
        pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 1600 samples = 20 frames = 19 delta-frames = 133 bits = 3 words
    val n = 1600
    val genA = noise("a") _
    // identical to A for the first 800 samples (10 frames — exactly
    // the legacy fingerprint's horizon), unrelated after
    def genB(t: Int): Int = if (t < 800) genA(t) else noise("b")(t)
    val wavA = wav(genA, 1, 1, n)
    val wavB = wav(genB, 1, 1, n)
    val wavA2 = wav(genA, 1, 2, n) // half-amplitude re-level of A
    // the legacy single-word face cannot tell A from B
    val legacy = Multimodal.audioFingerprints(
      Seq((0L, wavA), (1L, wavB)).toDF("id", "media"), "id", "media")
      .collect().map(r => r.id -> r.fp).toMap
    assert(legacy(0L) === legacy(1L),
      "clips identical in their first 0.1 s must collide on the " +
        "legacy 10-frame word — the gap this spec documents")
    // the multi-word face differs in a later window
    val words = Multimodal.audioFingerprintWords(
      Seq((0L, wavA), (1L, wavB)).toDF("id", "media"), "id", "media")
      .collect()
    assert(words.count(_.id == 0L) === 3, "20 frames pack 3 words")
    val w0 = words.filter(_.id == 0L).map(w => w.widx -> w.word).toMap
    val w1 = words.filter(_.id == 1L).map(w => w.widx -> w.word).toMap
    assert(w0(0) === legacy(0L), "word 0 is the legacy fp bit for bit")
    assert((1 to 2).exists(i => w0(i) != w1(i)),
      "the tail windows must separate the clips")
    // dedup over the word table: the re-level pairs with A, B does not
    val tab = Multimodal.audioFingerprintWords(
      Seq((0L, wavA), (1L, wavA2), (2L, wavB)).toDF("id", "media"),
      "id", "media").toDF()
    val pairs = graft.queries.MultimodalPack.audioDedupFrom(tab)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)),
      "a full-clip re-level must verify within the per-window budget")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      "a clip sharing only its opening 0.1 s must NOT pair — the " +
        "whole-clip Hamming rejects it")
  }

  test("audio band-bucket cap bounds a planted hot band's candidate " +
      "yield; exact-duplicate pairs bypass the cap") {
    // 40 distinct single-word fingerprints, each one bit off a shared
    // base: every band's base-value bucket holds ~35 fingerprints —
    // the 448-bucket quadratic the round-17 face had, in miniature
    val base = 0x2AAAAAAAAAL
    val hotClips = (0 until 40).map(i => (i.toLong, 0, base ^ (1L << i)))
    val dupWord = base ^ (1L << 40)
    val all = (hotClips :+ (100L, 0, dupWord) :+ (101L, 0, dupWord))
      .toDF("id", "widx", "word")
    val uncapped = graft.queries.MultimodalPack.audioDedupFrom(all)
    // 41 distinct fingerprints, all pairwise Hamming ≤ 4: C(41,2)
    // rep pairs, the dup digest carrying 2 members (40·2 = 80 rows),
    // plus the within pair
    assert(uncapped.count() === 780L + 80L + 1L, "uncapped is quadratic")
    val capped = graft.queries.MultimodalPack.audioDedupFrom(all,
      bandCap = 4L).collect()
    assert(capped.length === 1,
      s"hot buckets must be dropped, got ${capped.length} pairs")
    assert(capped.head.getLong(0) === 100L
        && capped.head.getLong(1) === 101L
        && capped.head.getInt(2) === 0,
      "the exact-duplicate pair rides the identical-fingerprint " +
        "collapse, not the bands, so the cap never loses it")
  }

  test("video frame-hash df cap drops a planted ubiquitous slate " +
      "frame: the slate-only false pair dies, the trimmed true pair " +
      "survives") {
    val slate = 777L
    // 40 clips: one unique frame + the shared slate (2 hashes each)
    val crowd = (0 until 40).flatMap(i =>
      Seq((i.toLong, i * 1000L + 13), (i.toLong, slate)))
    // true trimmed pair: 101 is 100 minus one frame (plus the slate)
    val truePair = Seq((100L, 5001L), (100L, 5002L), (100L, 5003L),
      (100L, slate), (101L, 5001L), (101L, 5002L), (101L, slate))
    // slate-only clips: nothing in common BUT the slate
    val slateOnly = Seq((201L, slate), (203L, slate))
    val fh = (crowd ++ truePair ++ slateOnly).toDF("id", "ahash")
    val uncapped = graft.queries.MultimodalPack
      .videoDedupFrom(fh, dfCap = Long.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((201L, 203L)),
      "without the cap the no-signal slate alone makes a 10000 bp " +
        "'duplicate' — the false-positive shape the cap also kills")
    assert(uncapped.contains((100L, 101L)))
    val capped = graft.queries.MultimodalPack.videoDedupFrom(fh,
      dfCap = 4L)
    val rows = capped.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet
        === Set((100L, 101L)),
      s"capped must keep exactly the true pair, got ${rows.toSeq}")
    // containment arithmetic runs over identity-bearing frames only
    val r = rows.head
    assert(r.getAs[Long]("n_shared") === 2L
      && r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L
      && r.getAs[Long]("cont_bp") === 10000L)
  }

  test("channelHistogram counts real pixels and featureVectors normalize to 1 per channel") {
    val id = 7L
    val (w, h) = Multimodal.synthDims(id)
    val df = Seq((id, Multimodal.imageBytes(id))).toDF("id", "media")
    val bins = Multimodal.channelHistogram(df, "id", "media").collect()
    assert(bins.map(_.cnt).sum === 3L * w * h, "every pixel lands in one bin per channel")
    val wantR = (for { x <- 0 until w; y <- 0 until h }
      yield Multimodal.pixel(id, 0, x, y, 0) / 64)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotR = bins.filter(_.channel == 0).map(b => b.bin -> b.cnt).toMap
    assert(gotR === wantR, "red histogram must match the generator's")
    val vec = Multimodal.featureVectors(df, "id", "media").collect().head.hist
    assert(vec.length === 12)
    for (c <- 0 until 3)
      assert(math.abs(vec.slice(c * 4, c * 4 + 4).sum - 1.0) < 1e-3,
        s"channel $c mass must L1-normalize to 1")
  }

  test("undecodable payloads fail loudly, not silently") {
    val bad = Seq((1L, "not an image".getBytes("UTF-8"))).toDF("id", "media")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(bad, "id", "media").collect()
    }
    assert(e.getMessage.contains("undecodable") ||
      Option(e.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("mm_semdedup bridges real image features into semantic dedup: replicas collapse") {
    import graft.operators.{KMeansND, Similarity}
    // the gated query's funnel conserves the corpus on real tables
    val funnel = graft.queries.MultimodalPack.defs("mm_semdedup")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_dropped")))
    val n = Tables.documents(spark, sfDir).count()
    assert(funnel.map(_._1).sum === n, "every media row lands in exactly one cell")
    funnel.foreach { case (v, k, dr) => assert(k + dr === v, "kept+dropped=seen") }
    // replica collapse through the SAME path: byte-identical image
    // payloads produce identical feature vectors, so the lower id is
    // kept and the replica drops; single-color images occupy disjoint
    // histogram bins, so the distinct ones survive tau=0.98
    def solid(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      encode(img, "png")
    }
    val media = Seq(
      1L -> solid(0xFF0000), 2L -> solid(0xFF0000), // replica pair
      3L -> solid(0x00FF00), 4L -> solid(0x0000FF))
      .toDF("doc_id", "media")
    val feats = Multimodal.featureVectors(media, "doc_id", "media").toDF()
      .select($"id".as("vec_id"),
        transform($"hist", v => v.cast("float")).as("embedding"))
    val cells = KMeansND.seed(
      feats.select($"vec_id".as("id"), $"embedding".as("vec")), 2)
    val kept = Similarity.semDedupApply(feats, cells, tau = 0.98)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L),
      s"byte-identical replica must collapse to the min id, kept=$kept")
    assert(kept.contains(3L) && kept.contains(4L),
      s"distinct payloads must survive, kept=$kept")
  }

  test("mm_ahash_dedup: perceptual hash collapses cross-format mirrors byte dedup misses") {
    val sfDir = "/root/testdata/sf0.001"
    val pairs = graft.queries.MultimodalPack.defs("mm_ahash_dedup")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"), r.getAs[Boolean]("same_bytes")))
    // every mirror pair (2c png, 2c+1 bmp) must collapse at Hamming 0:
    // the decoded rasters are identical, so the perceptual hash cannot
    // tell the containers apart
    val ids = Tables.documents(spark, sfDir)
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    val mirror = ids.filter(id => id % 2 == 0 && ids.contains(id + 1))
      .map(id => (id, id + 1))
    val ham0 = pairs.collect { case (a, b, 0, _) => (a, b) }.toSet
    assert(mirror.subsetOf(ham0),
      s"missing mirror pairs: ${(mirror -- ham0).take(5)}")
    // ...while the container bytes differ on every one of them (PNG vs
    // BMP): byte-level dedup finds NOTHING here
    val mirrorRows = pairs.filter(p => mirror.contains((p._1, p._2)))
    assert(mirrorRows.nonEmpty && mirrorRows.forall(!_._4),
      "mirror pairs must be byte-distinct (different containers)")
  }

  test("mm_audio_dedup: every planted re-leveled copy collapses " +
      "through the banded fingerprint blocking") {
    val sfDir = "/root/testdata/sf0.001"
    val pairs = graft.queries.MultimodalPack.defs("mm_audio_dedup")(
        spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"), r.getAs[Boolean]("same_src")))
    val ids = Tables.documents(spark, sfDir)
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    val planted = ids.filter(id => id % 2 == 0 && ids.contains(id + 1))
      .map(id => (id, id + 1))
    // the half-level copy is NOT byte- or sample-identical (truncating
    // halving), yet its sign-structure word must land within the
    // banding's completeness radius — measured 0 on this corpus,
    // gated at <= 2 for slack against future corpus tweaks
    val found = pairs.collect { case (a, b, h, _) if h <= 2 => (a, b) }
      .toSet
    assert(planted.subsetOf(found),
      s"missing re-leveled pairs: ${(planted -- found).take(5)}")
    // the same_src audit is truthful: exactly the planted pairs
    assert(pairs.filter(_._4).map(p => (p._1, p._2)).toSet === planted)
  }

  test("mm_video_dedup: every planted trimmed re-encode collapses at " +
      "full containment") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = graft.queries.MultimodalPack.defs("mm_video_dedup")(
        spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("cont_bp"), r.getAs[Boolean]("same_src")))
    val ids = Tables.documents(spark, sfDir)
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    val planted = ids.filter(id => id % 2 == 0 && ids.contains(id + 1))
      .map(id => (id, id + 1))
    // the trimmed copy's distinct frame-hash set is a SUBSET of the
    // original's (lossless codec, shared frames), so its containment
    // is exactly 10000 bp
    val full = rows.collect { case (a, b, 10000L, _) => (a, b) }.toSet
    assert(planted.subsetOf(full),
      s"missing trimmed pairs: ${(planted -- full).take(5)}")
    assert(rows.filter(_._4).map(p => (p._1, p._2)).toSet === planted)
  }

  test("audio/video dedup from a parquet-round-tripped identity table " +
      "equals the in-query face row for row") {
    // the persisted-fingerprint production contract: identities are
    // computed once at ingest and STORED; the daily dedup reads the
    // table and pays only banding/containment. Equivalence must hold
    // through a real storage round trip.
    val sfDir = "/root/testdata/sf0.001"
    val fps = graft.multimodal.Multimodal.audioFingerprintWords(
      graft.multimodal.Multimodal.audioDupCorpus(spark, sfDir),
      "id", "media").toDF()
    val aDir = java.nio.file.Files
      .createTempDirectory("audio-fps").toString
    fps.write.mode("overwrite").parquet(aDir)
    val fromStored = graft.queries.MultimodalPack
      .audioDedupFrom(spark.read.parquet(aDir))
      .collect().map(_.toString).sorted.toSeq
    val inQuery = graft.queries.MultimodalPack
      .defs("mm_audio_dedup")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(fromStored === inQuery)
    val fh = graft.multimodal.Multimodal.frameHashes(
      graft.multimodal.Multimodal.videoDupCorpus(spark, sfDir),
      "id", "media").toDF()
    val vDir = java.nio.file.Files
      .createTempDirectory("video-fh").toString
    fh.write.mode("overwrite").parquet(vDir)
    val vStored = graft.queries.MultimodalPack
      .videoDedupFrom(spark.read.parquet(vDir))
      .collect().map(_.toString).sorted.toSeq
    val vQuery = graft.queries.MultimodalPack
      .defs("mm_video_dedup")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(vStored === vQuery)
  }

  test("video rep collapse FINDS a planted over-cap duplicate group " +
      "(the r16 recall cliff) and the star face reads it out in " +
      "|members| + |repPairs| rows, not C(c,2)") {
    // 10 byte-identical copies of one clip (frames {11,12,13}): with
    // dfCap = 4 the r16 face censused per-COPY df = 10 > cap, dropped
    // every frame, and the most-duplicated clip in the corpus
    // vanished from its own dedup. Rep collapse censuses distinct
    // FINGERPRINTS (df = 1 here), so the flood stays cold and FOUND.
    val copies = (0 until 10).flatMap(i =>
      Seq((i.toLong, 11L), (i.toLong, 12L), (i.toLong, 13L)))
    // a normal trimmed near-dup pair must keep working beside it
    val pair = Seq((100L, 5001L), (100L, 5002L), (100L, 5003L),
      (101L, 5001L), (101L, 5002L))
    val fh = (copies ++ pair).toDF("id", "ahash")
    val rows = graft.queries.MultimodalPack
      .videoDedupFrom(fh, dfCap = 4L).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val flood = (for { a <- 0 until 10; b <- a + 1 until 10 }
      yield (a.toLong, b.toLong)).toSet
    assert(got === flood + ((100L, 101L)),
      s"the flood must be FOUND and the trim pair survive, got $got")
    assert(rows.filter(_.getLong(1) < 10L).forall(r =>
        r.getAs[Long]("cont_bp") === 10000L
          && r.getAs[Long]("n_shared") === 3L),
      "exact copies pair at full containment over all 3 frames")
    // the star face bounds the same group: 9 member edges off the
    // rep + 1 verified rep pair — 10 rows where all-pairs is 46
    val star = graft.queries.MultimodalPack
      .videoDedupStarFrom(fh, dfCap = 4L).collect()
    val member = star.filter(_.getString(2) == "member")
    val repPair = star.filter(_.getString(2) == "pair")
    assert(member.length === 9
        && member.forall(_.getLong(0) === 0L)
        && member.map(_.getLong(1)).toSet === (1L to 9L).toSet,
      "one member edge per non-rep copy, all anchored at the rep")
    assert(repPair.map(r => (r.getLong(0), r.getLong(1))).toSeq
        === Seq((100L, 101L)))
  }

  private def componentsOf(verts: Set[Long],
      edges: Iterable[(Long, Long)]): Set[Set[Long]] = {
    val parent = scala.collection.mutable.Map(
      verts.map(v => v -> v).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) => parent.update(find(a), find(b)) }
    verts.groupBy(find).values.map(_.toSet).toSet
  }

  test("media star faces are connectivity-equivalent to the " +
      "all-pairs readouts — identical components on corpus + a " +
      "planted identical-fingerprint group") {
    val sfDir = "/root/testdata/sf0.001"
    // audio: corpus words + clip 0's words replayed under two fresh
    // ids = a 3-member identical-fingerprint group exercising the
    // member-edge path the bare corpus never does
    val w0 = Multimodal.audioFingerprintWords(
      Multimodal.audioDupCorpus(spark, sfDir), "id", "media").toDF()
    val clone = w0.where($"id" === 0L)
    val words = w0
      .unionByName(clone.withColumn("id",
        org.apache.spark.sql.functions.lit(9000L)))
      .unionByName(clone.withColumn("id",
        org.apache.spark.sql.functions.lit(9001L)))
    val verts = words.select("id").distinct().as[Long].collect().toSet
    val all = graft.queries.MultimodalPack.audioDedupFrom(words)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val star = graft.queries.MultimodalPack.audioDedupStarFrom(words)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(componentsOf(verts, all) === componentsOf(verts, star),
      "audio star edges must walk to the same duplicate sets")
    assert(star.length < all.length + 4,
      "star is never materially larger than all-pairs")
    // video: same discipline over frame hashes
    val f0 = Multimodal.frameHashes(
      Multimodal.videoDupCorpus(spark, sfDir), "id", "media").toDF()
    val fClone = f0.where($"id" === 0L)
    val fh = f0
      .unionByName(fClone.withColumn("id",
        org.apache.spark.sql.functions.lit(9000L)))
      .unionByName(fClone.withColumn("id",
        org.apache.spark.sql.functions.lit(9001L)))
    val fVerts = fh.select("id").distinct().as[Long].collect().toSet
    val vAll = graft.queries.MultimodalPack.videoDedupFrom(fh)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val vStar = graft.queries.MultimodalPack.videoDedupStarFrom(fh)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(componentsOf(fVerts, vAll) === componentsOf(fVerts, vStar),
      "video star edges must walk to the same duplicate sets")
  }

  test("dctProfileOf: flat image is pure DC; stripes out-sharpen a gradient") {
    def fill(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(x, y) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    // flat gray: non-DC energy is pure quantization leakage — the
    // floor-quantized weight rows don't sum to exactly 0, so a flat
    // image leaks ~1e-7 of its DC into the AC block (bounded, not 0)
    val flat = Multimodal.dctProfileOf(1L, fill(16, 16)((_, _) => 128))
    // dc = Σ g·w0(x)·w0(y) = 128 · 2^28 · 256 (w0 = ⌊cos 0 · 2^14⌋)
    assert(flat.dc === 128L * 16384L * 16384L * 256L)
    assert(flat.e_low + flat.e_high < flat.dc / 1000L,
      s"flat-image AC leakage must be tiny vs DC: $flat")
    // 4-on/4-off vertical stripes (period 8 -> u=4, the high split)
    // vs a smooth horizontal gradient (u=1..2, the low split)
    val stripes = Multimodal.dctProfileOf(2L,
      fill(16, 16)((x, _) => if ((x / 4) % 2 == 0) 0 else 255))
    val gradient = Multimodal.dctProfileOf(3L,
      fill(16, 16)((x, _) => x * 16))
    def sharp(p: Multimodal.DctProfile): Double =
      p.e_high.toDouble / (p.e_low + p.e_high)
    // absolute split ratios are diluted by spectral leakage through
    // the big v=0 column factor; the robust property is the ORDERING
    assert(sharp(gradient) < 0.2, s"gradient energy must be low-frequency: $gradient")
    assert(sharp(stripes) > 2 * sharp(gradient),
      s"stripes must out-sharpen the gradient: ${sharp(stripes)} vs ${sharp(gradient)}")
    // container invariance: the same raster through PNG and BMP
    // decodes to the same profile (the mirror-corpus property)
    val img = fill(16, 16)((x, y) => (x * 7 + y * 13) % 256)
    val viaPng = Multimodal.dctProfileOf(4L,
      Multimodal.decodeImage(4L, encode(img, "png")))
    val viaBmp = Multimodal.dctProfileOf(4L,
      Multimodal.decodeImage(4L, encode(img, "bmp")))
    assert(viaPng === viaBmp)
  }

  test("the WAV corpus round-trips: real encode -> real decode matches " +
      "the sample generator, including the -32768 edge") {
    val ids = Seq(0L, 5L, 210L, 211L)
    val got = Multimodal.wavFeatures(
        ids.map(id => (id, Multimodal.wavBytes(id))).toDF("id", "media"),
        "id", "media")
      .collect().map(f => f.id -> f).toMap
    ids.foreach { id =>
      val n = Multimodal.synthSampleCount(id)
      val ss = (0 until n).map(t => Multimodal.sample(id, t))
      val f = got(id)
      assert(f.n_samples === n.toLong && f.sr === 8000)
      assert(f.duration_us === n.toLong * 125)
      assert(f.energy === ss.map(s => s.toLong * s).sum, s"id=$id energy")
      assert(f.zero_cross ===
        ss.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)).toLong)
      assert(f.peak === ss.map(math.abs).max, s"id=$id peak")
    }
    // id 0, t 0: (0 + 0) mod 65536 - 32768 = -32768 — the full
    // signed-16-bit edge must survive the container round trip
    assert(Multimodal.sample(0L, 0) === -32768)
    assert(got(0L).peak === 32768)
  }

  test("mm_wav_segments: frame energies through the real WAV codec " +
      "read the planted silent gap at its exact frame bounds") {
    val ids = Seq(0L, 3L, 6L, 13L, 400L)
    val fe = Multimodal.wavFrameEnergies(
        ids.map(id => (id, Multimodal.speechWavBytes(id)))
          .toDF("id", "media"), "id", "media")
      .collect().groupBy(_.id)
    ids.foreach { id =>
      val n = Multimodal.speechSampleCount(id)
      val (g0, gl) = Multimodal.speechGap(id)
      val frames = fe(id).map(f => f.frame_idx -> f.energy).toMap
      assert(frames.size === n / 80, s"id=$id full frames only")
      // driver replay: every frame's energy matches the generator
      (0 until n / 80).foreach { f =>
        val want = (f * 80 until (f + 1) * 80)
          .map(t => { val s = Multimodal.speechSample(id, t).toLong; s * s })
          .sum
        assert(frames(f) === want, s"id=$id f=$f")
      }
      // the silent frames are EXACTLY the planted gap's
      val silent = frames.filter(_._2 < 80000000L).keySet
      assert(silent === (g0 / 80 until (g0 + gl) / 80).toSet,
        s"id=$id gap=($g0,$gl) got $silent")
    }
  }

  test("mm_shot_bounds: the spike rule reads the exact planted cut " +
      "frame through the real PNG decode, and nothing else") {
    val ids = Seq(0L, 3L, 7L, 12L, 211L)
    val diffs = Multimodal.frameDiffs(
        ids.map(id => (id, Multimodal.shotVideoBytes(id)))
          .toDF("id", "media"), "id", "media")
      .collect().groupBy(_.id)
    ids.foreach { id =>
      val n = Multimodal.shotFrameCount(id)
      val cut = Multimodal.shotCutAt(id)
      val d = diffs(id).map(f => f.frame_idx -> f.sad).toMap
      assert(d.size === n - 1, s"id=$id emits one diff per frame pair")
      // driver replay of the generator: SAD must match pixel for pixel
      val (w, h) = Multimodal.synthDims(id)
      (1 until n).foreach { f =>
        val want = (for (x <- 0 until w; y <- 0 until h; c <- 0 until 3)
          yield math.abs(Multimodal.shotPixel(id, f, x, y, c)
            - Multimodal.shotPixel(id, f - 1, x, y, c)).toLong).sum
        assert(d(f) === want, s"id=$id f=$f")
      }
      // the spike rule flags the planted cut and ONLY the planted cut
      val tot = d.values.sum
      val flagged = d.filter { case (_, sad) =>
        sad * (n - 1) > 3 * tot }.keySet
      assert(flagged === Set(cut), s"id=$id cut=$cut got $flagged")
    }
  }
}
