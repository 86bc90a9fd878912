package graft

import org.apache.spark.sql.functions.{encode, transform}
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("stubDecode parses the fake header deterministically") {
    val bytes = "hello world".getBytes("UTF-8")
    val m1 = Multimodal.stubDecode(7L, bytes)
    val m2 = Multimodal.stubDecode(7L, bytes)
    assert(m1 === m2)
    assert(m1.byte_len === 11)
    assert(m1.width >= 1 && m1.height >= 1 && m1.channels >= 1 && m1.channels <= 4)
    assert(m1.checksum === "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
  }

  test("stubDecode handles empty payloads") {
    val m = Multimodal.stubDecode(1L, Array.emptyByteArray)
    assert(m.byte_len === 0 && m.width === 1 && m.height === 1)
  }

  test("extractFeatures emits normalized fixed-width features") {
    val df = Seq((1L, "aaaa".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("id", "media")
    val got = Multimodal.extractFeatures(df, "id", "media")
      .collect().map(f => f.id -> f).toMap
    // 'a' = 0x61 → bin 3; all mass in one bin, L1-normalized
    assert(got(1L).byte_len === 4)
    assert(got(1L).hist.toSeq === Seq(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    assert(got(2L).hist.toSeq === Seq.fill(8)(0.0))
  }

  test("sampleFrames emits one row per stride with stable hashes") {
    val payload = Array.tabulate[Byte](200)(_.toByte)
    val df = Seq((5L, payload)).toDF("id", "media")
    val frames = Multimodal.sampleFrames(df, "id", "media", stride = 64)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    // frame hash = md5 of the 16 bytes at the stride offset
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest(java.util.Arrays.copyOfRange(payload, 64, 80))
      .map("%02x".format(_)).mkString
    assert(frames(1).frame_hash === want)
    // short payloads still emit one frame
    val one = Multimodal.sampleFrames(
      Seq((6L, "tiny".getBytes("UTF-8"))).toDF("id", "media"), "id", "media")
    assert(one.count() === 1)
  }

  test("resize preserves aspect ratio and never upscales") {
    // header bytes chosen for a 1025×513 source (mild 2:1 aspect)
    val big = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    big(0) = 64; big(1) = 0; big(2) = 32; big(3) = 0
    val out = Multimodal.resize(
      Seq((1L, big)).toDF("id", "media"), "id", "media", 64, 64)
      .collect().head
    assert(out.dst_w <= 64 && out.dst_h <= 64)
    val srcRatio = out.src_w.toDouble / out.src_h
    val dstRatio = out.dst_w.toDouble / out.dst_h
    assert(math.abs(srcRatio - dstRatio) / srcRatio < 0.1,
      "aspect ratio preserved within integer rounding")
    assert(out.out_len <= big.length, "downscale must not grow the payload")
    // deterministic: same input → same checksum
    val again = Multimodal.resize(
      Seq((1L, big)).toDF("id", "media"), "id", "media", 64, 64)
      .collect().head
    assert(again.checksum === out.checksum)
  }

  test("decodeMeta runs distributed over the documents table") {
    val out = Multimodal.documentsAsMedia(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    assert(out.count() === docs.count())
    // utf-8 payload can never be shorter than the char count
    val bad = out.join(docs, out("id") === docs("doc_id"))
      .filter($"byte_len" < $"n_chars").count()
    assert(bad === 0)
  }

  test("mm_semdedup bridges media features into semantic dedup: replicas collapse") {
    import graft.operators.{KMeansND, Similarity}
    // the gated query's funnel conserves the corpus on real tables
    val funnel = graft.queries.MultimodalPack.defs("mm_semdedup")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_dropped")))
    val n = Tables.documents(spark, sfDir).count()
    assert(funnel.map(_._1).sum === n, "every media row lands in exactly one cell")
    funnel.foreach { case (v, k, dr) => assert(k + dr === v, "kept+dropped=seen") }
    // replica collapse through the SAME path: byte-identical payloads
    // produce identical feature vectors, so the lower id is kept and
    // every replica drops — the image-dedup contract
    // payloads chosen to be byte-DISTRIBUTION distinct (the stub
    // feature is an 8-bin byte histogram, so two English sentences are
    // legitimately near-dups — exactly what a crude feature does):
    // lowercase-heavy, digit-heavy, uppercase-heavy
    val payloads = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog", // replica of 1
      3L -> "0123456789012345678901234567890123456789",
      4L -> "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEFGHIJKLMNOP")
    val media = payloads.toDF("doc_id", "text")
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
    val feats = Multimodal.extractFeatures(media, "doc_id", "media").toDF()
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
}
