package graft

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

  test("decodeMeta runs distributed over the documents table") {
    val out = Multimodal.documentsAsMedia(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    assert(out.count() === docs.count())
    // utf-8 payload can never be shorter than the char count
    val bad = out.join(docs, out("id") === docs("doc_id"))
      .filter($"byte_len" < $"n_chars").count()
    assert(bad === 0)
  }
}
