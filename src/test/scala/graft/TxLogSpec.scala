package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.sources.{TxLogStore, TxLogTable}
import graft.streaming.StreamingOps

/** The file-based transaction log (SURVEY §8a made concrete): atomic
  * multi-file commits, snapshot isolation, txn-record exactly-once,
  * optimistic concurrency, time travel. */
class TxLogSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_txlog_").toString

  test("TxLogStore drives the upsert MERGE dataflow; replay is " +
      "answered by ONE txn record, atomic across buckets") {
    val dir = tmp()
    try {
      val store = new TxLogStore(dir)
      val table = new TxLogTable(dir)
      val sink = StreamingOps.upsertSink(store, nBuckets = 4)
      def state() = table.snapshot(spark).map(_.collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("event_type"), r.getAs[Double]("value")))
        .toMap).getOrElse(Map.empty)
      sink(Seq((1L, ts(5), "view", 1.0, 10L),
        (1L, ts(10), "click", 2.0, 11L), (2L, ts(20), "view", 3.0, 12L))
        .toDF("user_id", "ts", "event_type", "value", "event_id"), 0L)
      assert(state() === Map(1L -> (("click", 2.0)),
        2L -> (("view", 3.0))))
      // late event must not regress; new user lands — the commit spans
      // two buckets and is ONE log entry
      val vBefore = table.currentVersion()
      sink(Seq((2L, ts(15), "error", 9.0, 13L),
        (3L, ts(30), "signup", 4.0, 14L))
        .toDF("user_id", "ts", "event_type", "value", "event_id"), 1L)
      assert(table.currentVersion() === vBefore + 1,
        "a multi-bucket batch commits as exactly one log entry")
      val s1 = state()
      assert(s1 === Map(1L -> (("click", 2.0)), 2L -> (("view", 3.0)),
        3L -> (("signup", 4.0))))
      // replay: the txn record answers without any per-bucket dance
      sink(Seq((2L, ts(15), "error", 9.0, 13L))
        .toDF("user_id", "ts", "event_type", "value", "event_id"), 1L)
      assert(state() === s1, "txn-recorded batch must be skipped")
      assert(table.txns() === Set(0L, 1L))
      // a genuinely newer event still updates
      sink(Seq((1L, ts(60), "purchase", 8.0, 15L))
        .toDF("user_id", "ts", "event_type", "value", "event_id"), 2L)
      assert(state()(1L) === (("purchase", 8.0)))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("uncommitted data files are invisible: the log rename IS the " +
      "commit (the crash window leaves only garbage, never torn state)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(Seq((1, "a")).toDF("k", "v"))
      // crash before the log entry: a reader sees an EMPTY table
      assert(table.snapshot(spark).isEmpty,
        "data files without a log entry must be invisible")
      assert(table.commit(f1, Nil, Some(0L)) === 1L)
      assert(table.snapshot(spark).get.collect().toSeq
        .map(r => (r.getInt(0), r.getString(1))) === Seq((1, "a")))
      // a replacing commit: add f2, remove f1 — in one entry
      val f2 = table.writeDataFiles(Seq((1, "b")).toDF("k", "v"))
      assert(table.commit(f2, f1, Some(1L)) === 2L)
      assert(table.snapshot(spark).get.collect().head.getString(1) === "b")
      // time travel: version 1 still reads the pre-replacement row
      assert(table.snapshot(spark, version = 1L).get
        .collect().head.getString(1) === "a")
      assert(table.liveFiles() === f2)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("optimistic concurrency: racing committers serialize by atomic " +
      "rename — both land, neither is lost") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val fa = table.writeDataFiles(Seq((1, "a")).toDF("k", "v"))
      val fb = table.writeDataFiles(Seq((2, "b")).toDF("k", "v"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      // both racers retry with their own (unchanged) file sets —
      // disjoint payloads, so a rebase is a plain retry
      val r1 = Future(table.commit(fa, Nil, Some(10L),
        rebase = _ => Some((fa, Nil))))
      val r2 = Future(table.commit(fb, Nil, Some(11L),
        rebase = _ => Some((fb, Nil))))
      val (v1, v2) = (Await.result(r1, 1.minute), Await.result(r2, 1.minute))
      assert(Set(v1, v2) === Set(1L, 2L),
        s"racers must take distinct consecutive versions, got $v1/$v2")
      assert(table.liveFiles().toSet === (fa ++ fb).toSet)
      assert(table.txns() === Set(10L, 11L))
      assert(table.snapshot(spark).get.count() === 2L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }


  test("incrementalDedupSinkTx: exactly-once ingest through the log — " +
      "replays skip before compute, a crash window leaves no torn state") {
    val dir = tmp()
    try {
      val sink = StreamingOps.incrementalDedupSinkTx(dir)
      val table = new TxLogTable(dir)
      val base = "the quick brown fox jumps over the lazy dog again and again"
      val b1 = Seq((1L, "en", base),
        (2L, "en", "completely different words here entirely"),
        (5L, "en", base)) // within-batch exact dup keeps min id
        .toDF("doc_id", "lang", "text")
      sink(b1, 0L)
      def ids() = table.snapshot(spark)
        .map(_.select("doc_id").collect().map(_.getLong(0)).toSet)
        .getOrElse(Set.empty[Long])
      assert(ids() === Set(1L, 2L))
      val v1 = table.currentVersion()
      // exactly-once: the replayed batch is answered from the txn log
      // BEFORE any dedup work — no new version, no new files
      sink(b1, 0L)
      assert(table.currentVersion() === v1, "replay must not commit")
      assert(ids() === Set(1L, 2L))
      // batch 1: an exact corpus dup, a near-dup, and a novel doc
      sink(Seq((10L, "en", base),
        (11L, "en", base.replace("dog", "cat")),
        (12L, "en", "fresh novel content that matches nothing prior at all"))
        .toDF("doc_id", "lang", "text"), 1L)
      assert(ids() === Set(1L, 2L, 12L))
      // crash window: data files written but never committed are
      // invisible — the snapshot and the dedup probes ignore them
      table.writeDataFiles(Seq((99L, "en", 0L, "torn write"))
        .toDF("doc_id", "lang", "lb", "text"))
      assert(ids() === Set(1L, 2L, 12L),
        "uncommitted files must stay invisible to the corpus")
      assert(table.txns() === Set(0L, 1L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("LogPublisher seam: commit retries through injected conflicts " +
      "and lands at the post-conflict version, rebase consulted per hit") {
    // a publisher that claims "name exists" for the first two attempts
    // regardless of the filesystem - the shape of an object-store
    // conditional-put backend under contention
    val dir = tmp()
    try {
      var conflicts = 2
      var rebases = 0
      val flaky = new graft.sources.LogPublisher {
        def publish(d: java.nio.file.Path, name: String,
            content: Array[Byte]): Unit = {
          if (conflicts > 0) {
            conflicts -= 1
            throw new java.nio.file.FileAlreadyExistsException(name)
          }
          graft.sources.LogPublisher.HardLink.publish(d, name, content)
        }
      }
      val table = new TxLogTable(dir, flaky)
      val f1 = table.writeDataFiles(Seq((1, "a")).toDF("k", "v"))
      val v = table.commit(f1, Nil, Some(0L), rebase = _ => {
        rebases += 1; Some((f1, Nil))
      })
      assert(rebases === 2, "rebase must run once per conflict")
      assert(v >= 1L, s"the commit must eventually land, got $v")
      assert(table.liveFiles() === f1)
      assert(table.txns() === Set(0L))
      // aborting rebase surfaces as -1 and publishes nothing
      var aborted = false
      conflicts = 1
      val f2 = table.writeDataFiles(Seq((2, "b")).toDF("k", "v"))
      val v2 = table.commit(f2, Nil, Some(1L), rebase = _ => {
        aborted = true; None
      })
      assert(v2 === -1L && aborted)
      assert(table.liveFiles() === f1, "an aborted commit adds nothing")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
