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

  test("TxLogStore reads open only the touched buckets' files — the " +
      "bucket envelopes ride the commit entries") {
    val dir = tmp()
    try {
      val store = new TxLogStore(dir)
      val table = new TxLogTable(dir)
      val sink = StreamingOps.upsertSink(store, nBuckets = 4)
      // users 1..8 spread across all 4 buckets, one commit
      sink((1L to 8L).map(u =>
          (u, ts(u.toInt), "view", u.toDouble, 100L + u))
        .toDF("user_id", "ts", "event_type", "value", "event_id"), 0L)
      val allBuckets = table.snapshot(spark).get
        .select("bucket").distinct().collect().map(_.getInt(0)).toSet
      assert(allBuckets.size === 4, s"need all buckets hit: $allBuckets")
      val one = allBuckets.head
      // the in-list skip opens a strict subset of the live files
      val (df, kept, total) = table.snapshotWhereIn(spark, "bucket",
        Seq(one.toLong))
      assert(total === 4 && kept === 1,
        s"one touched bucket must open 1 of 4 files, got $kept/$total")
      // ...and the store's read through it equals the full-scan filter
      val viaStore = store.read(spark, Seq(one)).get
        .collect().map(_.toString).sorted.toSeq
      val full = table.snapshot(spark).get
        .filter(col("bucket") === one)
        .collect().map(_.toString).sorted.toSeq
      assert(viaStore === full)
      assert(df.get.select("bucket").distinct().count() === 1L)
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

  test("checkpoint compaction: folds read O(interval) entries past the " +
      "newest checkpoint — entries at or below it can be retention-deleted") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir,
        graft.sources.LogPublisher.HardLink, checkpointInterval = 3)
      val files = (1 to 8).map { i =>
        val f = table.writeDataFiles(Seq((i, s"v$i")).toDF("k", "v"))
        // each commit also retires the previous commit's file, so the
        // live set stays 1 file and the fold is genuinely exercised
        val prev = if (i == 1) Nil else table.liveFiles()
        assert(table.commit(f, prev, Some(i.toLong)) === i.toLong)
        f
      }
      val logDir = java.nio.file.Paths.get(dir, "_txlog")
      assert(java.nio.file.Files.exists(
        logDir.resolve(f"${3L}%020d.checkpoint.json")), "checkpoint at v3")
      assert(java.nio.file.Files.exists(
        logDir.resolve(f"${6L}%020d.checkpoint.json")), "checkpoint at v6")
      assert(new String(java.nio.file.Files.readAllBytes(
        logDir.resolve("_last_checkpoint"))) === "6",
        "_last_checkpoint points at the newest checkpoint")
      assert(table.liveFiles() === files(7), "current state = last commit")
      assert(table.txns() === (1 to 8).map(_.toLong).toSet)
      // time travel BELOW the newest checkpoint still folds correctly
      // (the v3 checkpoint serves ≤ 5; full-fold fallback serves ≤ 2)
      assert(table.liveFiles(version = 5L) === files(4))
      assert(table.liveFiles(version = 2L) === files(1))
      assert(table.txns(version = 5L) === (1 to 5).map(_.toLong).toSet)
      // retention: delete every entry at or below the v6 checkpoint —
      // a FRESH instance (cold cache) must still read current state
      // from checkpoint + the 2 surviving entries, proving the fold
      // never touches the deleted prefix
      (1 to 6).foreach(v => java.nio.file.Files
        .delete(logDir.resolve(f"${v.toLong}%020d.json")))
      val cold = new TxLogTable(dir,
        graft.sources.LogPublisher.HardLink, checkpointInterval = 3)
      assert(cold.currentVersion() === 8L)
      assert(cold.liveFiles() === files(7),
        "state must come from the checkpoint, not the deleted entries")
      assert(cold.txns() === (1 to 8).map(_.toLong).toSet,
        "txn tokens survive in the checkpoint")
      // racing committers ACROSS a checkpoint boundary (v9 = interval
      // multiple): both land, neither lost, checkpoint written
      val fa = cold.writeDataFiles(Seq((91, "a")).toDF("k", "v"))
      val fb = cold.writeDataFiles(Seq((92, "b")).toDF("k", "v"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val r1 = Future(cold.commit(fa, Nil, Some(109L),
        rebase = _ => Some((fa, Nil))))
      val r2 = Future(cold.commit(fb, Nil, Some(110L),
        rebase = _ => Some((fb, Nil))))
      val (v1, v2) = (Await.result(r1, 1.minute), Await.result(r2, 1.minute))
      assert(Set(v1, v2) === Set(9L, 10L))
      assert(java.nio.file.Files.exists(
        logDir.resolve(f"${9L}%020d.checkpoint.json")),
        "the racer landing on the interval writes the checkpoint")
      assert(new TxLogTable(dir).liveFiles().toSet
        === (Seq(files(7)) ++ Seq(fa, fb)).flatten.toSet)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("racy-fake conditional-put publisher: lose/retry interleaving " +
      "lands contiguously; phantom conflicts never leave version gaps") {
    val dir = tmp()
    try {
      // interleaving 1 — LOSE then WIN: on our first put of version V
      // a racer's put lands between our log read and our attempt (the
      // object-store conditional-put race, simulated exactly); we must
      // rebase once and land at V+1 with no gap
      var raced = false
      var rebases = 0
      val loseOnce = new graft.sources.LogPublisher {
        def publish(d: java.nio.file.Path, name: String,
            content: Array[Byte]): Unit = {
          if (!raced) {
            raced = true
            graft.sources.LogPublisher.HardLink.publish(d, name,
              """{"add":["racer.parquet"],"remove":[],"txn":77}"""
                .getBytes("UTF-8"))
            throw new java.nio.file.FileAlreadyExistsException(name)
          }
          graft.sources.LogPublisher.HardLink.publish(d, name, content)
        }
      }
      val t1 = new TxLogTable(dir, loseOnce)
      val f1 = t1.writeDataFiles(Seq((1, "a")).toDF("k", "v"))
      val v = t1.commit(f1, Nil, Some(1L), rebase = _ => {
        rebases += 1; Some((f1, Nil))
      })
      assert(rebases === 1 && v === 2L,
        s"loser must land at the NEXT contiguous version, got $v")
      assert(t1.currentVersion() === 2L)
      assert(t1.liveFiles().toSet === (f1 :+ "racer.parquet").toSet)
      assert(t1.txns() === Set(1L, 77L))
      // interleaving 2 — PHANTOM conflicts: the backend claims "exists"
      // twice with NO entry present (a false-positive conditional put);
      // the retry must re-derive the version from the log and commit at
      // 3, not walk forward to 5 leaving gaps
      var phantoms = 2
      val phantom = new graft.sources.LogPublisher {
        def publish(d: java.nio.file.Path, name: String,
            content: Array[Byte]): Unit = {
          if (phantoms > 0) {
            phantoms -= 1
            throw new java.nio.file.FileAlreadyExistsException(name)
          }
          graft.sources.LogPublisher.HardLink.publish(d, name, content)
        }
      }
      val t2 = new TxLogTable(dir, phantom)
      val f2 = t2.writeDataFiles(Seq((2, "b")).toDF("k", "v"))
      val v2 = t2.commit(f2, Nil, Some(2L), rebase = _ => Some((f2, Nil)))
      assert(v2 === 3L, s"phantom conflicts must not leave gaps, got $v2")
      // interleaving 3 — WIN under a genuinely concurrent conditional
      // put: the put decision is an in-memory putIfAbsent (the store's
      // atomicity primitive), materialized through HardLink on success
      val names = new java.util.concurrent.ConcurrentHashMap[String, Boolean]
      val condPut = new graft.sources.LogPublisher {
        def publish(d: java.nio.file.Path, name: String,
            content: Array[Byte]): Unit = {
          if (names.putIfAbsent(name, true) != null)
            throw new java.nio.file.FileAlreadyExistsException(name)
          graft.sources.LogPublisher.HardLink.publish(d, name, content)
        }
      }
      val t3 = new TxLogTable(dir, condPut)
      val fa = t3.writeDataFiles(Seq((3, "c")).toDF("k", "v"))
      val fb = t3.writeDataFiles(Seq((4, "d")).toDF("k", "v"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val ra = Future(t3.commit(fa, Nil, Some(3L),
        rebase = _ => Some((fa, Nil))))
      val rb = Future(t3.commit(fb, Nil, Some(4L),
        rebase = _ => Some((fb, Nil))))
      val (va, vb) = (Await.result(ra, 1.minute), Await.result(rb, 1.minute))
      assert(Set(va, vb) === Set(4L, 5L),
        "racers through the conditional put take distinct contiguous versions")
      assert(new TxLogTable(dir).txns()
        === Set(77L, 1L, 2L, 3L, 4L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("kill between data-file write and log publish: orphans stay " +
      "invisible and the replayed batch re-commits exactly once") {
    val dir = tmp()
    try {
      final class Kill extends RuntimeException("killed mid-commit")
      var alive = false // first publish dies AFTER data files landed
      val killer = new graft.sources.LogPublisher {
        def publish(d: java.nio.file.Path, name: String,
            content: Array[Byte]): Unit = {
          if (!alive) { alive = true; throw new Kill }
          graft.sources.LogPublisher.HardLink.publish(d, name, content)
        }
      }
      val b0 = Seq((1L, ts(5), "view", 1.0, 10L),
        (2L, ts(20), "click", 2.0, 11L))
        .toDF("user_id", "ts", "event_type", "value", "event_id")
      val sink = StreamingOps.upsertSink(new TxLogStore(dir, killer),
        nBuckets = 4)
      intercept[Kill](sink(b0, 0L))
      val table = new TxLogTable(dir)
      // the kill window left data files on disk but no log entry:
      // readers see an EMPTY table, not torn state
      val dataDir = java.nio.file.Paths.get(dir, "data")
      val ds = java.nio.file.Files.list(dataDir)
      val orphans = try ds.count() finally ds.close()
      assert(orphans > 0, "the kill must have left orphaned data files")
      assert(table.currentVersion() === 0L)
      assert(table.snapshot(spark).isEmpty,
        "uncommitted files must be invisible after the kill")
      // restart: the SAME batch replays through a fresh store and
      // commits exactly once
      val sink2 = StreamingOps.upsertSink(new TxLogStore(dir), nBuckets = 4)
      sink2(b0, 0L)
      assert(table.currentVersion() === 1L)
      assert(table.txns() === Set(0L))
      def state() = table.snapshot(spark).map(_.collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value"))
        .toMap).getOrElse(Map.empty)
      assert(state() === Map(1L -> 1.0, 2L -> 2.0))
      // a second replay is answered by the txn record — no new version
      sink2(b0, 0L)
      assert(table.currentVersion() === 1L, "replay must not re-commit")
      assert(state() === Map(1L -> 1.0, 2L -> 2.0))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("deleteWhere rewrites ONLY the files holding true-matching " +
      "rows, keeps NULL-predicate rows, equals snapshot-filter, and " +
      "leaves untouched files byte-identical (same names)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val fa = table.writeDataFiles(
        Seq((1, "a"), (2, "del"), (3, "a")).toDF("k", "v"))
      assert(table.commit(fa, Nil, Some(1L)) === 1L)
      val fb = table.writeDataFiles(
        Seq((4, "del"), (5, "del")).toDF("k", "v"))
      assert(table.commit(fb, Nil, Some(2L)) === 2L)
      val fc = table.writeDataFiles(
        Seq((7, "keep"), (8, null)).toDF("k", "v"))
      assert(table.commit(fc, Nil, Some(3L)) === 3L)
      val vd = table.deleteWhere(spark, col("v") === "del",
        txn = Some(50L))
      assert(vd === Some(4L), "one atomic entry for the whole delete")
      def rows(v: Long = Long.MaxValue) = table.snapshot(spark, v).get
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      // SQL DELETE semantics: (8, null)'s predicate is NULL → kept
      assert(rows() === Set((1, "a"), (3, "a"), (7, "keep"),
        (8, null)), "post-state ≡ filter(NOT pred), null rows kept")
      val liveNow = table.liveFiles().toSet
      assert(liveNow.contains(fc.head),
        "a file with no TRUE match keeps its name — byte-identical, " +
          "never rewritten")
      assert(!fa.exists(liveNow) && !fb.exists(liveNow),
        "touched files leave the live set")
      assert(liveNow.size === 2,
        "fully-matching file B gets NO replacement; A gets one rewrite")
      assert(rows(3L) === Set((1, "a"), (2, "del"), (3, "a"),
        (4, "del"), (5, "del"), (7, "keep"), (8, null)),
        "time travel below the delete still shows the dead rows")
      // a no-match predicate is a no-op — no commit, no version
      assert(table.deleteWhere(spark, col("v") === "absent").isEmpty)
      assert(table.currentVersion() === 4L)
      // idempotence: the recorded txn answers a replay
      assert(table.deleteWhere(spark, col("v") === "a",
        txn = Some(50L)).isEmpty)
      assert(rows().contains((1, "a")), "replayed delete is a no-op")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("deleteWhere with envelope ranges equals the unpruned delete " +
      "and records the rewrite's stats in the log; a racing data " +
      "commit aborts the delete") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val fa = table.writeDataFiles(
        (1 to 4).map(i => (i, "lo")).toDF("k", "v"))
      assert(table.commit(fa, Nil, Some(1L),
        stats = fa.map(_ -> Map("k" -> ((1L, 4L)))).toMap) === 1L)
      val fb = table.writeDataFiles(
        (10 to 14).map(i => (i, "hi")).toDF("k", "v"))
      assert(table.commit(fb, Nil, Some(2L),
        stats = fb.map(_ -> Map("k" -> ((10L, 14L)))).toMap) === 2L)
      // delete k ∈ [11, 12]: the range prunes file A off the log
      // stats before any data is read; the rewrite carries fresh
      // stats so later range reads keep pruning
      val vd = table.deleteWhere(spark,
        col("k") >= 11 && col("k") <= 12,
        ranges = Seq(("k", 11L, 12L)), txn = Some(60L))
      assert(vd === Some(3L))
      assert(table.snapshot(spark).get.count() === 7L)
      assert(table.liveFiles().contains(fa.head),
        "the envelope-pruned file is untouched")
      val rewritten = (table.liveFiles().toSet -- fa.toSet).head
      assert(table.fileStats()(rewritten)("k") === ((10L, 14L)),
        "the rewrite's envelope rides its add entry")
      // abort path: a racer's data commit between the delete's
      // snapshot read and its publish must abort the delete
      var racerDone = false
      val racing = new graft.sources.LogPublisher {
        def publish(d: java.nio.file.Path, name: String,
            content: Array[Byte]): Unit = {
          if (!racerDone) {
            racerDone = true
            val racer = new TxLogTable(dir)
            val rf = racer.writeDataFiles(Seq((99, "r")).toDF("k", "v"))
            racer.commit(rf, Nil, Some(99L))
            throw new java.nio.file.FileAlreadyExistsException(name)
          }
          graft.sources.LogPublisher.HardLink.publish(d, name, content)
        }
      }
      val t2 = new TxLogTable(dir, racing)
      assert(t2.deleteWhere(spark, col("v") === "hi").isEmpty,
        "a delete racing a real data commit must abort")
      val after = new TxLogTable(dir)
      assert(after.txns().contains(99L), "the racer's commit survives")
      assert(after.snapshot(spark).get.count() === 8L,
        "aborted delete leaves the table exactly as the racer left it")
      assert(after.vacuum(minAgeMs = 0L).nonEmpty,
        "the aborted rewrite is an orphan vacuum reclaims")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("ivfIngestSink: batches append atomically with cell envelopes, " +
      "the stored probe equals the full rebuild and opens only the " +
      "probed cells' files, and a replayed batch is a no-op") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val emb = Tables.embeddings(spark, sfDir)
      val cents = graft.operators.KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), 16)
      val sink = StreamingOps.ivfIngestSink(table, cents)
      sink(emb.filter(col("vec_id") % 2 === 0), 0L)
      sink(emb.filter(col("vec_id") % 2 === 1), 1L)
      assert(table.currentVersion() === 2L,
        "each micro-batch is ONE atomic log entry across its cells")
      val q = emb.filter(col("vec_id") < 5)
      val (gotOpt, kept, live) =
        StreamingOps.ivfProbeStored(spark, table, q, cents, k = 3)
      val got = gotOpt.get.collect().map(_.toString).sorted.toSeq
      val want = graft.operators.Similarity.ivfTopK(emb, q, cents, k = 3)
        .collect().map(_.toString).sorted.toSeq
      assert(got === want,
        "ingest-then-probe must equal rebuild-then-probe row for row")
      assert(kept < live,
        s"the probe must open only the probed cells' files ($kept of $live)")
      // replay: one txn-record lookup, no compute, no new version
      sink(emb.filter(col("vec_id") % 2 === 1), 1L)
      assert(table.currentVersion() === 2L, "replayed batch must no-op")
      // ingest growth is bounded by the standard bucket-aligned
      // OPTIMIZE: one file per cell after, probe results identical
      assert(table.optimize(spark, Some("cell")).nonEmpty)
      val (got2, kept2, live2) =
        StreamingOps.ivfProbeStored(spark, table, q, cents, k = 3)
      assert(got2.get.collect().map(_.toString).sorted.toSeq === want,
        "compaction is a pure layout move — probe results unchanged")
      assert(live2 < live && kept2 <= live2,
        s"repack must shrink the file count ($live -> $live2)")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("point-lookup bloom envelopes prune files that range stats " +
      "cannot, with no false negatives, folding through checkpoints") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir, checkpointInterval = 2)
      // 4 files with INTERLEAVED keys (file i holds k ≡ i mod 4): every
      // file's [min,max] covers nearly the whole domain, so range
      // skipping proves nothing — the unclustered high-cardinality
      // regime the bloom exists for
      val fileKeys = (0 until 4).map(i =>
        (0 until 200).map(n => (n * 4 + i).toLong))
      fileKeys.zipWithIndex.foreach { case (ks, i) =>
        val f = table.writeDataFiles(ks.map(k => (k, s"v$k")).toDF("k", "v"))
        val stats = f.map(_ -> Map("k" -> ((ks.min, ks.max)))).toMap
        val blooms = f.map(n =>
          n -> Map("k" -> table.bloomEnvelope(spark, n, "k"))).toMap
        assert(table.commit(f, Nil, Some(i.toLong), stats = stats,
          blooms = blooms) === i + 1L)
      }
      // the IN-list read keeps everything: every envelope contains 42
      val (_, keptIn, liveIn) = table.snapshotWhereIn(spark, "k", Seq(42L))
      assert(keptIn === 4 && liveIn === 4,
        "range stats cannot prune interleaved keys — the gap")
      // the bloom opens exactly the one owning file (42 ≡ 2 mod 4)
      val (dfPt, keptPt, livePt) = table.snapshotWherePoint(spark, "k", 42L)
      assert(livePt === 4)
      assert(keptPt === 1,
        s"bloom must prune to the owning file, kept $keptPt")
      assert(dfPt.get.filter(col("k") === 42L).count() === 1L)
      // no false negatives on a sample of committed keys
      Seq(0L, 37L, 123L, 399L, 798L, 799L).foreach { k =>
        val (df, _, _) = table.snapshotWherePoint(spark, "k", k)
        assert(df.get.filter(col("k") === k).count() === 1L,
          s"point read lost committed key $k — false negative")
      }
      // a key outside every envelope is provably empty
      assert(table.snapshotWherePoint(spark, "k", 4001L)._1.isEmpty)
      // a fresh instance folds the blooms through checkpoint 4 (the
      // interval-2 table checkpointed at commits 2 and 4)
      val t2 = new TxLogTable(dir, checkpointInterval = 2)
      val (_, kept2, _) = t2.snapshotWherePoint(spark, "k", 42L)
      assert(kept2 === 1, "blooms must survive the checkpoint fold")
      // bloom UPKEEP across a copy-on-write delete: the rewrite
      // carries a fresh bloom (bloomCols), so the point read stays
      // file-tight and the deleted key becomes provably absent
      assert(table.deleteWhere(spark, col("k") === 42L,
        ranges = Seq(("k", 42L, 42L)), bloomCols = Seq("k")).nonEmpty)
      val (dfSurv, keptSurv, _) = table.snapshotWherePoint(spark, "k", 46L)
      assert(keptSurv === 1,
        "a surviving key in the rewritten file must still open 1 file")
      assert(dfSurv.get.filter(col("k") === 46L).count() === 1L)
      assert(table.snapshotWherePoint(spark, "k", 42L)._2 === 0,
        "the deleted key's bits are absent from the fresh bloom — " +
          "provably-empty point read without opening a file")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("merge replaces matched keys, inserts the rest, rewrites only " +
      "files actually carrying a source key, and replays as a no-op") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val fa = table.writeDataFiles(
        Seq((1L, "a1"), (2L, "a2")).toDF("k", "v"))
      assert(table.commit(fa, Nil, Some(1L)) === 1L)
      val fb = table.writeDataFiles(
        Seq((10L, "b1"), (11L, "b2")).toDF("k", "v"))
      assert(table.commit(fb, Nil, Some(2L)) === 2L)
      // source spans [2, 20]: file B's envelope intersects the range
      // (it is a CANDIDATE) but carries no source key — the semi-scan
      // must leave it untouched
      val src = Seq(("S2", 2L), ("S20", 20L)).toDF("v", "k") // reordered
      val vm = table.merge(spark, src, "k", txn = Some(7L))
      assert(vm === Some(3L), "one atomic entry for the whole merge")
      def rows() = table.snapshot(spark).get.collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
      assert(rows() === Set((1L, "a1"), (2L, "S2"), (10L, "b1"),
        (11L, "b2"), (20L, "S20")),
        "matched key replaced, unmatched inserted, rest intact")
      val liveNow = table.liveFiles().toSet
      assert(liveNow.contains(fb.head),
        "a candidate file with no actual key match keeps its name")
      assert(!fa.exists(liveNow), "the matched file was rewritten")
      // the replayed CDC batch answers off the txn record
      assert(table.merge(spark, src, "k", txn = Some(7L)).isEmpty)
      assert(rows().contains((2L, "S2")))
      // time travel below the merge shows the pre-image
      assert(table.snapshot(spark, 2L).get.count() === 4L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("optimize compacts the live files into one atomic rewrite; a " +
      "racer's data commit aborts a stale compaction") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      (1 to 3).foreach { i =>
        val f = table.writeDataFiles(Seq((i, s"v$i")).toDF("k", "v"))
        assert(table.commit(f, Nil, Some(i.toLong)) === i.toLong)
      }
      assert(table.liveFiles().size === 3)
      val vOpt = table.optimize(spark)
      assert(vOpt === Some(4L), s"compaction commits as one entry, got $vOpt")
      assert(table.liveFiles().size === 1, "three files packed into one")
      def rows(v: Long = Long.MaxValue) = table.snapshot(spark, v).get
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(rows() === Set((1, "v1"), (2, "v2"), (3, "v3")),
        "a layout move never changes values")
      assert(rows(3L) === rows(), "pre-optimize time travel intact")
      // idempotence: a single live file is already optimal
      assert(table.optimize(spark).isEmpty)
      // abort path: a racer lands a DATA commit between the stale
      // optimize's snapshot read and its publish — the compaction must
      // abort, not resurrect the racer-removed state
      var racerDone = false
      val racing = new graft.sources.LogPublisher {
        def publish(d: java.nio.file.Path, name: String,
            content: Array[Byte]): Unit = {
          if (!racerDone) {
            racerDone = true
            val racer = new TxLogTable(dir)
            val rf = racer.writeDataFiles(Seq((4, "v4")).toDF("k", "v"))
            racer.commit(rf, Nil, Some(99L))
            throw new java.nio.file.FileAlreadyExistsException(name)
          }
          graft.sources.LogPublisher.HardLink.publish(d, name, content)
        }
      }
      val t2 = new TxLogTable(dir, racing)
      // make the table multi-file again so optimize has work
      val f5 = t2.writeDataFiles(Seq((5, "v5")).toDF("k", "v"))
      // (pre-seed before the racy publisher fires: commit f5 through a
      // clean handle so only the optimize hits the race)
      assert(new TxLogTable(dir).commit(f5, Nil, Some(5L)) === 5L)
      assert(t2.optimize(spark).isEmpty,
        "a compaction racing a real data commit must abort")
      val after = new TxLogTable(dir)
      assert(after.txns().contains(99L), "the racer's commit survives")
      assert(after.snapshot(spark).get.count() === 5L,
        "aborted compaction leaves the table exactly as the racer left it")
      // the aborted rewrite is an orphan — vacuum reclaims it
      assert(after.vacuum(minAgeMs = 0L).nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("vacuum deletes crash orphans and below-retention files while " +
      "every retained snapshot stays readable") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(Seq((1, "a")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(0L)) === 1L)
      val f2 = table.writeDataFiles(Seq((1, "b")).toDF("k", "v"))
      assert(table.commit(f2, f1, Some(1L)) === 2L) // f1 removed at v2
      val orphan = table.writeDataFiles(Seq((9, "torn")).toDF("k", "v"))
      // age guard: nothing young is eligible at the default age
      assert(table.vacuum().isEmpty,
        "default min-age must protect possibly-in-flight files")
      // retain v1: f1 is reachable at v1, so only the orphan goes
      val d1 = table.vacuum(retainVersion = 1L, minAgeMs = 0L)
      assert(d1.toSet === orphan.toSet,
        s"retaining v1 must keep f1, got $d1")
      assert(table.snapshot(spark, version = 1L).get
        .collect().head.getString(1) === "a",
        "time travel within retention survives vacuum")
      // retain v2 (current): f1 is now unreachable and goes
      val d2 = table.vacuum(retainVersion = 2L, minAgeMs = 0L)
      assert(d2.toSet === f1.toSet)
      assert(table.snapshot(spark).get
        .collect().head.getString(1) === "b",
        "the current snapshot is untouched")
      // the data dir now holds exactly the live files
      val left = java.nio.file.Files.list(
        java.nio.file.Paths.get(dir, "data"))
      val names = try {
        val it = left.iterator()
        val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.result()
      } finally left.close()
      assert(names === f2.toSet)
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

  test("readVersion anchors the first publish: a racer committing a " +
      "LATER version inside the read→commit window forces the rebase " +
      "check instead of being silently built upon") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(Seq((1, "old")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      val f2 = table.writeDataFiles(Seq((2, "x")).toDF("k", "v"))
      assert(table.commit(f2, Nil, Some(2L)) === 2L)
      // a stale compactor reads at v2...
      val v0 = table.currentVersion()
      val live = table.liveFiles(v0)
      val rewrite = table.writeDataFiles(
        table.snapshot(spark, v0).get)
      // ...then a racer REPLACES f1 with f1' at v3, entirely between
      // the compactor's read and its commit call (the round-14 ADVICE
      // window: no same-version collision ever happens without the
      // readVersion anchor, because commit used to compute its first
      // attempt from currentVersion() at call time = v4)
      val racer = new TxLogTable(dir)
      val f1b = racer.writeDataFiles(Seq((1, "new")).toDF("k", "v"))
      assert(racer.commit(f1b, f1, Some(99L)) === 3L)
      // the anchored commit must collide at v3 and abort via rebase
      val v = table.commit(rewrite, live, txn = None, rebase = _ =>
        if (table.liveFiles() == live) Some((rewrite, live)) else None,
        readVersion = v0)
      assert(v === -1L, "stale compaction over a racer must abort")
      val rows = new TxLogTable(dir).snapshot(spark).get
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(rows === Set((1, "new"), (2, "x")),
        "the racer's replacement survives; the pre-racer rows are " +
        "not resurrected")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("optimizeZorder: the rewrite carries tight per-file envelopes " +
      "on BOTH dimensions and values survive the layout move") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      // 64×64 grid scattered across 4 commits in round-robin order —
      // every pre-optimize file spans the FULL range of both dims
      // (the no-skipping worst case)
      val all = for (i <- 0 until 4096) yield (i % 64, i / 64)
      (0 until 4).foreach { c =>
        val part = all.zipWithIndex.filter(_._2 % 4 == c).map(_._1)
        val f = table.writeDataFiles(part.toDF("x", "y"))
        assert(table.commit(f, Nil, Some(c.toLong)) === c + 1L)
      }
      val dataDir = java.nio.file.Paths.get(dir, "data")
      def envelopes(files: Seq[String]): Seq[(Int, Int)] = files.map { f =>
        val r = spark.read.parquet(dataDir.resolve(f).toString)
          .selectExpr("max(x) - min(x)", "max(y) - min(y)").head()
        (r.getInt(0), r.getInt(1))
      }
      envelopes(table.liveFiles()).foreach { case (ex, ey) =>
        // each round-robin slice holds x ∈ {c, c+4, …, 60+c} (range
        // 60) and the full y range — no dimension is clustered
        assert(ex === 60 && ey === 63,
          "scattered commits must span (nearly) the full grid")
      }
      val v = table.optimizeZorder(spark, "x", "y", nFiles = 4)
      assert(v === Some(5L))
      val liveNow = table.liveFiles()
      assert(liveNow.size === 4)
      // four z-ranges of a 64×64 grid are the four 32×32 quadrants:
      // each file's envelope must be quadrant-tight on BOTH dims —
      // the property a linear sort cannot give (x-sorted files would
      // still span y 0..63)
      envelopes(liveNow).foreach { case (ex, ey) =>
        assert(ex <= 32 && ey <= 32,
          s"z-clustered file spans ($ex, $ey) — not quadrant-tight")
      }
      val rows = table.snapshot(spark).get
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(rows === all.toSet, "a layout move never changes values")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("snapshotWhere: footer-envelope file skipping returns exactly " +
      "the unpruned rows under the predicate, and the zordered layout " +
      "opens strictly fewer files than a linear sort on a quadrant " +
      "query") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val all = for (i <- 0 until 4096) yield (i % 64, i / 64)
      // LINEAR layout: 4 commits, each an x-slice sorted by x — tight
      // x envelopes, but every file spans the full y range
      (0 until 4).foreach { c =>
        val part = all.filter(p => p._1 / 16 == c)
        val f = table.writeDataFiles(part.toDF("x", "y").orderBy("x"))
        assert(table.commit(f, Nil, Some(c.toLong)) === c + 1L)
      }
      // quadrant query: x in the low half AND y in the low half
      val q = Seq(("x", 0L, 31L), ("y", 0L, 31L))
      def filtered(df: org.apache.spark.sql.DataFrame) = df
        .where("x between 0 and 31 and y between 0 and 31")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val want = filtered(table.snapshot(spark).get)
      assert(want.size === 32 * 32)
      val (keptLin, totLin) = table.pruneLiveFiles(spark, q)
      // x envelopes prune the two high-x slices; y prunes nothing
      assert(totLin === 4 && keptLin.size === 2,
        s"linear layout must prune on x only, kept ${keptLin.size}")
      assert(filtered(table.snapshotWhere(spark, q).get) === want,
        "skipping must never change the filtered result")
      // ZORDER the same table: quadrant files give BOTH-dim envelopes
      assert(table.optimizeZorder(spark, "x", "y", nFiles = 4)
        === Some(5L))
      val (keptZ, totZ) = table.pruneLiveFiles(spark, q)
      assert(totZ === 4 && keptZ.size === 1,
        s"zordered quadrant query must open 1 of 4 files, got " +
          s"${keptZ.size}")
      assert(keptZ.size < keptLin.size,
        "the clustered layout must open strictly fewer files")
      assert(filtered(table.snapshotWhere(spark, q).get) === want,
        "skipping over the zordered layout must preserve the result")
      // a provably-empty range returns None (no file can match)
      assert(table.snapshotWhere(spark,
        Seq(("x", 1000L, 2000L))).isEmpty)
      // missing stats / unknown columns never prune (no false negative)
      val (keptU, _) = table.pruneLiveFiles(spark,
        Seq(("no_such_col", 0L, 0L)))
      assert(keptU.size === 4, "unknown column must keep every file")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("add-entry stats: the zorder commit records per-file envelopes " +
      "in the LOG, pruning prefers them over footers, and they survive " +
      "checkpoint compaction and removal") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir, checkpointInterval = 2)
      val all = for (i <- 0 until 4096) yield (i % 64, i / 64)
      val f0 = table.writeDataFiles(all.toDF("x", "y"))
      assert(table.commit(f0, Nil, Some(1L)) === 1L)
      // v2 = zorder rewrite → the entry must CARRY stats rows and, at
      // interval 2, a checkpoint folds them
      assert(table.optimizeZorder(spark, "x", "y", nFiles = 4)
        === Some(2L))
      val entry = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_txlog",
          f"${2L}%020d.json")), java.nio.charset.StandardCharsets.UTF_8)
      assert(entry.contains("\"stats\":["),
        s"zorder commit must embed stats, got $entry")
      // a FRESH instance (cold memo) folds checkpoint+log and sees
      // envelopes for all 4 files on both columns
      val reader = new TxLogTable(dir)
      val st = reader.fileStats()
      assert(st.size === 4 && st.values.forall(m =>
        m.contains("x") && m.contains("y")), s"stats fold broken: $st")
      // log stats are exact quadrant envelopes — a quadrant query
      // prunes to 1 of 4 WITHOUT any footer read being necessary;
      // prove precedence with a LYING commit: a file whose log stats
      // claim x ∈ [0,0] while its footer spans [0,63] must be PRUNED
      // for x ∈ [50,60] (the footer would keep it)
      val q = Seq(("x", 0L, 31L), ("y", 0L, 31L))
      assert(reader.pruneLiveFiles(spark, q)._1.size === 1)
      val liar = table.writeDataFiles(all.toDF("x", "y"))
      assert(table.commit(liar, Nil, Some(3L),
        stats = Map(liar.head -> Map("x" -> ((0L, 0L))))) === 3L)
      val reader2 = new TxLogTable(dir)
      val (kept, tot) = reader2.pruneLiveFiles(spark,
        Seq(("x", 50L, 60L)))
      assert(tot === 5 && !kept.contains(liar.head),
        "log stats must take precedence over the footer envelope")
      // a rewrite that REMOVES stats-carrying files drops their stats
      assert(table.optimize(spark).isDefined)
      val st2 = new TxLogTable(dir).fileStats()
      assert(st2.isEmpty,
        s"removed files must drop their envelopes, got $st2")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("optimizePacked: only the small-file tail is rewritten toward " +
      "the target size; a second run is a no-op") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      // one LARGE file (many rows) + three small ones
      val big = table.writeDataFiles(
        spark.range(200000).selectExpr("cast(id as int) k",
          "concat('v', cast(id as string)) v"))
      assert(table.commit(big, Nil, Some(1L)) === 1L)
      val smalls = (2 to 4).map { i =>
        val f = table.writeDataFiles(Seq((1000000 + i, s"s$i")).toDF("k", "v"))
        assert(table.commit(f, Nil, Some(i.toLong)) === i.toLong)
        f
      }
      val dataDir = java.nio.file.Paths.get(dir, "data")
      val bigBytes = java.nio.file.Files.size(dataDir.resolve(big.head))
      val target = bigBytes // smalls are well under; big is NOT < target
      val v = table.optimizePacked(spark, target)
      assert(v === Some(5L))
      val liveNow = table.liveFiles()
      assert(liveNow.contains(big.head),
        "an already-large file is never rewritten")
      assert(liveNow.size === 2,
        s"three small files pack into one, got $liveNow")
      assert(table.snapshot(spark).get.count() === 200003L,
        "a layout move never changes values")
      // second run: the packed file plus the big file have no
      // 2-file small tail left to merge
      assert(table.optimizePacked(spark, target).isEmpty,
        "a packed table is a no-op for the same target")
      // bins respect the target: two smalls that together exceed a
      // tiny target stay in separate bins (still a rewrite, but never
      // an over-target output)
      val smallBytes = java.nio.file.Files.size(
        dataDir.resolve(table.liveFiles().filterNot(_ == big.head).head))
      assert(smallBytes < target)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("a retention-gapped version THROWS instead of answering from a " +
      "stale checkpoint; vacuum sweeps stranded _txlog temp files") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir,
        graft.sources.LogPublisher.HardLink, checkpointInterval = 3)
      val files = (1 to 7).map { i =>
        val f = table.writeDataFiles(Seq((i, s"v$i")).toDF("k", "v"))
        val prev = if (i == 1) Nil else table.liveFiles()
        assert(table.commit(f, prev, Some(i.toLong)) === i.toLong)
        f
      }
      val logDir = java.nio.file.Paths.get(dir, "_txlog")
      // retention-delete entries 1..6 (checkpoints at 3 and 6 survive)
      (1 to 6).foreach(v => java.nio.file.Files
        .delete(logDir.resolve(f"${v.toLong}%020d.json")))
      val cold = new TxLogTable(dir,
        graft.sources.LogPublisher.HardLink, checkpointInterval = 3)
      // versions a checkpoint serves exactly, and the current fold,
      // still work
      assert(cold.liveFiles(6L) === files(5))
      assert(cold.liveFiles() === files(6))
      // v4 needs entry 4 past the v3 checkpoint — gone: must THROW,
      // not answer with v3's state (round-14 ADVICE: Delta raises
      // VersionNotFound for the same gap)
      val e = intercept[IllegalStateException](cold.liveFiles(4L))
      assert(e.getMessage.contains("not reconstructible"))
      // stranded checkpoint/pointer temp files (a crash between
      // createTempFile and the atomic move) are vacuumed with the
      // same age guard as data files
      val strand1 = java.nio.file.Files
        .createTempFile(logDir, ".ckpt-", ".tmp")
      val strand2 = java.nio.file.Files
        .createTempFile(logDir, ".ptr-", ".tmp")
      assert(cold.vacuum().isEmpty && java.nio.file.Files.exists(strand1),
        "young temp files are protected by the age guard")
      cold.vacuum(minAgeMs = 0L)
      assert(!java.nio.file.Files.exists(strand1)
        && !java.nio.file.Files.exists(strand2),
        "aged log-dir temp files are swept")
      assert(cold.liveFiles() === files(6), "the log itself is intact")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("TIMESTAMP AS OF: commit timestamps are recorded in the entry " +
      "body, monotone, replay-stable; versionAt resolves every read " +
      "face and a pre-first-commit timestamp throws (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(Seq((1, "old")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      val f2 = table.writeDataFiles(Seq((2, "new")).toDF("k", "v"))
      assert(table.commit(f2, Nil, Some(2L)) === 2L)
      val t1 = table.commitTimestamp(1L).get
      val t2 = table.commitTimestamp(2L).get
      assert(t2 > t1, "commit timestamps are strictly monotone")
      // resolution: at t1 exactly → v1 (t2 > t1 by monotonicity);
      // at t2 and far future → v2
      assert(table.versionAt(t1) === 1L)
      assert(table.versionAt(t2) === 2L)
      assert(table.versionAt(t2 + 3600L * 1000) === 2L)
      assert(table.snapshotAt(spark, t1).get.collect()
        .map(_.getString(1)).toSeq === Seq("old"),
        "the between-commits instant reads the OLD snapshot")
      assert(table.snapshotAt(spark, t2).get.count() === 2L)
      val e = intercept[IllegalArgumentException](
        table.versionAt(t1 - 1L))
      assert(e.getMessage.contains("predates"),
        "a pre-first-commit timestamp must fail loudly")
      // replay-stable: a COPIED log (new directory, fresh instance)
      // resolves identically — the timestamp lives in the entry body,
      // not in file mtimes
      val dir2 = tmp()
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(dir), new java.io.File(dir2))
      val restored = new TxLogTable(dir2)
      assert(restored.commitTimestamp(1L) === Some(t1)
        && restored.versionAt(t1) === 1L,
        "a restored log keeps its history")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir2))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("schema evolution: ALTER ADD COLUMN is a metadata-only commit, " +
      "old files project with nulls, merges accept the widened batch, " +
      "and time travel below the ALTER shows the old schema (round 19)") {
    val dir = tmp()
    try {
      // interval 2: the ALTER at v2 forces a checkpoint, so the
      // fresh-instance fold below proves the schema survives
      // checkpoint compaction too
      val table = new TxLogTable(dir, checkpointInterval = 2)
      val f1 = table.writeDataFiles(Seq((1, "a"), (2, "b")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      // epoch 2: widen — no data movement (liveFiles unchanged)
      assert(table.alterAddColumn(spark, "score BIGINT") === Some(2L))
      assert(table.liveFiles() === f1, "ALTER moves no data")
      assert(table.tableSchema().get.fieldNames.toSeq
        === Seq("k", "v", "score"))
      val snap = table.snapshot(spark).get
      assert(snap.columns.toSeq === Seq("k", "v", "score"))
      assert(snap.collect().forall(_.isNullAt(2)),
        "pre-ALTER files read as null in the new column")
      // a same-name re-ALTER fails loudly
      intercept[IllegalArgumentException](
        table.alterAddColumn(spark, "score BIGINT"))
      // the widened batch now merges (update k=2, insert k=3)
      import s.implicits._
      val batch = Seq((2, "b2", 20L), (3, "c", 30L))
        .toDF("k", "v", "score")
      assert(table.merge(spark, batch, "k", txn = Some(50L))
        === Some(3L))
      val rows = table.snapshot(spark).get.collect()
        .map(r => (r.getInt(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows === Set((1, "a", -1L), (2, "b2", 20L), (3, "c", 30L)),
        "two-epoch table: old rows null-filled, merged rows carry the " +
          "new column")
      // time travel below the ALTER: the old 2-column schema
      val old = table.snapshot(spark, 1L).get
      assert(old.columns.toSeq === Seq("k", "v"),
        "pre-ALTER versions keep their birth schema")
      assert(old.count() === 2L)
      // a fresh instance folds the schema through the v2 CHECKPOINT
      // (interval 2) plus the v3 entry — cold-start correctness
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        dir, "_txlog", f"${2L}%020d.checkpoint.json")),
        "the ALTER at v2 must have checkpointed")
      assert(new TxLogTable(dir).tableSchema().get.fieldNames.toSeq
        === Seq("k", "v", "score"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("merge schema guards: mistyped shared columns fail loudly " +
      "(r16 ADVICE), extra columns require evolveSchema=true, and an " +
      "evolving merge widens in the same atomic commit (round 19)") {
    val dir = tmp()
    try {
      import s.implicits._
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      // Int k vs the table's Long k: a divergent physical schema must
      // never reach a data file
      val mistyped = Seq((2, "b2")).toDF("k", "v")
      val e1 = intercept[IllegalArgumentException](
        table.merge(spark, mistyped, "k"))
      assert(e1.getMessage.contains("k: table bigint vs source int"))
      // extra column without the flag: loud
      val wide = Seq((2L, "b2", 0.5)).toDF("k", "v", "q")
      val e2 = intercept[IllegalArgumentException](
        table.merge(spark, wide, "k"))
      assert(e2.getMessage.contains("evolveSchema"))
      // with the flag: ONE commit both merges and widens
      assert(table.merge(spark, wide, "k", txn = Some(9L),
        evolveSchema = true) === Some(2L))
      assert(table.tableSchema().get.fieldNames.toSeq
        === Seq("k", "v", "q"))
      val rows = table.snapshot(spark).get.collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
      assert(rows === Set((1L, "a", -1.0), (2L, "b2", 0.5)))
      // a source missing a table column is never an implicit DROP
      val narrow = Seq((3L, "c")).toDF("k", "v")
      val e3 = intercept[IllegalArgumentException](
        table.merge(spark, narrow, "k"))
      assert(e3.getMessage.contains("lacks table columns"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("deleteWhere on a zordered table keeps BOTH clustering " +
      "columns' envelopes on rewritten files — quadrant skipping " +
      "stays tight across deletes (r16 verdict #6)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val all = for (i <- 0 until 4096) yield (i % 64, i / 64)
      val f0 = table.writeDataFiles(all.toDF("x", "y"))
      assert(table.commit(f0, Nil, Some(1L)) === 1L)
      assert(table.optimizeZorder(spark, "x", "y", nFiles = 4)
        === Some(2L))
      assert(table.pruneLiveFiles(spark,
        Seq(("x", 0L, 31L), ("y", 0L, 31L)))._1.size === 1)
      // delete on a predicate whose RANGES name only x — the rewrite
      // must still re-derive y's envelope for the rewritten files
      assert(table.deleteWhere(spark,
        col("x") === 3 && col("y") === 3,
        ranges = Seq(("x", 3L, 3L))).isDefined)
      val st = table.fileStats()
      assert(table.liveFiles().forall(f =>
        st.get(f).exists(m => m.contains("x") && m.contains("y"))),
        s"every live file must keep BOTH clustering envelopes: $st")
      val (kept, total) = table.pruneLiveFiles(spark,
        Seq(("x", 32L, 63L), ("y", 32L, 63L)))
      assert(total === 4 && kept.size === 1,
        s"quadrant skipping must stay 1-of-4 after the delete, " +
          s"got ${kept.size} of $total")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("bloomEnvelope rejects non-integral key columns — the probe " +
      "renders Long.toString, so a double column would false-negative " +
      "(r16 ADVICE)") {
    val dir = tmp()
    try {
      import s.implicits._
      val table = new TxLogTable(dir)
      val f = table.writeDataFiles(
        Seq((1L, 42.0), (2L, 7.5)).toDF("k", "d"))
      assert(table.commit(f, Nil, Some(1L)) === 1L)
      // integral key: fine
      val (m, words) = table.bloomEnvelope(spark, f.head, "k")
      assert(m >= 64L && words.nonEmpty)
      // double key: 42.0 would hash "42.0" writer-side vs "42" at the
      // probe — reject at build time
      val e = intercept[IllegalArgumentException](
        table.bloomEnvelope(spark, f.head, "d"))
      assert(e.getMessage.contains("integral"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("ivfDeleteStored: GDPR erasure from the streamed ANN index — " +
      "delete-then-probe equals rebuild-without-deleted, candidates " +
      "prune per-value off the ingest blooms, and the rewrite keeps " +
      "the probe file-tight (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val emb = Tables.embeddings(spark, sfDir)
      val cents = graft.operators.KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), 16)
      val sink = StreamingOps.ivfIngestSink(table, cents)
      sink(emb.filter(col("vec_id") % 2 === 0), 0L)
      sink(emb.filter(col("vec_id") % 2 === 1), 1L)
      val liveBefore = table.liveFiles().toSet
      // erase two vectors NOT in the query set
      val doomed = Seq(11L, 24L)
      assert(StreamingOps.ivfDeleteStored(spark, table, doomed,
        txn = Some(77L)).nonEmpty)
      // bloom-aware candidate pruning: only the owning files were
      // rewritten — every other file keeps its NAME (byte-identical)
      val liveAfter = table.liveFiles().toSet
      val untouched = liveBefore.intersect(liveAfter)
      assert(liveBefore.size - untouched.size <= doomed.size,
        s"at most one rewrite per doomed vector's owning file: " +
          s"${liveBefore.size - untouched.size} files rewritten")
      // delete-then-probe ≡ rebuild-without-deleted, row for row
      val q = emb.filter(col("vec_id") < 5)
      val (gotOpt, kept, live) =
        StreamingOps.ivfProbeStored(spark, table, q, cents, k = 3)
      val want = graft.operators.Similarity.ivfTopK(
        emb.filter(!col("vec_id").isin(doomed: _*)), q, cents, k = 3)
        .collect().map(_.toString).sorted.toSeq
      assert(gotOpt.get.collect().map(_.toString).sorted.toSeq === want,
        "the erased vectors must vanish from probe results exactly")
      assert(kept < live, "the probe stays file-tight after the delete")
      // the rewrite auto-carried fresh vec_id blooms: a deleted id is
      // provably absent, a surviving id still point-prunes
      assert(table.snapshotWherePoint(spark, "vec_id", 11L)._2 === 0,
        "deleted id must be bloom-absent after the rewrite")
      val (dfS, keptS, liveS) =
        table.snapshotWherePoint(spark, "vec_id", 13L)
      assert(keptS < liveS && dfS.get
        .filter(col("vec_id") === 13L).count() === 1L,
        "a surviving id still opens a bloom-pruned file subset")
      // replayed erasure is answered by the txn record
      assert(StreamingOps.ivfDeleteStored(spark, table, doomed,
        txn = Some(77L)).isEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("TxLogStore key blooms: readPoint opens exactly the owning " +
      "file within a bucket (r16 verdict #5)") {
    val dir = tmp()
    try {
      val store = new TxLogStore(dir,
        graft.sources.LogPublisher.HardLink,
        keyBloomCol = Some("user_id"))
      val table = new TxLogTable(dir)
      val sink = StreamingOps.upsertSink(store, nBuckets = 4)
      // two batches, four buckets → four bucket-aligned files whose
      // user_id RANGES interleave (1..8 spread over buckets 0..3), so
      // only the bloom separates them
      sink((1L to 8L).map(u =>
          (u, ts(u.toInt), "view", u.toDouble, 100L + u))
        .toDF("user_id", "ts", "event_type", "value", "event_id"), 0L)
      sink(Seq((2L, ts(30), "click", 9.0, 200L))
        .toDF("user_id", "ts", "event_type", "value", "event_id"), 1L)
      val (dfOpt, kept, live) = store.readPoint(spark, 3L)
      assert(live >= 4, s"bucket-aligned layout expected, live=$live")
      assert(kept === 1,
        s"point read must open exactly the owning file, opened $kept")
      assert(dfOpt.get.count() === 1L)
      // the updated key reads its LATEST state through the point face
      val (df2, kept2, _) = store.readPoint(spark, 2L)
      assert(kept2 === 1 && df2.get.collect().head
        .getAs[String]("event_type") === "click",
        "the point read sees the merged latest state")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("RESTORE: rollback-by-commit re-adds the target's files, " +
      "stats and schema; history stays travelable; a vacuumed target " +
      "throws; a replayed restore is a no-op (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L), stats = f1.map(f =>
        f -> Map("k" -> (1L, 3L))).toMap) === 1L)
      // v2: bad delete (the fat-finger restore exists to undo)
      assert(table.deleteWhere(spark, col("v") =!= "c",
        ranges = Nil).contains(2L))
      assert(table.snapshot(spark).get.count() === 1L)
      // v3: ALTER (so the restore below also narrows the schema back)
      assert(table.alterAddColumn(spark, "extra BIGINT")
        .contains(3L))
      // v4: RESTORE to v1 — content, stats, and schema all back
      assert(table.restore(spark, 1L, txn = Some(700L))
        .contains(4L))
      assert(table.snapshot(spark).get.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
        === Set((1L, "a"), (2L, "b"), (3L, "c")))
      assert(table.tableSchema().get.fieldNames.toSeq === Seq("k", "v"),
        "restore below the ALTER narrows tableSchema back")
      assert(f1.forall(f => table.fileStats().get(f)
          .exists(_.contains("k"))),
        "re-added files carry their envelopes again (the fold drops " +
          "them with the remove, the restore entry must bring them back)")
      // history intact: the bad version is still time-travelable
      assert(table.snapshot(spark, 2L).get.count() === 1L)
      // a replayed restore (same txn) and a no-change restore no-op
      assert(table.restore(spark, 1L, txn = Some(700L)).isEmpty)
      assert(table.restore(spark, 4L).isEmpty,
        "restoring to the current state is a no-op")
      // vacuum the bad epoch's rewrite, then try restoring INTO it
      assert(table.vacuum(retainVersion = 4L, minAgeMs = 0L).nonEmpty)
      val e = intercept[IllegalStateException](table.restore(spark, 2L))
      assert(e.getMessage.contains("vacuumed"),
        s"a reclaimed target must fail loudly, got: ${e.getMessage}")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("tableChanges: row-level CDC between versions reads ONLY the " +
      "churn's files — inserts, deletes, and update pairs exact; " +
      "untouched files never enter the plan (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      // 3 single-key files so a 1-key merge touches exactly 1 of 3
      val fs = (1L to 3L).flatMap(k => table.writeDataFiles(
        Seq((k, s"v$k")).toDF("k", "v")))
      assert(table.commit(fs, Nil, Some(1L), stats = fs.zipWithIndex
        .map { case (f, i) =>
          f -> Map("k" -> ((i + 1).toLong, (i + 1).toLong)) }
        .toMap) === 1L)
      // v2: update k=2, insert k=4 (one merge — one rewrite + one add)
      assert(table.merge(spark,
        Seq((2L, "v2new"), (4L, "v4")).toDF("k", "v"), "k",
        txn = Some(9L)).contains(2L))
      val ch = table.tableChanges(spark, 1L, 2L).get
      val got = ch.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2))).toSet
      assert(got === Set((2L, "v2", "delete"), (2L, "v2new", "insert"),
          (4L, "v4", "insert")),
        s"update = delete + insert, insert alone for the new key: $got")
      // churn-proportional: the plan reads only the symmetric
      // difference of the live sets — k=1 and k=3's files never
      // appear among the scan's input files
      val touched = (table.liveFiles(1L).toSet -- table.liveFiles(2L))
        .union(table.liveFiles(2L).toSet -- table.liveFiles(1L))
      val scanned = ch.inputFiles.map(u =>
        u.substring(u.lastIndexOf('/') + 1)).toSet
      assert(scanned === touched.map(f =>
          f.substring(f.lastIndexOf('/') + 1)),
        s"CDC must scan exactly the churn: $scanned vs $touched")
      // no-change interval → None; degenerate interval → None
      assert(table.tableChanges(spark, 2L, 2L).isEmpty)
      intercept[IllegalArgumentException](
        table.tableChanges(spark, 2L, 1L))
      // v3: pure delete — CDC is deletes only
      assert(table.deleteWhere(spark, col("k") === 1L,
        ranges = Seq(("k", 1L, 1L))).contains(3L))
      val del = table.tableChanges(spark, 2L, 3L).get.collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(del === Set((1L, "delete")))
      // spanning interval composes: (1,3] = the merge + the delete
      val span = table.tableChanges(spark, 1L, 3L).get.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(span === Set((1L, "v1", "delete"), (2L, "v2", "delete"),
        (2L, "v2new", "insert"), (4L, "v4", "insert")))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("restore undoes a metadata-only ALTER: identical file sets, " +
      "schema narrows back (round-19 review fix — the no-op check " +
      "must see the schema delta, not just the file delta)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(Seq((1L, "a")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      assert(table.alterAddColumn(spark, "score BIGINT")
        .contains(2L))
      assert(table.restore(spark, 1L).contains(3L),
        "an ALTER-only rollback is a real commit, not a no-op")
      assert(table.tableSchema().get.fieldNames.toSeq === Seq("k", "v"))
      assert(table.snapshot(spark).get.columns.toSeq === Seq("k", "v"))
      assert(table.liveFiles() === f1, "no data moved either way")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("CDC fold survives schema evolution: applyChanges null-fills " +
      "the replica's missing columns exactly like the source table's " +
      "schema-on-read (round-19 review fix)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      assert(table.alterAddColumn(spark, "q BIGINT").contains(2L))
      assert(table.merge(spark,
        Seq((2L, "b2", 20L), (3L, "c", 30L)).toDF("k", "v", "q"),
        "k", txn = Some(3L)).contains(3L))
      var replica = table.snapshot(spark, 1L).get.limit(0)
      (0L until 3L).foreach { v =>
        table.tableChanges(spark, v, v + 1).foreach(ch =>
          replica = graft.sources.TxLogTable.applyChanges(replica, ch))
      }
      // the ALTER interval itself has no row churn (None); the
      // widening lands with the post-ALTER merge's change frame
      assert(replica.columns.toSeq === Seq("k", "v", "q"))
      assert(replica.collect().map(_.toString).sorted.toSeq
          === table.snapshot(spark).get.collect()
            .map(_.toString).sorted.toSeq,
        "the fold law holds across an evolving history")
      // and across a DROP: the replica is now WIDER than post-drop
      // change frames — applyChanges projects the dropped column
      // away, as the source's own reads do
      assert(table.alterDropColumn(spark, "q").contains(4L))
      assert(table.merge(spark, Seq((4L, "d")).toDF("k", "v"), "k",
        txn = Some(5L)).contains(5L))
      (3L until 5L).foreach { v =>
        table.tableChanges(spark, v, v + 1).foreach(ch =>
          replica = graft.sources.TxLogTable.applyChanges(replica, ch))
      }
      assert(replica.columns.toSeq === Seq("k", "v"))
      assert(replica.collect().map(_.toString).sorted.toSeq
          === table.snapshot(spark).get.collect()
            .map(_.toString).sorted.toSeq,
        "the fold law holds across a DROP too")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("ALTER DROP COLUMN is metadata-only with a tombstone: reads " +
      "narrow, time travel keeps the column, re-adding the name is " +
      "refused (no silent resurrection), restore legitimately " +
      "resurrects (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(
        Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "score"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      assert(table.alterDropColumn(spark, "score").contains(2L))
      assert(table.liveFiles() === f1, "DROP moves no data")
      val snap = table.snapshot(spark).get
      assert(snap.columns.toSeq === Seq("k", "v"),
        "reads project the narrowed schema")
      assert(snap.count() === 2L)
      // time travel below the drop still reads the column's values
      val old = table.snapshot(spark, 1L).get
      assert(old.columns.toSeq === Seq("k", "v", "score")
          && old.collect().map(_.getLong(2)).toSet === Set(10L, 20L))
      // resurrection refused on BOTH evolution faces — and CASE-
      // INSENSITIVELY: Spark's default parquet resolution would match
      // SCORE -> score, resurrecting just the same
      val e1 = intercept[IllegalArgumentException](
        table.alterAddColumn(spark, "score BIGINT"))
      assert(e1.getMessage.contains("resurrect"))
      val e1c = intercept[IllegalArgumentException](
        table.alterAddColumn(spark, "SCORE BIGINT"))
      assert(e1c.getMessage.contains("resurrect"))
      val e2 = intercept[IllegalArgumentException](table.merge(spark,
        Seq((3L, "c", 99L)).toDF("k", "v", "score"), "k",
        evolveSchema = true))
      assert(e2.getMessage.contains("resurrect"))
      // a FRESH name still evolves fine
      assert(table.merge(spark, Seq((3L, "c", 99L))
        .toDF("k", "v", "score2"), "k", txn = Some(5L),
        evolveSchema = true).contains(3L))
      // restore below the drop resurrects schema AND values — the
      // one legitimate path back, after which the name is droppable
      // again (it is in the CURRENT schema, hence not tombstoned)
      assert(table.restore(spark, 1L).contains(4L))
      val back = table.snapshot(spark).get
      assert(back.columns.toSeq === Seq("k", "v", "score")
          && back.collect().map(_.getLong(2)).toSet === Set(10L, 20L))
      assert(table.alterDropColumn(spark, "score").contains(5L))
      // dropping a non-column and the last column both fail loudly
      intercept[IllegalArgumentException](
        table.alterDropColumn(spark, "ghost"))
      assert(table.alterDropColumn(spark, "v").contains(6L))
      intercept[IllegalArgumentException](
        table.alterDropColumn(spark, "k"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("merge guards govern an EMPTIED evolved table: the log schema " +
      "outlives the last live file (round-19 review fix)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(Seq((1L, "a")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      assert(table.alterAddColumn(spark, "q BIGINT").contains(2L))
      assert(table.deleteWhere(spark, col("k") === 1L,
        ranges = Nil).contains(3L))
      assert(table.liveFiles().isEmpty, "the table is emptied")
      // mistyped and narrow batches still fail LOUDLY — the side
      // door the review caught: live.isEmpty used to skip every guard
      val e1 = intercept[IllegalArgumentException](table.merge(spark,
        Seq((1, "x", 1L)).toDF("k", "v", "q"), "k"))
      assert(e1.getMessage.contains("table bigint vs source int"))
      val e2 = intercept[IllegalArgumentException](table.merge(spark,
        Seq((1L, "x")).toDF("k", "v"), "k"))
      assert(e2.getMessage.contains("lacks table columns"))
      // a well-typed batch inserts and reads under the log schema
      assert(table.merge(spark,
        Seq((5L, "e", 50L)).toDF("k", "v", "q"), "k",
        txn = Some(9L)).contains(4L))
      assert(table.snapshot(spark).get.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        === Seq((5L, "e", 50L)))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("CDC fan-out: N independent followers at different paces " +
      "each converge to the source — follower lag never blocks the " +
      "writer or the other followers (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      // four commits: insert, merge-update, insert, delete
      assert(table.commit(table.writeDataFiles(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v")), Nil,
        Some(1L)) === 1L)
      assert(table.merge(spark, Seq((2L, "b2")).toDF("k", "v"), "k",
        txn = Some(2L)).contains(2L))
      assert(table.merge(spark, Seq((3L, "c")).toDF("k", "v"), "k",
        txn = Some(3L)).contains(3L))
      assert(table.deleteWhere(spark, col("k") === 1L,
        ranges = Nil).contains(4L))
      val want = table.snapshot(spark).get.collect()
        .map(_.toString).sorted.toSeq
      // follower A syncs every version; follower B once at the end;
      // follower C starts late (bootstrap from v2). Positions are
      // each follower's OWN state — the writer never waited, and no
      // follower's sync touched another's.
      val empty = table.snapshot(spark, 1L).get.limit(0)
      var a = empty
      (0L until 4L).foreach(v => table.tableChanges(spark, v, v + 1)
        .foreach(ch => a = TxLogTable.applyChanges(a, ch)))
      var b = empty
      table.tableChanges(spark, 0L, 4L)
        .foreach(ch => b = TxLogTable.applyChanges(b, ch))
      var c = table.snapshot(spark, 2L).get
      table.tableChanges(spark, 2L, 4L)
        .foreach(ch => c = TxLogTable.applyChanges(c, ch))
      for ((name, df) <- Seq("per-version" -> a, "one-shot" -> b,
          "late-bootstrap" -> c))
        assert(df.collect().map(_.toString).sorted.toSeq === want,
          s"follower $name must converge to the source snapshot")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("vector UPSERT composes from the lifecycle faces: delete + " +
      "re-ingest of a corrected embedding equals a from-scratch " +
      "index over the corrected corpus (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val emb = Tables.embeddings(spark, sfDir)
      val cents = graft.operators.KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        16)
      val sink = StreamingOps.ivfIngestSink(table, cents)
      sink(emb, 0L)
      // 'correct' vector 11: negate its embedding (a re-embedding
      // after a model fix — the real update-in-place ask)
      val corrected = emb.withColumn("embedding",
        when(col("vec_id") === 11L,
            org.apache.spark.sql.functions.transform(col("embedding"),
              x => -x))
          .otherwise(col("embedding")))
      assert(StreamingOps.ivfDeleteStored(spark, table, Seq(11L),
        txn = Some(1L)).nonEmpty)
      sink(corrected.filter(col("vec_id") === 11L), 2L)
      val q = emb.filter(col("vec_id") < 5)
      val got = StreamingOps.ivfProbeStored(spark, table, q, cents,
        k = 3)._1.get.collect().map(_.toString).sorted.toSeq
      val want = graft.operators.Similarity.ivfTopK(
        corrected, q, cents, k = 3)
        .collect().map(_.toString).sorted.toSeq
      assert(got === want,
        "delete + re-ingest must equal rebuild over the corrected " +
          "corpus — the UPSERT contract from the two lifecycle faces")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("spoolTail: spark.readStream tails the table through the " +
      "spool projection — commit-atomic arrival, checkpointed " +
      "incremental pickup, no retraction on delete, and hardlinks " +
      "survive vacuum (round 19)") {
    val dir = tmp()
    val spool = tmp()
    val ckpt = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      val v1 = table.spoolTail(spool)
      assert(v1 === 1L)
      val got = collection.mutable.ArrayBuffer.empty[(Long, String)]
      def drain(): Unit = {
        val q = spark.readStream
          .schema("k BIGINT, v STRING")
          .parquet(spool)
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame,
              _: Long) =>
            got ++= b.collect().map(r =>
              (r.getLong(0), r.getString(1))); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger
            .AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      assert(got.toSet === Set((1L, "a"), (2L, "b")),
        "the first drain reads exactly the committed rows")
      // a second commit arrives INCREMENTALLY (the stream checkpoint
      // tracks seen files — the second drain reads only the delta)
      val n1 = got.size
      val f2 = table.writeDataFiles(Seq((3L, "c")).toDF("k", "v"))
      assert(table.commit(f2, Nil, Some(2L)) === 2L)
      assert(table.spoolTail(spool, v1) === 2L)
      drain()
      assert(got.size === n1 + 1 && got.toSet.contains((3L, "c")),
        "incremental pickup: only the new commit's rows arrive")
      // delete does not retract (append-only arrival projection);
      // the rewrite's surviving-row file is a NEW arrival
      assert(table.deleteWhere(spark, col("k") === 1L,
        ranges = Nil).contains(3L))
      assert(table.spoolTail(spool, 2L) === 3L)
      drain()
      assert(got.count(_ == ((1L, "a"))) === 1,
        "no retraction of the deleted row")
      assert(got.count(_ == ((2L, "b"))) === 2,
        "the rewrite's surviving row re-arrives as a new file — " +
          "at-least-once on rewrites, the documented ignoreDeletes " +
          "trade; dedup downstream if the consumer needs it")
      // vacuum reclaims the rewritten ORIGINAL under data/ but the
      // spool's hardlink keeps the bytes: a fresh full read of the
      // spool still sees every arrival
      assert(table.vacuum(minAgeMs = 0L).nonEmpty)
      val reread = spark.read.schema("k BIGINT, v STRING")
        .parquet(spool).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(reread.count(_ == ((1L, "a"))) === 1,
        "vacuumed source bytes survive through the spool hardlink")
    } finally Seq(dir, spool, ckpt).foreach(d =>
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(d)))
  }

  test("tableChangesByVersion attributes every change to its commit " +
      "— version + timestamp columns, intermediate churn reported " +
      "even when the interval face nets it out (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(Seq((1L, "a")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      // v2 inserts k=2; v3 deletes it again — the interval face nets
      // this to nothing, the attribution face must report both
      assert(table.merge(spark, Seq((2L, "b")).toDF("k", "v"), "k",
        txn = Some(2L)).contains(2L))
      assert(table.deleteWhere(spark, col("k") === 2L,
        ranges = Seq(("k", 2L, 2L))).contains(3L))
      assert(table.tableChanges(spark, 1L, 3L).isEmpty,
        "netted-out churn: the interval face sees no difference")
      val by = table.tableChangesByVersion(spark, 1L, 3L).get.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      assert(by === Set((2L, "b", "insert", 2L),
          (2L, "b", "delete", 3L)),
        s"every intermediate change attributed to its version: $by")
      // timestamps ride along and match the log's records
      val ts = table.tableChangesByVersion(spark, 1L, 3L).get
        .select("_commit_version", "_commit_timestamp").distinct()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ts === Map(
        2L -> table.commitTimestamp(2L).get,
        3L -> table.commitTimestamp(3L).get))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("CDC composes: folding tableChanges from an empty replica " +
      "reproduces every snapshot — bootstrap is the v0->v1 changes, " +
      "each increment costs only its churn (round 19)") {
    val dir = tmp()
    try {
      val table = new TxLogTable(dir)
      val f1 = table.writeDataFiles(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      assert(table.commit(f1, Nil, Some(1L)) === 1L)
      assert(table.merge(spark,
        Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), "k",
        txn = Some(2L)).contains(2L))
      assert(table.deleteWhere(spark, col("k") === 1L,
        ranges = Nil).contains(3L))
      var replica = table.snapshot(spark).get.limit(0)
      (0L until 3L).foreach { v =>
        table.tableChanges(spark, v, v + 1).foreach(ch =>
          replica = graft.sources.TxLogTable.applyChanges(replica, ch))
        assert(replica.collect().map(_.toString).sorted.toSeq
            === table.snapshot(spark, v + 1).get.collect()
              .map(_.toString).sorted.toSeq,
          s"replica must equal snapshot(${v + 1}) — the CDC fold is " +
            "exactly replication")
      }
      assert(replica.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
        === Set((2L, "b2"), (3L, "c")))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
