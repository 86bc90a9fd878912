package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, conv, count, lit, md5, session_window, substring, when}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

class StreamingSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("nbScoreStream predictions are bit-identical to the batch scorer") {
    implicit val sq = spark.sqlContext
    // the REAL corpus at sf0.001: train the model on the batch split,
    // stream the held-out docs, compare per-document predictions
    val docsW = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        org.apache.spark.sql.functions.split(col("text"), "\\s+").as("w"))
    val batchPred = graft.queries.LearnPack.nbPredictions(docsW)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred"))
      .toMap
    val toksTrain = docsW.where(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("lang"),
        org.apache.spark.sql.functions.explode(col("w")).as("tok"))
    val (model, classStats) = graft.queries.LearnPack.nbModel(toksTrain)
    val classes = classStats.collect().map(r => (r.getAs[String]("cls"),
      r.getAs[Long]("cls_idx"), r.getAs[Long]("q_unseen"),
      r.getAs[Long]("prior_q"))).toSeq
    val testDocs = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 5 === 0)
      .select("doc_id", "text").collect()
      .map(r => (ts(0), r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingOps.nbScoreStream(
      in.toDF().toDF("ts", "doc_id", "text"), model, classes)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(testDocs.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("nb_stream").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
      assert(got.keySet === batchPred.keySet)
      assert(got === batchPred)
    } finally q.stop()
  }

  test("hllStream registers are bit-identical to the batch sketch and finalize") {
    implicit val sq = spark.sqlContext
    // window 0: users 1..120 (some twice), scrambled across two
    // triggers — the register merge is an order-free max, so the
    // emitted registers must EQUAL a batch build over the same rows.
    // The epoch-hour-aligned window boundary falls at minute 46:40 of
    // the test clock, so every event stays under minute 45
    val w0 = (1 to 120).map(u => Event(u, ts(u % 45), "view", 1.0)) ++
      (1 to 30).map(u => Event(u, ts(45), "view", 1.0))
    val scrambled = w0.sortBy(_.user_id % 7)
    val in = MemoryStream[Event]
    val q = StreamingOps.hllStream(in.toDF(), watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(scrambled.take(70))
      q.processAllAvailable()
      in.addData(scrambled.drop(70))
      q.processAllAvailable()
      // a far-future event closes window 0 (watermark past its end)
      in.addData(Event(999, ts(300), "view", 1.0))
      q.processAllAvailable()
      val emitted = spark.table("hll_stream").collect()
      assert(emitted.map(_.getAs[Timestamp]("ws")).distinct.length === 1,
        "all test events must land in one tumbling window")
      val got = emitted
        .map(r => r.getAs[Long]("idx") -> r.getAs[Int]("mr")).toMap
      val (idx, rk) = graft.functions.Hll.idxRank(col("user_id"))
      val batch = w0.toDF().select(idx.as("idx"), rk.as("rk"))
        .groupBy("idx").agg(org.apache.spark.sql.functions.max("rk").as("mr"))
      val want = batch.collect()
        .map(r => r.getAs[Long]("idx") -> r.getAs[Int]("mr")).toMap
      assert(got === want, "stream registers must equal the batch sketch")
      // shared finalize: the estimate lands near the true 120 distinct
      val est = graft.functions.Hll.estimate(
        spark.table("hll_stream").select("idx", "mr"), Seq.empty)
        .collect().head.getAs[Double]("n_est")
      assert(math.abs(est - 120.0) / 120.0 < 0.15, s"estimate $est vs 120")
    } finally q.stop()
  }

  test("qsketchStream registers equal the batch kernel build and clamp " +
      "out-of-frame values to the edges") {
    implicit val sq = spark.sqlContext
    // window 0: values 0.00 .. 119.00 scrambled across two triggers,
    // plus one value PAST the frame — the register merge is an
    // order-free add through the SHARED QSketch.bucket kernel, so the
    // emitted (register, count) rows must EQUAL a batch build over
    // the same rows against the same frame
    val (lo, hi) = (0L, 9999L) // centi-units: values 0.00 .. 99.99
    val w0 = (0 until 120).map(v => Event(v, ts(v % 45), "view",
      v.toDouble)) // values 100..119 are OUT of frame → clamp to b=63
    val scrambled = w0.sortBy(_.user_id % 7)
    val in = MemoryStream[Event]
    val q = StreamingOps.qsketchStream(in.toDF(),
        watermarkDelay = "2 hours", lo = lo, hi = hi)
      .writeStream.format("memory").queryName("qsketch_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(scrambled.take(70))
      q.processAllAvailable()
      in.addData(scrambled.drop(70))
      q.processAllAvailable()
      in.addData(Event(999, ts(300), "view", 1.0))
      q.processAllAvailable()
      val emitted = spark.table("qsketch_stream").collect()
      assert(emitted.map(_.getAs[Timestamp]("ws")).distinct.length === 1)
      val got = emitted
        .map(r => r.getAs[Long]("b") -> r.getAs[Long]("cb")).toMap
      val batch = w0.toDF()
        .select(org.apache.spark.sql.functions.floor(col("value") * 100)
            .cast("long").as("vq"),
          org.apache.spark.sql.functions.lit(lo).as("lo"),
          org.apache.spark.sql.functions.lit(hi).as("hi"))
        .select(graft.functions.QSketch.bucket.as("b"))
        .groupBy("b").count()
      val want = batch.collect()
        .map(r => r.getAs[Long]("b") -> r.getAs[Long]("count")).toMap
      assert(got === want, "stream registers must equal the batch build")
      // the 20 out-of-frame values (100.00..119.00 > 99.99) clamped
      // into the top register alongside the in-frame tail
      assert(got(63L) >= 20L, s"edge clamp missing: ${got.get(63L)}")
      // state is register-bounded
      assert(got.size <= graft.functions.QSketch.B)
    } finally q.stop()
  }

  test("qsketchStream registers finalize through the batch readout: " +
      "stream quantiles equal the batch sketch's") {
    implicit val sq = spark.sqlContext
    // fully in-frame data with the stream frame = the true min/max, so
    // the batch audit (which derives its frame from min/max) and the
    // stream (which receives it) read IDENTICAL quantiles — registers
    // compose and the readout is one shared fold
    val vals = (0 until 200).map(v => ((v * 37) % 100).toDouble)
    val w0 = vals.zipWithIndex.map { case (v, i) =>
      Event(i, ts(i % 45), "view", v) }
    val vq = vals.map(v => math.floor(v * 100).toLong)
    val (lo, hi) = (vq.min, vq.max)
    val in = MemoryStream[Event]
    val q = StreamingOps.qsketchStream(in.toDF(),
        watermarkDelay = "2 hours", lo = lo, hi = hi)
      .writeStream.format("memory").queryName("qsketch_ro")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(w0)
      q.processAllAvailable()
      in.addData(Event(999, ts(300), "view", 1.0))
      q.processAllAvailable()
      val regs = spark.table("qsketch_ro")
        .select(lit("w0").as("g"), col("b"), col("cb"))
      val frame = regs.groupBy("g")
        .agg(org.apache.spark.sql.functions.sum("cb").as("n"))
        .select(col("g"), lit(lo).as("lo"), lit(hi).as("hi"), col("n"))
      val streamEst = graft.queries.StatsPack
        .qsketchReadout(regs, frame, Seq(50, 90, 99))
        .collect().map(r => r.getAs[Int]("q") -> r.getAs[Long]("est_cq"))
        .toMap
      val batchEst = graft.queries.StatsPack.quantileSketchFrom(
          w0.map(e => ("w0", math.floor(e.value * 100).toLong))
            .toDF("g", "vq"))
        .collect().map(r => r.getAs[Int]("q") -> r.getAs[Long]("est_cq"))
        .toMap
      assert(streamEst === batchEst,
        s"stream readout $streamEst vs batch $batchEst")
    } finally q.stop()
  }

  test("hllStream restart: a checkpointed stream resumes the register state") {
    // the crash/redeploy path for the sketch faces: stop the query
    // with an OPEN window (registers live only in the state store),
    // start a NEW query on the same checkpoint, finish the window —
    // the emitted registers must equal a batch sketch over BOTH
    // batches' rows, proving the partial max-merge state survived
    val dir = java.nio.file.Files.createTempDirectory("graft_hllrs_").toString
    try {
      def evDF(rows: Seq[(Long, Long)]) = rows
        .toDF("user_id", "minute")
        .select(col("user_id"),
          org.apache.spark.sql.functions.timestamp_micros(
            lit(1700000000000000L) + col("minute") * 60000000L).as("ts"))
      val b1 = (1L to 60L).map(u => (u, u % 45))
      val b2 = (40L to 120L).map(u => (u, u % 45)) :+ (999L, 300L)
      // one FILE per batch: with maxFilesPerTrigger=1 a multi-part
      // write would let the closer row's part file advance the
      // watermark ahead of sibling parts, dropping their rows as late
      evDF(b1).coalesce(1).write.parquet(s"$dir/in/b1")
      val schema = evDF(b1).schema
      def startQuery() = StreamingOps.hllStream(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*"),
          watermarkDelay = "2 hours")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append()).start()
      val q1 = startQuery()
      try { q1.processAllAvailable() } finally q1.stop()
      // window still open: nothing emitted yet, state checkpointed
      evDF(b2).coalesce(1).write.parquet(s"$dir/in/b2")
      val q2 = startQuery()
      try { q2.processAllAvailable() } finally q2.stop()
      val got = spark.read.parquet(s"$dir/out")
        .filter(col("idx").isNotNull)
        .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Int]("mr"))
        .toMap
      val w0 = (b1 ++ b2).filter(_._2 < 45)
      val (idx, rk) = graft.functions.Hll.idxRank(col("user_id"))
      val want = evDF(w0).select(idx.as("idx"), rk.as("rk"))
        .groupBy("idx")
        .agg(org.apache.spark.sql.functions.max("rk").as("mr"))
        .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Int]("mr"))
        .toMap
      assert(got === want,
        "registers after restart must equal the batch sketch over both batches")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("cmsStream restart: a checkpointed stream resumes the cell counts") {
    // the count-sketch mirror of the hllStream restart case: counts
    // (unlike maxes) would VISIBLY double on a replay, so recovery
    // also proves exactly-once batch accounting across the restart
    val dir = java.nio.file.Files.createTempDirectory("graft_cmsrs_").toString
    try {
      def evDF(rows: Seq[(Long, String)]) = rows
        .toDF("minute", "text")
        .select(org.apache.spark.sql.functions.timestamp_micros(
          lit(1700000000000000L) + col("minute") * 60000000L).as("ts"),
          col("text"))
      val b1 = (0 until 20).map(i => (i.toLong % 45, s"alpha tok${i % 7}"))
      val b2 = (20 until 40).map(i => (i.toLong % 45, s"alpha tok${i % 7}")) :+
        (300L, "closer")
      evDF(b1).coalesce(1).write.parquet(s"$dir/in/b1")
      val schema = evDF(b1).schema
      def startQuery() = StreamingOps.cmsStream(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*"),
          watermarkDelay = "2 hours")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append()).start()
      val q1 = startQuery()
      try { q1.processAllAvailable() } finally q1.stop()
      evDF(b2).coalesce(1).write.parquet(s"$dir/in/b2")
      val q2 = startQuery()
      try { q2.processAllAvailable() } finally q2.stop()
      val got = spark.read.parquet(s"$dir/out").collect()
        .map(r => (r.getAs[Int]("dd"), r.getAs[Long]("bkt")) ->
          r.getAs[Long]("cell")).toMap
      val toks = evDF((b1 ++ b2).filter(_._1 < 45))
        .select(org.apache.spark.sql.functions.explode(
          graft.functions.TextFunctions.words(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      val want = toks
        .select(graft.functions.Cms.cells(col("tok")).as("e"))
        .groupBy(col("e.dd").as("dd"), col("e.bkt").as("bkt"))
        .agg(count(lit(1)).as("cell")).collect()
        .map(r => (r.getAs[Int]("dd"), r.getAs[Long]("bkt")) ->
          r.getAs[Long]("cell")).toMap
      assert(got === want,
        "cells after restart must equal the batch sketch — no double count")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("cmsStream cells are bit-identical to the batch sketch and never undercount") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.{explode, sum => fsum}
    val texts = (0 until 40).map { i =>
      (ts(i % 45), s"alpha beta${i % 5} gamma${i % 3} alpha")
    }
    val scrambled = texts.sortBy(_._2.length % 3)
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.cmsStream(in.toDF().toDF("ts", "text"),
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(scrambled.take(17))
      q.processAllAvailable()
      in.addData(scrambled.drop(17))
      q.processAllAvailable()
      in.addData((ts(300), "closer"))
      q.processAllAvailable()
      val got = spark.table("cms_stream").collect()
        .map(r => (r.getAs[Int]("dd"), r.getAs[Long]("bkt")) ->
          r.getAs[Long]("cell")).toMap
      val toks = texts.toDF("ts", "text")
        .select(explode(graft.functions.TextFunctions.words(col("text")))
          .as("tok"))
        .filter(col("tok") =!= "")
      val want = toks
        .select(graft.functions.Cms.cells(col("tok")).as("e"))
        .groupBy(col("e.dd").as("dd"), col("e.bkt").as("bkt"))
        .agg(count(lit(1)).as("cell")).collect()
        .map(r => (r.getAs[Int]("dd"), r.getAs[Long]("bkt")) ->
          r.getAs[Long]("cell")).toMap
      assert(got === want, "stream cells must equal the batch sketch")
      // the CMS invariant on a point query: min over rows >= true count
      val trueAlpha = 80L // "alpha" appears twice in each of 40 docs
      val est = (1 to graft.functions.Cms.D).map { dd =>
        val b = toks.limit(1).select(
          graft.functions.Cms.bucket(dd, lit("alpha"))).collect().head
          .getLong(0)
        got((dd, b))
      }.min
      assert(est >= trueAlpha, s"CMS must never undercount: $est")
    } finally q.stop()
  }

  test("windowedAgg aggregates tumbling windows from a stream") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.windowedAgg(in.toDF())
      .writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Event(1, ts(0), "view", 1.0), Event(1, ts(10), "view", 2.0),
        Event(2, ts(70), "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("sum_value"))).toSet
      assert(rows === Set(("view", 2L, 3.0), ("click", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedAgg appends finalized windows to a parquet file sink") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val in = MemoryStream[Event]
    val q = StreamingOps.windowedAgg(in.toDF())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Event(1, ts(0), "view", 1.0), Event(1, ts(10), "view", 2.0))
      q.processAllAvailable()
      // second batch advances the watermark past hour 0 → window finalizes
      in.addData(Event(2, ts(180), "click", 5.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/out")
        .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("sum_value")))
      assert(rows.toSet === Set(("view", 2L, 3.0)))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("incrementalDedupSink: later batches dedup against the persisted corpus") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_").toString
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF().toDF("doc_id", "lang", "text")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(StreamingOps.incrementalDedupSink(s"$dir/corpus"))
      .start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      // batch 1: two distinct docs + an exact within-batch dup of doc 1
      in.addData((1L, "en", base), (2L, "en", "completely different words here entirely"),
        (5L, "en", base))
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(s"$dir/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(afterB1 === Set(1L, 2L), "within-batch exact dup must keep min id")
      // batch 2: an exact dup of doc 1, a near-dup of doc 1 (one word
      // changed, same length block), and a novel doc
      in.addData((10L, "en", base),
        (11L, "en", base.replace("dog", "cat")),
        (12L, "en", "fresh novel content that matches nothing prior at all"))
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(s"$dir/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(afterB2 === Set(1L, 2L, 12L),
        "corpus dups (exact + near) must drop; novel docs must append")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("incrementalDedupSink replay: the same batch twice leaves the corpus unchanged") {
    // a crash between the sink's append and the offset commit makes the
    // engine re-invoke foreachBatch with the SAME batch — at-least-once.
    // The dedup semantics must make that replay a no-op: the replayed
    // docs probe the corpus, find themselves, and drop.
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_").toString
    try {
      val sink = StreamingOps.incrementalDedupSink(s"$dir/corpus")
      val base = "the quick brown fox jumps over the lazy dog again and again"
      val b1 = Seq((1L, "en", base),
        (2L, "en", "completely different words here entirely"))
        .toDF("doc_id", "lang", "text")
      sink(b1, 0L)
      def snapshot() = spark.read.parquet(s"$dir/corpus")
        .collect().map(_.toString).sorted.toSeq
      val afterFirst = snapshot()
      assert(afterFirst.size === 2)
      sink(b1, 0L) // the replay
      assert(snapshot() === afterFirst,
        "replaying a committed batch must not append duplicate rows")
      // and the loop keeps working after the replay: novel still lands
      sink(Seq((7L, "en", "fresh novel content matching nothing prior at all"))
        .toDF("doc_id", "lang", "text"), 1L)
      assert(spark.read.parquet(s"$dir/corpus")
        .select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 7L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("semanticDedupSink replay: the same batch twice leaves the corpus unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semreplay_").toString
    try {
      val emb = Tables.embeddings(spark, sfDir)
      val cents = graft.operators.KMeansND.seed(
        emb.select($"vec_id".as("id"), $"embedding".as("vec")), 8)
      def vec(id: Long): Array[Float] = emb.filter($"vec_id" === id)
        .select($"embedding").as[Array[Float]].head()
      val sink = StreamingOps.semanticDedupSink(s"$dir/corpus", cents, 0.8)
      val b1 = Seq((1L, vec(42)), (3L, vec(7).map(-_)))
        .toDF("vec_id", "embedding")
      sink(b1, 0L)
      def snapshot() = spark.read.parquet(s"$dir/corpus")
        .select("vec_id", "cell").collect().map(_.toString).sorted.toSeq
      val afterFirst = snapshot()
      assert(afterFirst.size === 2)
      sink(b1, 0L) // the replay: both vectors are their own semantic dups
      assert(snapshot() === afterFirst,
        "replaying a committed batch must not append duplicate vectors")
      sink(Seq((11L, vec(13))).toDF("vec_id", "embedding"), 1L)
      assert(spark.read.parquet(s"$dir/corpus")
        .select("vec_id").as[Long].collect().toSet === Set(1L, 3L, 11L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("incrementalDedupSink restart: a checkpointed stream resumes without dup appends") {
    // the weekly-restart path: stop the query, start a NEW query on the
    // same checkpoint — committed batches must not reprocess, and new
    // files must flow through the same corpus probe
    val dir = java.nio.file.Files.createTempDirectory("graft_restart_").toString
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      val schema = Seq((1L, "en", "x")).toDF("doc_id", "lang", "text").schema
      Seq((1L, "en", base), (2L, "en", "completely different words here entirely"))
        .toDF("doc_id", "lang", "text").write.parquet(s"$dir/in/b1")
      def startQuery() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(StreamingOps.incrementalDedupSink(s"$dir/corpus"))
        .start()
      val q1 = startQuery()
      try { q1.processAllAvailable() } finally q1.stop()
      assert(spark.read.parquet(s"$dir/corpus")
        .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
      // restart from the same checkpoint; drop in a dup of doc 1 + a novel doc
      Seq((10L, "en", base),
        (12L, "en", "fresh novel content that matches nothing prior at all"))
        .toDF("doc_id", "lang", "text").write.parquet(s"$dir/in/b2")
      val q2 = startQuery()
      try { q2.processAllAvailable() } finally q2.stop()
      val docs = spark.read.parquet(s"$dir/corpus")
        .select("doc_id").as[Long].collect().toSeq
      assert(docs.sorted === Seq(1L, 2L, 12L),
        s"restart must not re-append batch 1 nor admit the corpus dup, got $docs")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("upsertSink restart: a checkpointed stream resumes without re-merging") {
    // the weekly-restart path for the CDC state table: committed
    // batches must not re-merge (the event-time keep rule makes a
    // re-merge TODAY invisible, but the bid guard is what makes that
    // guaranteed rather than incidental), and post-restart batches
    // must keep merging by event time
    val dir = java.nio.file.Files.createTempDirectory("graft_upsrestart_").toString
    try {
      val schema = Seq((1L, ts(0), "view", 1.0, 1L))
        .toDF("user_id", "ts", "event_type", "value", "event_id").schema
      Seq((1L, ts(10), "click", 2.0, 11L), (2L, ts(20), "view", 3.0, 12L))
        .toDF("user_id", "ts", "event_type", "value", "event_id")
        .write.parquet(s"$dir/in/b1")
      def startQuery() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(StreamingOps.upsertSink(s"$dir/state", nBuckets = 4))
        .start()
      def state() = spark.read.parquet(s"$dir/state")
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
      val q1 = startQuery()
      try { q1.processAllAvailable() } finally q1.stop()
      assert(state() === Map(1L -> (("click", 2.0)), 2L -> (("view", 3.0))))
      // restart on the same checkpoint with a late (older) event for
      // user 2 and a genuinely newer one for user 1
      Seq((2L, ts(15), "error", 9.0, 13L), (1L, ts(60), "purchase", 8.0, 14L))
        .toDF("user_id", "ts", "event_type", "value", "event_id")
        .write.parquet(s"$dir/in/b2")
      val q2 = startQuery()
      try { q2.processAllAvailable() } finally q2.stop()
      assert(state() === Map(1L -> (("purchase", 8.0)), 2L -> (("view", 3.0))),
        s"restart must not re-merge batch 1; late data must not regress, " +
          s"new data must land, got ${state()}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("incrementalAggSink merges batches exactly-once, skips replays") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_").toString
    try {
      val in = MemoryStream[Event]
      val q = in.toDF()
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(StreamingOps.incrementalAggSink(s"$dir/summary"))
        .start()
      try {
        in.addData(
          Event(1, ts(0), "view", 2.0), Event(2, ts(1), "view", 4.0),
          Event(1, ts(2), "click", 10.0))
        q.processAllAvailable()
        in.addData(Event(3, ts(3), "view", 6.0), Event(3, ts(4), "purchase", 8.0))
        q.processAllAvailable()
      } finally q.stop()
      def summary() = StreamingOps.readState(spark, s"$dir/summary")
        .select("event_type", "n", "sv", "mn", "mx")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val merged = summary()
      // merged summary == direct aggregate over everything ever seen
      assert(merged === Map(
        "view" -> ((3L, 12.0, 2.0, 6.0)),
        "click" -> ((1L, 10.0, 10.0, 10.0)),
        "purchase" -> ((1L, 8.0, 8.0, 8.0))))
      // replay guard: re-delivering an already-merged batchId must not
      // double-count (merge arithmetic is not idempotent — this is the
      // bookkeeping that makes at-least-once delivery exactly-once)
      val sink = StreamingOps.incrementalAggSink(s"$dir/summary")
      sink(Seq(Event(3, ts(3), "view", 6.0), Event(3, ts(4), "purchase", 8.0))
        .toDS().toDF(), 1L)
      assert(summary() === merged, "replayed batch must be skipped")
      // and a genuinely new batch still merges
      sink(Seq(Event(9, ts(5), "view", 100.0)).toDS().toDF(), 2L)
      assert(summary()("view") === ((4L, 112.0, 2.0, 100.0)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("versioned state: a torn rewrite falls back to the committed " +
    "predecessor and the replay re-merges") {
    // the crash window a plain overwrite-in-place cannot survive: the
    // delete happened, the write didn't. In the versioned layout the
    // torn version has no _SUCCESS commit marker, so the reader ignores
    // it, the replayed batch re-merges from the intact predecessor, and
    // no history is lost — verified end-to-end here
    val dir = java.nio.file.Files.createTempDirectory("graft_torn_").toString
    try {
      import java.nio.file.{Files, Paths}
      val sink = StreamingOps.incrementalAggSink(s"$dir/s")
      def ev(u: Long, t: Int, v: Double) =
        Seq((u, ts(t), "view", v)).toDF("user_id", "ts", "event_type", "value")
      sink(ev(1, 0, 2.0), 0L)
      sink(ev(2, 1, 4.0), 1L)
      def summary() = StreamingOps.readState(spark, s"$dir/s")
        .select("n", "sv").head()
      assert(summary().getLong(0) === 2L && summary().getDouble(1) === 6.0)
      // simulate a crash mid-write of batch 2: version dir present,
      // truncated garbage inside, NO _SUCCESS marker
      val torn = Paths.get(s"$dir/s/v000000000002")
      Files.createDirectory(torn)
      Files.write(torn.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
      assert(summary().getLong(0) === 2L,
        "reader must ignore the uncommitted torn version")
      // the replayed batch must RE-MERGE (not skip on seeing v2, not
      // reseed from scratch) and commit a clean v2 over the torn one
      sink(ev(3, 2, 6.0), 2L)
      assert(summary().getLong(0) === 3L && summary().getDouble(1) === 12.0,
        "replay after a torn write must merge onto the intact predecessor")
      // a state root holding something other than version dirs must
      // fail loudly, never read as "no state" (silent reseed)
      val junk = java.nio.file.Files.createTempDirectory("graft_junk_")
      try {
        Files.write(junk.resolve("stray.parquet"), Array[Byte](1))
        intercept[IllegalArgumentException] {
          StreamingOps.latestVersionedState(spark, junk.toString)
        }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(junk.toFile)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("sinks survive an empty first trigger (no footerless state dir)") {
    // an empty batch 0 must leave NO state behind — otherwise the next
    // batch's corpus/state read fails schema inference on a dir with
    // no parquet footers
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_").toString
    try {
      val emptyEv = Seq.empty[(Long, Timestamp, String, Double, Long)]
        .toDF("user_id", "ts", "event_type", "value", "event_id")
      val ups = StreamingOps.upsertSink(s"$dir/ups", nBuckets = 4)
      ups(emptyEv, 0L)
      assert(!new java.io.File(s"$dir/ups").exists(),
        "an empty trigger must not create the state dir")
      ups(Seq((1L, ts(5), "view", 1.0, 10L))
        .toDF("user_id", "ts", "event_type", "value", "event_id"), 1L)
      assert(spark.read.parquet(s"$dir/ups").count() === 1L)

      val km = StreamingOps.kmeansSink(s"$dir/km", k = 2)
      km(Seq.empty[(Long, Double, Double)].toDF("id", "x", "y"), 0L)
      assert(!new java.io.File(s"$dir/km").exists())
      km(Seq((1L, 0.0, 0.0), (2L, 4.0, 0.0)).toDF("id", "x", "y"), 1L)
      assert(StreamingOps.readState(spark, s"$dir/km").count() === 2L)

      val agg = StreamingOps.incrementalAggSink(s"$dir/agg")
      agg(emptyEv.select("user_id", "ts", "event_type", "value"), 0L)
      assert(!new java.io.File(s"$dir/agg").exists())
      agg(Seq((1L, ts(5), "view", 1.0, 10L))
        .toDF("user_id", "ts", "event_type", "value", "event_id")
        .select("user_id", "ts", "event_type", "value"), 1L)
      assert(StreamingOps.readState(spark, s"$dir/agg").count() === 1L)

      val ded = StreamingOps.incrementalDedupSink(s"$dir/ded")
      ded(Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text"), 0L)
      assert(!new java.io.File(s"$dir/ded").exists())
      ded(Seq((1L, "en", "some novel words entirely here"))
        .toDF("doc_id", "lang", "text"), 1L)
      assert(spark.read.parquet(s"$dir/ded").count() === 1L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("upsertSink merges by event time into bucketed state, replays are skipped") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ups_").toString
    try {
      val in = MemoryStream[(Long, Timestamp, String, Double, Long)]
      val q = in.toDF().toDF("user_id", "ts", "event_type", "value", "event_id")
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(StreamingOps.upsertSink(s"$dir/state", nBuckets = 4))
        .start()
      def state() = spark.read.parquet(s"$dir/state")
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
      try {
        // batch 0: user 1 twice (later ts must win within the batch)
        in.addData((1L, ts(5), "view", 1.0, 10L), (1L, ts(10), "click", 2.0, 11L),
          (2L, ts(20), "view", 3.0, 12L))
        q.processAllAvailable()
        assert(state() === Map(1L -> (("click", 2.0)), 2L -> (("view", 3.0))))
        // batch 1: a LATE event for user 2 older than its state row
        // (must not regress), plus a new user
        in.addData((2L, ts(15), "error", 9.0, 13L), (3L, ts(30), "signup", 4.0, 14L))
        q.processAllAvailable()
        val s1 = state()
        assert(s1 === Map(1L -> (("click", 2.0)), 2L -> (("view", 3.0)),
          3L -> (("signup", 4.0))),
          s"event-time merge must keep user 2's newer state row, got $s1")
        // replay guard: re-delivering batch 1 changes nothing
        val sink = StreamingOps.upsertSink(s"$dir/state", nBuckets = 4)
        sink(Seq((2L, ts(15), "error", 9.0, 13L))
          .toDF("user_id", "ts", "event_type", "value", "event_id"), 1L)
        assert(state() === s1, "replayed batch must be skipped")
        // a genuinely newer event still updates
        sink(Seq((1L, ts(60), "purchase", 8.0, 15L))
          .toDF("user_id", "ts", "event_type", "value", "event_id"), 2L)
        assert(state()(1L) === (("purchase", 8.0)))
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("upsertSink store seam: a transactional-format adapter receives " +
    "the same MERGE dataflow") {
    // the three-method surface a Delta/Iceberg adapter implements
    // (SURVEY "Migration: transactional table formats") — prove the
    // sink drives it correctly with a commit-log-style in-memory store:
    // read(touched) → event-time merge → commit, replay answered from
    // the commit log alone
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    class MemStore extends StreamingOps.UpsertStateStore {
      var rows: Seq[Row] = Nil
      var schema: StructType = _
      var commitLog = Set.empty[Long] // the format's atomic commit record
      def read(sp: org.apache.spark.sql.SparkSession,
          touched: Seq[Int]): Option[org.apache.spark.sql.DataFrame] =
        if (rows.isEmpty) None
        else Some(sp.createDataFrame(sp.sparkContext.parallelize(rows), schema)
          .filter(col("bucket").isin(touched: _*)))
      def alreadyCommitted(sp: org.apache.spark.sql.SparkSession,
          touched: Seq[Int], batchId: Long): Boolean = commitLog.contains(batchId)
      def commit(merged: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val m = merged.localCheckpoint()
        schema = m.schema
        val touched = m.select("bucket").distinct().collect().map(_.getInt(0)).toSet
        rows = rows.filterNot(r => touched(r.getAs[Int]("bucket"))) ++ m.collect()
        commitLog += batchId
      }
    }
    val store = new MemStore
    val sink = StreamingOps.upsertSink(store, nBuckets = 4)
    def state() = rowsToMap(store.rows)
    def rowsToMap(rs: Seq[Row]) = rs.map(r => r.getAs[Long]("user_id") ->
      (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
    sink(Seq((1L, ts(5), "view", 1.0, 10L), (1L, ts(10), "click", 2.0, 11L),
      (2L, ts(20), "view", 3.0, 12L))
      .toDF("user_id", "ts", "event_type", "value", "event_id"), 0L)
    assert(state() === Map(1L -> (("click", 2.0)), 2L -> (("view", 3.0))))
    // late event must not regress; new user lands
    sink(Seq((2L, ts(15), "error", 9.0, 13L), (3L, ts(30), "signup", 4.0, 14L))
      .toDF("user_id", "ts", "event_type", "value", "event_id"), 1L)
    val s1 = state()
    assert(s1 === Map(1L -> (("click", 2.0)), 2L -> (("view", 3.0)),
      3L -> (("signup", 4.0))))
    // replay answered from the commit log — no state read needed
    sink(Seq((2L, ts(15), "error", 9.0, 13L))
      .toDF("user_id", "ts", "event_type", "value", "event_id"), 1L)
    assert(state() === s1, "commit-logged batch must be skipped")
    assert(store.commitLog === Set(0L, 1L))
  }

  test("kmeansSink fits online: centroids track the stream, replays are skipped") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_okm_").toString
    try {
      val in = MemoryStream[(Long, Double, Double)]
      val q = in.toDF().toDF("id", "x", "y")
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(StreamingOps.kmeansSink(s"$dir/cents", k = 2))
        .start()
      def state() = StreamingOps.readState(spark, s"$dir/cents")
        .collect().map(r => r.getAs[Int]("cid") ->
          (r.getAs[Double]("x"), r.getAs[Double]("y"), r.getAs[Long]("n"))).toMap
      try {
        // batch 0: two tight clusters around (0,0) and (10,10); seeds =
        // two lowest ids (one in each cluster by construction)
        in.addData((1L, 0.0, 0.0), (2L, 10.0, 10.0),
          (3L, 0.2, 0.0), (4L, 10.2, 10.0))
        q.processAllAvailable()
        val s0 = state()
        assert(s0.keySet === Set(0, 1) && s0.values.map(_._3).sum === 4L)
        assert(s0(0)._1 === 0.1 && s0(1)._1 === 10.1,
          s"each centroid must average its own cluster, got $s0")
        // batch 1: cluster 1 drifts toward (12, 10); cluster 0 sits out
        in.addData((5L, 12.0, 10.0), (6L, 12.0, 10.0))
        q.processAllAvailable()
        val s1 = state()
        assert(s1(0) === s0(0), "an unassigned centroid must not move")
        assert(s1(1)._1 > s0(1)._1 && s1(1)._1 < 12.0,
          s"the minibatch update must move centroid 1 toward the new " +
            s"mass but damp it by its running count, got ${s1(1)}")
        assert(s1(1)._3 === 4L)
        // replay guard: re-delivering batch 1 must not move anything —
        // the 1/(n+m) fold is not idempotent, the bid bookkeeping is
        val sink = StreamingOps.kmeansSink(s"$dir/cents", k = 2)
        sink(Seq((5L, 12.0, 10.0), (6L, 12.0, 10.0)).toDF("id", "x", "y"), 1L)
        assert(state() === s1, "replayed minibatch must be skipped")
        // and a genuinely new batch still folds in
        sink(Seq((7L, 0.4, 0.0)).toDF("id", "x", "y"), 2L)
        assert(state()(0)._3 === 3L)
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("kmeansSink restart: a checkpointed stream resumes without double-counting") {
    // restart on the same checkpoint replays the last batch to the
    // sink; the 1/(n+m) fold is NOT idempotent, so only the bid guard
    // keeps the centroid inertia correct across restarts
    val dir = java.nio.file.Files.createTempDirectory("graft_okmrestart_").toString
    try {
      val schema = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y").schema
      Seq((1L, 0.0, 0.0), (2L, 10.0, 10.0), (3L, 0.2, 0.0), (4L, 10.2, 10.0))
        .toDF("id", "x", "y").coalesce(1).write.parquet(s"$dir/in/b1")
      def startQuery() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(StreamingOps.kmeansSink(s"$dir/cents", k = 2))
        .start()
      def state() = StreamingOps.readState(spark, s"$dir/cents")
        .collect().map(r => r.getAs[Int]("cid") ->
          (r.getAs[Double]("x"), r.getAs[Long]("n"))).toMap
      val q1 = startQuery()
      try { q1.processAllAvailable() } finally q1.stop()
      val s1 = state()
      assert(s1(0) === ((0.1, 2L)) && s1(1) === ((10.1, 2L)))
      // restart; a new minibatch pulls centroid 1 with DAMPED weight —
      // correct only if batch 1 wasn't folded twice (n would be 4+2)
      Seq((5L, 12.0, 10.0), (6L, 12.0, 10.0))
        .toDF("id", "x", "y").coalesce(1).write.parquet(s"$dir/in/b2")
      val q2 = startQuery()
      try { q2.processAllAvailable() } finally q2.stop()
      val s2 = state()
      assert(s2(0) === s1(0), "untouched centroid must not move on restart")
      assert(s2(1) === ((11.05, 4L)),
        s"restart must fold batch 2 exactly once onto n=2 inertia " +
          s"((2*10.1+24)/4 = 11.05), got $s2")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("funnelStream emits ordered completions and evicts stale state") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.funnelStream(in.toDS(), horizonMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 completes across two batches; user 2 purchases with no
      // prior click (must NOT emit); user 3 views then goes stale
      in.addData(
        Event(1, ts(0), "view", 1.0), Event(1, ts(5), "click", 1.0),
        Event(2, ts(1), "view", 1.0), Event(2, ts(2), "purchase", 9.0),
        Event(3, ts(3), "view", 1.0))
      q.processAllAvailable()
      in.addData(Event(1, ts(10), "purchase", 5.0))
      q.processAllAvailable()
      // buffered-replay contract: nothing emits until the watermark
      // passes the events — the price of event-time determinism
      assert(spark.table("funnel_out").isEmpty,
        "completions must wait for the watermark, not arrival")
      // advance the watermark far past every event → user 1 completes,
      // users 2/3 (incomplete, horizon passed) evict
      in.addData(Event(9, ts(600), "view", 1.0))
      q.processAllAvailable()
      in.addData(Event(9, ts(610), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("funnel_out")
        .select("user_id").as[Long].collect().toSeq
      assert(rows === Seq(1L), "only the strictly-ordered funnel completes")
      val state = q.lastProgress.stateOperators(0).numRowsTotal
      assert(state <= 2,
        s"stale funnels must evict (state rows = $state; expect <= users 9+maybe1)")
    } finally q.stop()
  }

  test("transitionsStream pairs events in event-time order across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.transitionsStream(in.toDS())
      .writeStream.format("memory").queryName("trans_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      // the click ARRIVES a batch before the earlier-timestamped view —
      // arrival-order pairing would emit view→click backwards or not
      // at all; event-time buffering must produce view→click→purchase
      in.addData(Event(7, ts(5), "click", 1.0))
      q.processAllAvailable()
      in.addData(Event(7, ts(2), "view", 1.0), Event(7, ts(8), "purchase", 3.0))
      q.processAllAvailable()
      // ripen everything: watermark far past ts(8)
      in.addData(Event(99, ts(600), "view", 1.0))
      q.processAllAvailable()
      in.addData(Event(99, ts(610), "view", 1.0))
      q.processAllAvailable()
      def us(min: Long) = (1700000000000L + min * 60000L) * 1000L
      val rows = spark.table("trans_ooo").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("from_type"),
          r.getAs[String]("to_type"), r.getAs[Long]("to_us"))).sortBy(_._4)
      assert(rows.filter(_._1 == 7L).toSeq === Seq(
        (7L, "view", "click", us(5)), (7L, "click", "purchase", us(8))),
        s"pairs must follow event time, not arrival order, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("funnelStream replays cross-batch out-of-order events in event-time order") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      // the click ARRIVES a batch before its in-watermark view — a
      // fold-on-arrival machine would drop the funnel; event-time
      // buffering must still complete it
      in.addData(Event(7, ts(5), "click", 1.0))
      q.processAllAvailable()
      in.addData(Event(7, ts(2), "view", 1.0), Event(7, ts(8), "purchase", 3.0))
      q.processAllAvailable()
      // ripen everything: watermark past ts(8)
      in.addData(Event(99, ts(600), "view", 1.0))
      q.processAllAvailable()
      in.addData(Event(99, ts(610), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("funnel_ooo").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_us"),
          r.getAs[Long]("click_us"), r.getAs[Long]("purchase_us")))
      def us(min: Long) = (1700000000000L + min * 60000L) * 1000L
      assert(rows.toSeq === Seq((7L, us(2), us(5), us(8))),
        s"late-arriving view must still anchor the funnel, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("assignStream assigns a point stream to literal centroids, stateless") {
    implicit val sq = spark.sqlContext
    import graft.operators.KMeansDF.Centroid
    val in = MemoryStream[(Long, Double, Double)]
    val cents = Seq(Centroid(0, 0.0, 0.0), Centroid(1, 10.0, 10.0))
    val q = StreamingOps.assignStream(in.toDF().toDF("id", "x", "y"), cents)
      .writeStream.format("memory").queryName("assign_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, 0.2, -0.1), (2L, 9.5, 10.2), (3L, 5.1, 5.1))
      q.processAllAvailable()
      val rows = spark.table("assign_out").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // (5.1, 5.1) is nearer the (10,10) centroid: 48.02 vs 52.02
      assert(rows === Map(1L -> 0, 2L -> 1, 3L -> 1))
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
        "centroid assignment must not register a stateful operator")
    } finally q.stop()
  }

  test("mediaDecodeStream: real codec on a stream, stateless, bit-identical to batch") {
    implicit val sq = spark.sqlContext
    import graft.multimodal.Multimodal
    val ids = Seq(3L, 4L, 10L, 11L)
    val payloads = ids.map(id => id -> Multimodal.mirrorBytes(id))
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.mediaDecodeStream(in.toDF().toDF("id", "media"))
      .writeStream.format("memory").queryName("media_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(payloads: _*)
      q.processAllAvailable()
      val got = spark.table("media_out").collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[String]("fmt"), r.getAs[Int]("width"),
            r.getAs[Int]("height"), r.getAs[Long]("sum_r"),
            r.getAs[Long]("sum_g"), r.getAs[Long]("sum_b"),
            r.getAs[Long]("ahash")))).toMap
      // batch twins on the SAME payloads: decode stats + aHash
      val batchDf = payloads.toDF("id", "media")
      val meta = Multimodal.decodeMeta(batchDf, "id", "media").collect()
        .map(m => m.id -> m).toMap
      val hash = Multimodal.averageHash(batchDf, "id", "media").collect()
        .map(h => h.id -> h.ahash).toMap
      assert(got.keySet === ids.toSet)
      ids.foreach { id =>
        val m = meta(id)
        assert(got(id) === ((m.fmt, m.width, m.height,
          m.sum_r, m.sum_g, m.sum_b, hash(id))),
          s"stream row for id=$id diverges from the batch decode")
      }
      // mirror payloads (same pixel content, PNG vs BMP container)
      // collide on ahash — the ingest-dedup key works on the stream
      assert(got(10L)._7 === got(11L)._7,
        "cross-format mirrors must share the perceptual hash")
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
        "media decode must not register a stateful operator")
    } finally q.stop()
  }

  test("semanticDedupSink: cell-partitioned corpus, semantic dups drop across batches") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_").toString
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.operators.KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 8)
    def vec(id: Long): Array[Float] = emb.filter($"vec_id" === id)
      .select($"embedding").as[Array[Float]].head()
    val (v42, v7, v13) = (vec(42), vec(7), vec(13))
    val neg7 = v7.map(-_)
    // tau 0.8: replicas (cos 1.0) are dups; unrelated corpus vectors sit
    // far below — verified here so the test can't silently depend on data
    import graft.functions.VectorFunctions.cosineSim
    def cos(a: Array[Float], b: Array[Float]): Double =
      Seq((a, b)).toDF("a", "b").select(cosineSim($"a", $"b")).as[Double].head()
    assert(math.abs(cos(v13, v42)) < 0.8 && math.abs(cos(v13, v7)) < 0.8,
      "test vectors must not be semantic dups of each other")
    val in = MemoryStream[(Long, Array[Float])]
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(StreamingOps.semanticDedupSink(s"$dir/corpus", cents, 0.8))
      .start()
    try {
      // batch 1: v42 twice (within-batch exact dup) + anti-aligned neg7
      in.addData((1L, v42), (2L, v42), (3L, neg7))
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(s"$dir/corpus")
      assert(afterB1.columns.contains("cell"), "corpus must stay cell-partitioned")
      assert(afterB1.select("vec_id").as[Long].collect().toSet === Set(1L, 3L),
        "within-batch exact dup must keep min id")
      // batch 2: replica of corpus v42 (dup) + genuinely novel v13
      in.addData((10L, v42), (11L, v13))
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(s"$dir/corpus")
        .select("vec_id").as[Long].collect().toSet
      assert(afterB2 === Set(1L, 3L, 11L),
        "corpus replicas must drop; novel vectors must append")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("purchaseViewJoin matches views in the preceding hour, stream-stream") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.purchaseViewJoin(in.toDF())
      .writeStream.format("memory").queryName("pv_join")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), "view", 1.0),   // in window (60 min before purchase)
        Event(1, ts(30), "view", 2.0),  // in window
        Event(1, ts(60), "purchase", 9.0),
        Event(1, ts(90), "view", 3.0),  // after the purchase — excluded
        Event(2, ts(30), "view", 4.0))  // other user — excluded
      q.processAllAvailable()
      val rows = spark.table("pv_join").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("v_value"))).toSet
      assert(rows === Set((1L, 1.0), (1L, 2.0)))
    } finally q.stop()
  }

  test("clickAttributionJoin (two independent streams) equals the " +
      "batch interval join under scrambled cross-stream arrival") {
    implicit val sq = spark.sqlContext
    // impressions and clicks as SEPARATE streams: clicks run AHEAD of
    // their impressions (the click for user 1 lands a batch before
    // the impression it attributes to) — the state buffer must hold
    // the early click until the partner arrives
    val imps = Seq(
      Event(1, ts(10), "imp", 1.0),  // in window of click@40
      Event(1, ts(35), "imp", 2.0),  // in window of click@40
      Event(1, ts(50), "imp", 3.0),  // AFTER the click — excluded
      Event(2, ts(5), "imp", 4.0),   // other user's click@200: 195 min gap — out of the 1 h window
      Event(3, ts(70), "imp", 5.0))  // no click at all
    val clks = Seq(
      Event(1, ts(40), "click", 9.0),
      Event(2, ts(200), "click", 8.0))
    val inI = MemoryStream[Event]
    val inC = MemoryStream[Event]
    val q = StreamingOps.clickAttributionJoin(inI.toDF(), inC.toDF(),
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("attr_join")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: ONLY the clicks — nothing can pair yet
      inC.addData(clks)
      q.processAllAvailable()
      assert(spark.table("attr_join").isEmpty,
        "no impression has arrived — nothing to emit")
      // batch 2: impressions arrive scrambled; the buffered early
      // clicks pair now
      inI.addData(imps.sortBy(_.value.toInt % 3))
      q.processAllAvailable()
      val got = spark.table("attr_join").collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Double]("i_value"), r.getAs[Double]("c_value"))).toSet
      // the BATCH interval join over the same rows — the equality the
      // operator exists to keep
      val want = clks.toDF().select(col("user_id").as("c_user"),
          col("ts").as("c_ts"), col("value").as("c_value"))
        .join(imps.toDF().select(col("user_id").as("i_user"),
            col("ts").as("i_ts"), col("value").as("i_value")),
          col("c_user") === col("i_user")
            && col("i_ts") <= col("c_ts")
            && col("i_ts") >= col("c_ts")
              - org.apache.spark.sql.functions.expr("INTERVAL 1 hour"))
        .select(col("c_user"), col("i_value"), col("c_value"))
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getDouble(2))).toSet
      assert(got === want, "stream join must equal the batch interval join")
      assert(got === Set((1L, 1.0, 9.0), (1L, 2.0, 9.0)),
        "only user 1's two preceding-hour impressions attribute")
    } finally q.stop()
  }

  test("impressionOutcomeJoin (left outer, two streams): conversions " +
      "pair, unconverted impressions emit null ONLY after the " +
      "watermark expires them, and the drained stream equals the " +
      "batch left-outer join") {
    implicit val sq = spark.sqlContext
    val imps = Seq(
      Event(1, ts(10), "imp", 1.0),  // converted by click@40
      Event(2, ts(20), "imp", 2.0),  // never clicked — must emit null
      Event(3, ts(30), "imp", 3.0))  // clicked too late (95 min gap)
    val clks = Seq(
      Event(1, ts(40), "click", 9.0),
      Event(3, ts(125), "click", 8.0))
    val inI = MemoryStream[Event]
    val inC = MemoryStream[Event]
    val q = StreamingOps.impressionOutcomeJoin(inI.toDF(), inC.toDF(),
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("imp_outcome")
      .outputMode(OutputMode.Append()).start()
    try {
      inI.addData(imps)
      inC.addData(clks)
      q.processAllAvailable()
      val early = spark.table("imp_outcome").collect()
        .map(r => (r.getAs[Long]("user_id"), Option(r.get(4)))).toSet
      assert(!early.exists(_._2.isEmpty),
        "no null outcome may emit before the watermark proves the " +
          "window closed — early nulls would be retracted conversions")
      // a far-future tick on BOTH sides advances the watermark past
      // every impression's window end
      inI.addData(Event(99, ts(600), "imp", 0.0))
      inC.addData(Event(99, ts(600), "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("imp_outcome").collect()
        .filter(_.getAs[Long]("user_id") != 99L)
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Double]("i_value"),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
      assert(got === Set((1L, 1.0, Some(9.0)), (2L, 2.0, None),
        (3L, 3.0, None)),
        "drained stream must equal the batch left-outer join: one " +
          "conversion, two null outcomes (late click outside window)")
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys within the watermark horizon") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.dedupStream(in.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), "view", 1.0), Event(1, ts(1), "view", 2.0), // dup key
        Event(1, ts(2), "click", 3.0), Event(2, ts(3), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
      assert(rows.length === 3)
      assert(rows.toSet === Set((1L, "view"), (1L, "click"), (2L, "view")))
    } finally q.stop()
  }

  test("dedupStreamBySimhash drops exact and word-identical near-dups") {
    implicit val sq = spark.sqlContext
    final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.dedupStreamBySimhash(docs, "text", "ts")
      .writeStream.format("memory").queryName("sim_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, ts(0), "the quick brown fox jumps over the lazy dog"),
        (2L, ts(1), "the quick brown fox jumps over the lazy dog"), // exact dup
        (3L, ts(2), "an entirely different document about spark engines"))
      q.processAllAvailable()
      val kept = spark.table("sim_dedup").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept.contains(3L) && kept.size === 2,
        s"one of the identical docs must be dropped, got $kept")
    } finally q.stop()
  }

  test("heavyHittersStream emits per-window MG candidates once finalized") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.heavyHittersStream(docs, "text", "ts", k = 4)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour-1 window: 'spark' dominates; long tail of unique tokens
      in.addData(
        (1L, ts(0), "spark spark spark spark spark alpha beta"),
        (2L, ts(5), "spark spark spark gamma delta epsilon"),
        (3L, ts(10), "spark spark zeta eta theta"))
      q.processAllAvailable()
      // advance the watermark past window end (1 h) + delay (10 min)
      in.addData((99L, ts(120), "tick"))
      q.processAllAvailable()
      val rows = spark.table("hh_stream").collect()
      assert(rows.nonEmpty, "finalized hour-1 window must have emitted")
      val r = rows.minBy(_.getAs[java.sql.Timestamp]("ws").getTime)
      val cand = r.getAs[scala.collection.Seq[String]]("candidates").toSet
      assert(cand.size <= 4, "summary must stay k-bounded")
      // 10 of 18 hour-1 tokens are 'spark' — far above n/k, so the MG
      // superset guarantee requires it in the candidate set
      assert(cand.contains("spark"), s"dominant token missing from $cand")
      assert(r.getAs[Long]("n_tokens") === 18L)
    } finally q.stop()
  }

  test("embedDriftStream reads 1 on-reference and below on a shifted space") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Int, Array[Double])]
    val refs = Map(0 -> Seq(1.0, 0.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0, 0.0))
    val q = StreamingOps.embedDriftStream(
      in.toDF().toDF("vec_id", "ts", "label", "embedding"), refs, dim = 4)
      .writeStream.format("memory").queryName("emb_drift")
      .outputMode(OutputMode.Append()).start()
    try {
      // label 0's window mean sits exactly on its reference direction;
      // label 1's mean has rotated 90° away from its reference
      in.addData(
        (1L, ts(0), 0, Array(2.0, 0.0, 0.0, 0.0)),
        (2L, ts(1), 0, Array(4.0, 0.0, 0.0, 0.0)),
        (3L, ts(0), 1, Array(3.0, 0.0, 0.0, 0.0)),
        (4L, ts(1), 1, Array(5.0, 0.0, 0.0, 0.0)))
      q.processAllAvailable()
      in.addData((9L, ts(120), 0, Array(1.0, 0.0, 0.0, 0.0))) // finalize hour 1
      q.processAllAvailable()
      val rows = spark.table("emb_drift").collect()
        .map(r => r.getAs[Int]("label") ->
          (r.getAs[Long]("n"), r.getAs[Double]("cos_ref"))).toMap
      assert(rows(0) === ((2L, 1.0)),
        s"on-reference window must read cosine 1, got $rows")
      assert(rows(1)._2 === 0.0,
        s"an orthogonally-shifted space must read cosine 0, got $rows")
    } finally q.stop()
  }

  test("driftMonitorStream flags the shifted type and clears the steady one") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val ev = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val uniformRef = Seq.fill(10)(0.1)
    val q = StreamingOps.driftMonitorStream(ev, uniformRef)
      .writeStream.format("memory").queryName("drift_mon")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour-1 window: 'steady' puts one event in each 50-wide bin —
      // smoothed proportions land exactly on the uniform reference, so
      // PSI is 0; 'shifted' piles all ten events into bin 9
      val steady = (0 until 10).map(b =>
        (b.toLong, ts(b.toLong), "steady", b * 50.0 + 25.0))
      val shifted = (0 until 10).map(i =>
        (100L + i, ts(i.toLong), "shifted", 475.0))
      in.addData(steady ++ shifted)
      q.processAllAvailable()
      in.addData((999L, ts(120), "tick", 0.0)) // watermark past window+delay
      q.processAllAvailable()
      val rows = spark.table("drift_mon").collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("psi"))).toMap
      assert(rows.contains("steady") && rows.contains("shifted"),
        s"both hour-1 groups must finalize, got ${rows.keySet}")
      assert(rows("steady")._1 === 10L)
      assert(rows("steady")._2 === 0.0,
        s"uniform data vs uniform reference must read PSI 0, got $rows")
      assert(rows("shifted")._2 > 0.5,
        s"single-bin pileup must read as strong drift, got $rows")
    } finally q.stop()
  }

  test("splitStream assigns the batch q_split split statelessly and " +
    "agrees with the batch expression on every doc") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingOps.splitStream(docs)
      .writeStream.format("memory").queryName("split_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((0L until 200L).map(i => (i, s"doc $i")): _*)
      q.processAllAvailable()
      val streamed = spark.table("split_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
      // the batch twin's expression over the same ids
      val batch = (0L until 200L).toDF("doc_id")
        .withColumn("h", conv(substring(
          md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
          .cast("long"))
        .withColumn("split", when(col("h") < 52429L, "train")
          .when(col("h") < 58982L, "val").otherwise("test"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
        .toMap
      assert(streamed === batch,
        "stream and batch must assign identical splits per doc")
      val byBucket = streamed.values.groupBy(identity).view.mapValues(_.size).toMap
      assert(byBucket("train") > 130 && byBucket.getOrElse("val", 0) > 0 &&
        byBucket.getOrElse("test", 0) > 0,
        s"80/10/10 must roughly hold on 200 ids, got $byBucket")
      // stateless contract: routing adds no state store
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
        "split routing must not register a stateful operator")
    } finally q.stop()
  }

  test("qualityFilterStream applies the batch filter rules statelessly") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val docs = in.toDF().toDF("doc_id", "lang", "text")
    val q = StreamingOps.qualityFilterStream(docs)
      .writeStream.format("memory").queryName("qfilter")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, "en", "tiny doc"), // r_short
        (2L, "en", "the cat sat on a mat and the dog ran to a park in the town near a river"),
        (3L, "en", "call 555 123 9999 8888 7777 6666 5555 4444 3333 2222 1111 0000 9876 5432 1234"), // r_digit
        (4L, "en", "spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam the of and is in on a to"), // r_rep
        (5L, "de", "der hund läuft schnell durch den wald und springt über einen bach im tal bei nacht")) // en-stopword rule must not fire for de
      q.processAllAvailable()
      val rows = spark.table("qfilter").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Boolean]("keep"), r.getAs[Boolean]("r_short"),
            r.getAs[Boolean]("r_digit"), r.getAs[Boolean]("r_rep"))).toMap
      assert(rows(1L)._2, "2-word doc must trip r_short")
      assert(rows(2L)._1, "clean English doc must be kept")
      assert(rows(3L)._3 && !rows(3L)._1, "digit wall must trip r_digit")
      assert(rows(4L)._4 && !rows(4L)._1, "15x repeated word must trip r_rep")
      assert(rows(5L)._1, "stopword-sparse non-English doc must be kept")
      // stateless contract: per-row column math only — no state store,
      // so ingest-time filtering adds no memory that grows with the run
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
        "quality filter must not register a stateful operator")
    } finally q.stop()
  }

  test("dedupStreamByMinhashBands drops banded near-dups, emits novel docs") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.dedupStreamByMinhashBands(docs, "text", "ts")
      .writeStream.format("memory").queryName("mh_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = "the quick brown fox jumps over the lazy dog while rain " +
        "falls on the quiet town and children play near the river bank"
      in.addData(
        (1L, ts(0), base),
        (2L, ts(1), base + " postscript"), // ~0.96 Jaccard → band collision
        (3L, ts(2), "completely different content about distributed query " +
          "engines and shuffle partitioning strategies in modern systems"))
      q.processAllAvailable()
      // watermark must pass window end (1 h) + delay (10 min) to emit
      in.addData((99L, ts(120), "late tick that closes the first hour window"))
      q.processAllAvailable()
      val got = spark.table("mh_dedup").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(got.contains(1L), "first occurrence must be novel")
      assert(got.contains(3L), "unrelated doc must be novel")
      assert(!got.contains(2L), "near-dup sharing bands with doc 1 must drop")
    } finally q.stop()
  }

  test("dedupStreamByMinhashBands state is bounded: horizon eviction on both stages") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.dedupStreamByMinhashBands(docs, "text", "ts")
      .writeStream.format("memory").queryName("mh_bounded")
      .outputMode(OutputMode.Append()).start()
    try {
      // 20 distinct docs → 20×32 band-sig state rows in the early window
      in.addData((0 until 20).map(i =>
        (i.toLong, ts(i), s"unique document number $i with its own " +
          s"disjoint vocabulary token$i word$i term$i item$i entry$i")): _*)
      q.processAllAvailable()
      // event time jumps 10 h: both the dedup keys and the emitted
      // window's agg rows are behind the watermark and must evict
      in.addData((1000L, ts(600), "far future doc one two three four five"))
      q.processAllAvailable()
      in.addData((1001L, ts(610), "even later doc six seven eight nine ten"))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(state < 20 * 32,
        s"state must not accumulate expired band signatures, saw $state rows")
    } finally q.stop()
  }

  test("dedupStream state is bounded: watermark evicts expired keys") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.dedupStream(in.toDF(), Seq("user_id", "event_type"),
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_bounded")
      .outputMode(OutputMode.Append()).start()
    try {
      // 50 distinct keys in an early window
      in.addData((0 until 50).map(i => Event(i, ts(0), "view", 1.0)): _*)
      q.processAllAvailable()
      // event time jumps far past the watermark horizon: the old keys
      // are evictable; new micro-batches must not accumulate them
      in.addData(Event(1000, ts(600), "view", 1.0))
      q.processAllAvailable()
      in.addData(Event(1001, ts(610), "view", 1.0))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators(0).numRowsTotal
      assert(state < 50,
        s"state rows ($state) must shrink once the watermark passes the horizon" +
          " — unbounded dedup state would OOM a long-running stream")
    } finally q.stop()
  }

  test("file-source streaming ingests parquet drops incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_").toString
    try {
      val batch1 = Seq(Event(1, ts(0), "view", 1.0), Event(2, ts(1), "click", 2.0))
      batch1.toDF().write.parquet(s"$dir/in/b1")
      val stream = spark.readStream
        .schema(batch1.toDF().schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/in/*")
      val q = stream.groupBy("event_type").count()
        .writeStream.format("memory").queryName("file_src")
        .outputMode(OutputMode.Complete()).start()
      try {
        q.processAllAvailable()
        assert(spark.table("file_src").collect().map(_.getLong(1)).sum === 2)
        // a new file arriving is picked up without restarting the query
        Seq(Event(3, ts(2), "view", 3.0)).toDF().write.parquet(s"$dir/in/b2")
        q.processAllAvailable()
        assert(spark.table("file_src").collect().map(_.getLong(1)).sum === 3)
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("sessionWindowStream merges bridged sessions before emission and evicts closed state") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    // 45-min watermark delay: the minute-20 bridge event must still be
    // INSIDE the lateness horizon when the stream has seen minute 40
    // (a 10-min delay would drop it as late — wm 30 > 20)
    val q = StreamingOps.sessionWindowStream(in.toDF(),
        watermarkDelay = "45 minutes")
      .writeStream.format("memory").queryName("sw_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // two provisional user-1 sessions, 40 min apart (> the 30-min gap)
      in.addData(Event(1, ts(0), "view", 1.0), Event(1, ts(40), "view", 2.0))
      q.processAllAvailable()
      // a bridging event at minute 20 lands INSIDE both gaps — the
      // state store must merge the three into ONE session before any
      // Append-mode emission (nothing has finalized yet: wm too early)
      in.addData(Event(1, ts(20), "view", 4.0))
      q.processAllAvailable()
      assert(spark.table("sw_stream").isEmpty,
        "no session may emit before the watermark passes its end")
      // advance the watermark far past user-1's session end → exactly
      // one MERGED session emits (3 events, value 7.0, spanning 0..70)
      in.addData(Event(2, ts(600), "view", 9.0))
      q.processAllAvailable()
      val rows = spark.table("sw_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sess_value"),
          r.getAs[Long]("se_us") - r.getAs[Long]("ss_us"))).toSet
      assert(rows === Set((1L, 3L, 7.0, 70L * 60000000L)),
        s"bridged provisional sessions must merge into one emission, got $rows")
      // batch parity on the same data: the q_session_window operator
      // over the union of all four events produces the same user-1 row
      val batch = Seq(
        Event(1, ts(0), "view", 1.0), Event(1, ts(40), "view", 2.0),
        Event(1, ts(20), "view", 4.0), Event(2, ts(600), "view", 9.0))
        .toDF()
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .where(col("user_id") === 1L).collect()
      assert(batch.length === 1 && batch.head.getAs[Long]("n_events") === 3L)
      // eviction: user-1's closed session must leave the state store;
      // only user-2's open session remains
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows === 1L,
        s"closed sessions must evict from state, got $stateRows rows")
    } finally q.stop()
  }

  test("sessionize keeps sub-millisecond event time exactly (micros state)") {
    implicit val sq = spark.sqlContext
    // 12:00:00.001500250 — getTime floors to ms; micros must keep .0015002
    def microTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val startUs = 1700000000001500L // 1.5 ms past the second — ms-unaligned
    val in = MemoryStream[Event]
    val q = StreamingOps.sessionize(in.toDS())
      .writeStream.format("memory").queryName("micro_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, microTs(startUs), "view", 1.0),
        Event(1, microTs(startUs + 250), "view", 1.0), // same session, +250µs
        Event(1, microTs(startUs + 10L * 3600 * 1000000), "view", 1.0)) // closes it
      q.processAllAvailable()
      val rows = spark.table("micro_sessions")
        .collect().map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us")))
      assert(rows.contains((startUs, startUs + 250)),
        s"session bounds must be exact micros, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("sessionize closes a session when the inactivity gap is exceeded") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), "view", 1.0), Event(1, ts(10), "click", 2.0),
        Event(1, ts(120), "view", 4.0), // 110-min gap → closes first session
        Event(2, ts(0), "view", 9.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sess_value"))).toSet
      // user 1's first session closes via the in-stream gap; user 2's via
      // event-time timeout (watermark t110 > t0+30min). User 1's session
      // at t120 is still open — the watermark hasn't passed its gap.
      assert(rows === Set((1L, 2L, 3.0), (2L, 1L, 9.0)))
    } finally q.stop()
  }

  test("ewmaStream emits finalized days bit-identical to the batch " +
    "q_ewma plan, across batches and past the 8-day lag window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.ewmaStream(in.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode(OutputMode.Append()).start()
    def dts(day: Long, min: Long) = new Timestamp(day * 86400000L + min * 60000L)
    // 'a' has a day that grows ACROSS batches; 'c' runs 12 consecutive
    // days so the trailing-8 observed-day window actually saturates;
    // 'b' is a single early day followed by a long quiet gap
    val wave1 = Seq(
      Event(1, dts(100, 10), "a", 1.2345), Event(2, dts(100, 50), "a", 2.5),
      Event(3, dts(100, 30), "b", 10.125), Event(4, dts(101, 20), "a", 3.75)) ++
      (100L to 101L).map(d => Event(d, dts(d, 10), "c", d * 0.1))
    // wave-1 watermark = day101 00:20 − 10 min, so every wave-2 event
    // (earliest: day101 00:40) is on-time, never late-dropped
    val wave2 = Seq(
      Event(5, dts(101, 40), "a", 0.5), Event(6, dts(102, 10), "a", 7.0)) ++
      (102L to 111L).map(d => Event(d, dts(d, 10), "c", d * 0.1))
    val tick = Seq(Event(9, dts(125, 0), "b", 10.125))
    try {
      in.addData(wave1: _*)
      q.processAllAvailable()
      in.addData(wave2: _*)
      q.processAllAvailable()
      in.addData(tick: _*)
      q.processAllAvailable()
      val streamed = spark.table("ewma_stream")
        .select("event_type", "day", "n", "ewma").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // the REAL batch plan over the same events, restricted to the
      // days the stream could finalize (everything before the tick's)
      val batchEv = (wave1 ++ wave2 ++ tick)
        .map(e => (e.user_id, e.ts, e.event_type, e.value))
        .toDF("user_id", "ts", "event_type", "value")
      val expected = graft.queries.AnalyticsPack.ewmaDaily(batchEv)
        .filter(col("day") < 125).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === expected,
        s"stream must replay the batch series exactly:\n got $streamed\n want $expected")
      // cross-batch continuity: day 101 of 'a' spans both waves (n=2)
      assert(streamed.exists(t => t._1 == "a" && t._2 == 101L && t._3 == 2L))
      // 'c' emitted all 12 days — days 8..11 scored through the CAPPED
      // trailing window, agreeing with the batch lag-7 horizon
      assert(streamed.count(_._1 == "c") === 12)
      // state = one row per TYPE (each ≤ 8 trailing days + open days)
      assert(q.lastProgress.stateOperators(0).numRowsTotal <= 3,
        "state must be per-type rows, not per-event")
    } finally q.stop()
  }

  test("ewmaStream property: random seeded event sets agree with the " +
    "batch plan however the waves land") {
    // the handpicked agreement test's stronger sibling: 300 random
    // events over 4 types × 25 days (fixed seed — deterministic),
    // split into three day-partitioned waves so no event is
    // late-dropped, must replay the batch series EXACTLY
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(1234)
    val evs = (1 to 300).map { i =>
      val day = 100L + rnd.nextInt(25)
      Event(i.toLong, new Timestamp(day * 86400000L + rnd.nextInt(1440) * 60000L),
        s"t${rnd.nextInt(4)}", math.rint(rnd.nextDouble() * 2000) / 100 - 5.0)
    }.sortBy(_.ts.getTime)
    val waves = Seq(
      evs.filter(_.ts.getTime < 108L * 86400000L),
      evs.filter(e => e.ts.getTime >= 108L * 86400000L &&
        e.ts.getTime < 117L * 86400000L),
      evs.filter(_.ts.getTime >= 117L * 86400000L))
    val in = MemoryStream[Event]
    val q = StreamingOps.ewmaStream(in.toDS())
      .writeStream.format("memory").queryName("ewma_prop")
      .outputMode(OutputMode.Append()).start()
    try {
      waves.foreach { w =>
        if (w.nonEmpty) { in.addData(w: _*); q.processAllAvailable() }
      }
      in.addData(Event(999L, new Timestamp(200L * 86400000L), "t0", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ewma_prop")
        .select("event_type", "day", "n", "ewma").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batchEv = (evs :+ Event(999L, new Timestamp(200L * 86400000L), "t0", 0.0))
        .map(e => (e.user_id, e.ts, e.event_type, e.value))
        .toDF("user_id", "ts", "event_type", "value")
      val expected = graft.queries.AnalyticsPack.ewmaDaily(batchEv)
        .filter(col("day") < 200).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === expected,
        s"random series must replay exactly; sizes ${streamed.size} vs ${expected.size}")
      assert(streamed.size >= 50, "the draw must actually cover many (type, day) cells")
    } finally q.stop()
  }

  test("anomalyMonitorStream reads z=0 on reference-matching data and " +
    "flags an injected spike") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val ev = in.toDF().toDF("event_id", "ts", "event_type", "value")
    // (median, MAD) per type, as batch q_anomaly fits them offline
    val ref = Map("steady" -> ((100.0, 10.0)), "spiky" -> ((50.0, 5.0)))
    val q = StreamingOps.anomalyMonitorStream(ev, ref)
      .writeStream.format("memory").queryName("anom_mon")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour-1 window: every 'steady' event sits exactly on its
      // reference median (modified z = 0); 'spiky' has four tame rows
      // and one 20-MAD pileup (z = 0.6745·100/5 = 13.49); 'brand_new'
      // is absent from the reference entirely
      val steady = (0 until 5).map(i => (i.toLong, ts(i.toLong), "steady", 100.0))
      val tame = (10 until 14).map(i => (i.toLong, ts(i.toLong), "spiky", 50.0))
      val spike = Seq((99L, ts(14), "spiky", 150.0))
      val novel = Seq((200L, ts(15), "brand_new", 7.0))
      in.addData(steady ++ tame ++ spike ++ novel: _*)
      q.processAllAvailable()
      in.addData((999L, ts(120), "steady", 100.0)) // watermark past window+delay
      q.processAllAvailable()
      val rows = spark.table("anom_mon").collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("n_anom"),
            Option(r.getAs[java.lang.Double]("max_abs_z")).map(_.doubleValue))))
        .toMap
      assert(rows("steady") === ((5L, 0L, Some(0.0))),
        s"reference-matching data must read z=0 and flag nothing, got $rows")
      assert(rows("spiky")._1 === 5L && rows("spiky")._2 === 1L,
        s"the injected spike must be flagged, got $rows")
      assert(rows("spiky")._3.exists(_ > 13.0))
      assert(rows("brand_new") === ((1L, 0L, None)),
        "a type absent from the reference must surface with NULL score, " +
          s"never vanish, got $rows")
    } finally q.stop()
  }

  test("anomalyMonitorStream state is bounded: watermark evicts closed windows") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val ev = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val ref = (0 until 40).map(i => s"t$i" -> ((10.0, 1.0))).toMap
    val q = StreamingOps.anomalyMonitorStream(ev, ref)
      .writeStream.format("memory").queryName("anom_bounded")
      .outputMode(OutputMode.Append()).start()
    try {
      // 40 types populate 40 (window, type) state rows in hour 1
      in.addData((0 until 40).map(i => (i.toLong, ts(i.toLong % 50), s"t$i", 10.0)): _*)
      q.processAllAvailable()
      // event time jumps 10 h past the horizon: hour-1 rows finalize
      // and must leave the store, not accumulate under new arrivals
      in.addData((1000L, ts(600), "t0", 10.0))
      q.processAllAvailable()
      in.addData((1001L, ts(610), "t1", 10.0))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(state < 40,
        s"closed (window, type) rows must evict with the watermark, saw $state")
    } finally q.stop()
  }

  test("rate source: live-clock micro-batches drive the stateless " +
    "split+quality pipeline") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions.concat_ws
    // format("rate") is a real continuous source under the wall clock —
    // the closest no-network stand-in for a broker: offsets advance on
    // their own, triggers fire on a cadence, nothing is hand-fed
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "200").load()
    val docs = rate.select(col("value").as("doc_id"),
      concat_ws(" ", lit("live"), lit("document"), col("value")).as("text"),
      lit("en").as("lang"))
    val piped = StreamingOps.qualityFilterStream(StreamingOps.splitStream(docs))
    val q = piped.writeStream.format("memory").queryName("rate_pipe")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def committed = q.recentProgress.count(_.numInputRows > 0)
      while ((committed < 5 ||
          spark.table("rate_pipe").count() < 100) &&
          System.currentTimeMillis() < deadline && q.exception.isEmpty)
        Thread.sleep(200)
      assert(q.exception.isEmpty, s"soak must stay healthy: ${q.exception}")
      assert(committed >= 5, "the live clock must keep delivering micro-batches")
      val out = spark.table("rate_pipe")
      assert(out.count() >= 100)
      assert(out.filter(!col("split").isin("train", "val", "test")).isEmpty,
        "every live row must route to a valid split")
      assert(out.filter(col("keep").isNull).isEmpty,
        "every live row must carry a computed keep decision")
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
        "the stateless pipeline must register no state store under a live clock")
    } finally q.stop()
  }

  test("rate source soak: the watermarked monitor survives no-data triggers " +
    "and finalizes windows under a live clock") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions.concat
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "100").load()
    val ev = rate.select(col("timestamp").as("ts"),
      concat(lit("t"), col("value") % 2).as("event_type"),
      (col("value") % 10).cast("double").as("value"))
    val mon = StreamingOps.anomalyMonitorStream(ev,
      Map("t0" -> ((4.0, 2.0)), "t1" -> ((5.0, 2.0))),
      windowLen = "2 seconds", watermarkDelay = "1 second")
    val q = mon.writeStream.format("memory").queryName("rate_mon")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      // rate offsets advance once per second but triggers fire every
      // 100 ms: most triggers see no new data, and with a watermark to
      // advance the engine RUNS them as empty micro-batches — exactly
      // the empty-trigger regime a live deployment idles through
      def empties = q.recentProgress.count(_.numInputRows == 0)
      while ((spark.table("rate_mon").count() < 3 || empties < 2) &&
          System.currentTimeMillis() < deadline && q.exception.isEmpty)
        Thread.sleep(200)
      assert(q.exception.isEmpty, s"soak must stay healthy: ${q.exception}")
      assert(empties >= 2,
        "no-data triggers must run (watermark advancement) and be survived")
      assert(spark.table("rate_mon").count() >= 3,
        "tumbling windows must finalize on the live clock")
      // state ∝ types × open windows — 2 types, 2 s windows, 1 s delay
      val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(state <= 20,
        s"monitor state must stay at types×open-windows rows, saw $state")
    } finally q.stop()
  }

  test("rate source soak: upsertSink state stays key-bounded under " +
    "continuous live input") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_ratesink_").toString
    try {
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", "50").load()
      val ev = rate.select((col("value") % 8).as("user_id"),
        col("timestamp").as("ts"), lit("tick").as("event_type"),
        col("value").cast("double").as("value"), col("value").as("event_id"))
      val q = ev.writeStream
        .option("checkpointLocation", s"$dir/ck")
        .foreachBatch(StreamingOps.upsertSink(s"$dir/state", nBuckets = 4))
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        def committed = q.recentProgress.count(_.numInputRows > 0)
        while (committed < 3 && System.currentTimeMillis() < deadline &&
            q.exception.isEmpty)
          Thread.sleep(200)
        assert(q.exception.isEmpty, s"soak must stay healthy: ${q.exception}")
        assert(committed >= 3)
        def state() = spark.read.parquet(s"$dir/state")
        val rows1 = state().collect()
        assert(rows1.nonEmpty && rows1.length <= 8,
          s"state rows are KEYS (8 users), not events, saw ${rows1.length}")
        // keep streaming: more batches must not grow the state table
        val mark = committed
        while (committed < mark + 2 && System.currentTimeMillis() < deadline &&
            q.exception.isEmpty)
          Thread.sleep(200)
        val rows2 = state().collect()
        assert(rows2.length <= 8,
          s"state must stay key-bounded as input flows, saw ${rows2.length}")
        assert(rows2.forall(r =>
          r.getAs[Long]("event_id") % 8 === r.getAs[Long]("user_id")),
          "each key's stored row must belong to that key")
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("upsertSink crash matrix: a crash between bucket commits replays " +
    "to the correct state, then skips once fully committed") {
    // ParquetBucketStore's dynamic partition overwrite commits bucket
    // dirs one at a time — this store reproduces that non-atomicity
    // exactly (per-bucket bid rides with the data) and injects the
    // crash between bucket A's commit and bucket B's
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    class PerBucketStore extends StreamingOps.UpsertStateStore {
      var buckets = Map.empty[Int, (Long, Seq[Row])] // bucket -> (bid, rows)
      var schema: StructType = _
      var crashAfterFirstBucket = false
      var commits = 0
      def read(sp: org.apache.spark.sql.SparkSession,
          touched: Seq[Int]): Option[org.apache.spark.sql.DataFrame] =
        if (buckets.isEmpty) None
        else Some(sp.createDataFrame(
          sp.sparkContext.parallelize(
            touched.flatMap(b => buckets.get(b).map(_._2).getOrElse(Nil))),
          schema))
      def alreadyCommitted(sp: org.apache.spark.sql.SparkSession,
          touched: Seq[Int], batchId: Long): Boolean =
        touched.nonEmpty &&
          touched.forall(b => buckets.get(b).exists(_._1 >= batchId))
      def commit(merged: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val m = merged.localCheckpoint()
        schema = m.schema
        var first = true
        m.collect().groupBy(_.getAs[Int]("bucket")).toSeq.sortBy(_._1)
          .foreach { case (b, rows) =>
            buckets += b -> ((batchId, rows.toSeq))
            commits += 1
            if (first && crashAfterFirstBucket) {
              crashAfterFirstBucket = false
              throw new RuntimeException(s"injected crash after bucket $b")
            }
            first = false
          }
      }
    }
    val store = new PerBucketStore
    val sink = StreamingOps.upsertSink(store, nBuckets = 4)
    def df(rows: (Long, Timestamp, String, Double, Long)*) =
      rows.toDF("user_id", "ts", "event_type", "value", "event_id")
    def state() = store.buckets.values.flatMap(_._2)
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("event_type"), r.getAs[Double]("value")))).toMap
    // batch 0: users 1 (bucket 1) and 2 (bucket 2), commits clean
    sink(df((1L, ts(5), "view", 1.0, 10L), (2L, ts(6), "view", 2.0, 11L)), 0L)
    assert(state() === Map(1L -> (("view", 1.0)), 2L -> (("view", 2.0))))
    // batch 1 touches both buckets; the crash lands between them
    store.crashAfterFirstBucket = true
    intercept[RuntimeException] {
      sink(df((1L, ts(10), "click", 3.0, 12L),
        (2L, ts(11), "purchase", 4.0, 13L)), 1L)
    }
    val bids = store.buckets.map { case (b, (bid, _)) => b -> bid }
    assert(bids.values.toSet === Set(0L, 1L),
      s"the crash must leave buckets at MIXED bids (the torn window), got $bids")
    // replay: one bucket behind ⇒ alreadyCommitted is false ⇒ re-merge;
    // the already-written bucket re-merges idempotently
    sink(df((1L, ts(10), "click", 3.0, 12L),
      (2L, ts(11), "purchase", 4.0, 13L)), 1L)
    assert(state() === Map(1L -> (("click", 3.0)), 2L -> (("purchase", 4.0))),
      s"replay after the torn commit must complete the merge, got ${state()}")
    assert(store.buckets.values.forall(_._1 === 1L))
    // second replay: every touched bucket now carries bid 1 ⇒ skipped
    val commitsBefore = store.commits
    sink(df((1L, ts(10), "click", 3.0, 12L),
      (2L, ts(11), "purchase", 4.0, 13L)), 1L)
    assert(store.commits === commitsBefore,
      "a fully-committed batch must be skipped on replay, not re-merged")
  }

  test("upsertSink crash matrix: a crash between data commit and the " +
    "commit-log record replays idempotently") {
    // the OTHER non-atomic seam: a transactional-format adapter whose
    // data commit and commit-log append are separate operations (the
    // MemStore shape) — killed between the two, the replay re-merges
    // (idempotent) and finally records the log entry
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    class LoggedStore extends StreamingOps.UpsertStateStore {
      var rows: Seq[Row] = Nil
      var schema: StructType = _
      var commitLog = Set.empty[Long]
      var crashBeforeLog = false
      def read(sp: org.apache.spark.sql.SparkSession,
          touched: Seq[Int]): Option[org.apache.spark.sql.DataFrame] =
        if (rows.isEmpty) None
        else Some(sp.createDataFrame(sp.sparkContext.parallelize(rows), schema)
          .filter(col("bucket").isin(touched: _*)))
      def alreadyCommitted(sp: org.apache.spark.sql.SparkSession,
          touched: Seq[Int], batchId: Long): Boolean = commitLog.contains(batchId)
      def commit(merged: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val m = merged.localCheckpoint()
        schema = m.schema
        val touched = m.select("bucket").distinct().collect()
          .map(_.getInt(0)).toSet
        rows = rows.filterNot(r => touched(r.getAs[Int]("bucket"))) ++ m.collect()
        if (crashBeforeLog) {
          crashBeforeLog = false
          throw new RuntimeException("injected crash before commit-log append")
        }
        commitLog += batchId
      }
    }
    val store = new LoggedStore
    val sink = StreamingOps.upsertSink(store, nBuckets = 4)
    def df(rows: (Long, Timestamp, String, Double, Long)*) =
      rows.toDF("user_id", "ts", "event_type", "value", "event_id")
    def state() = store.rows.map(r => r.getAs[Long]("user_id") ->
      ((r.getAs[String]("event_type"), r.getAs[Double]("value")))).toMap
    sink(df((1L, ts(5), "view", 1.0, 10L)), 0L)
    store.crashBeforeLog = true
    intercept[RuntimeException] {
      sink(df((1L, ts(10), "click", 3.0, 12L)), 1L)
    }
    // data landed, log didn't — the torn window
    assert(state() === Map(1L -> (("click", 3.0))))
    assert(store.commitLog === Set(0L))
    // replay re-merges the same rows (event-time keep rule makes it a
    // no-op) and this time records the commit
    sink(df((1L, ts(10), "click", 3.0, 12L)), 1L)
    assert(state() === Map(1L -> (("click", 3.0))),
      "the idempotent re-merge must not change state")
    assert(store.commitLog === Set(0L, 1L))
  }

  test("versioned state: a crash between commit and GC leaves two complete " +
    "versions — reader takes the newest, the next commit sweeps both") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gccrash_").toString
    try {
      val sink = StreamingOps.incrementalAggSink(s"$dir/s")
      def ev(u: Long, t: Int, v: Double) =
        Seq((u, ts(t.toLong), "view", v)).toDF("user_id", "ts", "event_type", "value")
      sink(ev(1, 0, 2.0), 0L)
      sink(ev(2, 1, 4.0), 1L)
      // simulate the kill between v1's commit and the sweep of v0: put
      // a COMPLETE (committed, _SUCCESS-marked) stale v0 back beside v1
      Seq(("view", 99L, 99.0, 99.0, 99.0))
        .toDF("event_type", "n", "sv", "mn", "mx")
        .write.parquet(s"$dir/s/v000000000000")
      def versions() = new java.io.File(s"$dir/s").listFiles()
        .map(_.getName).filter(_.startsWith("v")).sorted.toSeq
      assert(versions() === Seq("v000000000000", "v000000000001"))
      // the reader must take the NEWEST complete version, not the stale one
      val s1 = StreamingOps.readState(spark, s"$dir/s")
        .select("n", "sv").head()
      assert(s1.getLong(0) === 2L && s1.getDouble(1) === 6.0,
        "reader must ignore the stale committed predecessor")
      // the next batch merges from v1 and its commit sweeps BOTH old
      // versions — the GC debt clears itself
      sink(ev(3, 2, 6.0), 2L)
      assert(versions() === Seq("v000000000002"),
        s"commit must sweep every older version, got ${versions()}")
      val s2 = StreamingOps.readState(spark, s"$dir/s")
        .select("n", "sv").head()
      assert(s2.getLong(0) === 3L && s2.getDouble(1) === 12.0)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("kmvStream minima are bit-identical to the batch sketch under " +
      "scrambled arrival") {
    implicit val sq = spark.sqlContext
    // 120 distinct users (some repeated) scrambled across two
    // triggers: the k=64 minima must equal the batch distinct-hash
    // sort — union-take-k is order-free, and duplicates collapse
    val w0 = (1 to 120).map(u => Event(u, ts(u % 45), "view", 1.0)) ++
      (1 to 30).map(u => Event(u, ts(45 - u % 40), "view", 1.0))
    val scrambled = w0.sortBy(_.user_id % 7)
    val in = MemoryStream[Event]
    val q = StreamingOps.kmvStream(in.toDF(), watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(scrambled.take(70))
      q.processAllAvailable()
      in.addData(scrambled.drop(70))
      q.processAllAvailable()
      in.addData(Event(999, ts(300), "view", 1.0)) // closes window 0
      q.processAllAvailable()
      val emitted = spark.table("kmv_stream").collect()
      assert(emitted.length === 1, "one closed window, emitted once")
      val got = emitted.head.getAs[scala.collection.Seq[Long]]("minima").toSeq
      val want = w0.toDF()
        .select(graft.functions.Kmv.hash(col("user_id")).as("h"))
        .distinct().collect().map(_.getLong(0)).sorted.take(64).toSeq
      assert(got === want, "stream minima must equal the batch sketch")
      // shared finalize: 64 < 120 distinct, so the estimator path runs
      val est = graft.functions.Kmv.estimate(got)
      assert(math.abs(est - 120.0) / 120.0 < 0.375, s"estimate $est vs 120")
    } finally q.stop()
  }

  test("kmvStream restart: a checkpointed stream resumes the minima " +
      "state without duplicate inflation") {
    // stop with an OPEN window (minima live only in the state store),
    // restart on the same checkpoint with an overlapping batch — the
    // closed window's minima must equal a batch sketch over both
    // batches' DISTINCT rows: replayed/overlapping keys collapse into
    // the set instead of double-counting
    val dir = java.nio.file.Files.createTempDirectory("graft_kmvrs_").toString
    try {
      def evDF(rows: Seq[(Long, Long)]) = rows
        .toDF("user_id", "minute")
        .select(col("user_id"),
          org.apache.spark.sql.functions.timestamp_micros(
            lit(1700000000000000L) + col("minute") * 60000000L).as("ts"))
      val b1 = (1L to 60L).map(u => (u, u % 45))
      val b2 = (40L to 120L).map(u => (u, u % 45)) :+ (999L, 300L)
      evDF(b1).coalesce(1).write.parquet(s"$dir/in/b1")
      val schema = evDF(b1).schema
      def startQuery() = StreamingOps.kmvStream(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*"),
          watermarkDelay = "2 hours")
        .toDF()
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append()).start()
      val q1 = startQuery()
      try { q1.processAllAvailable() } finally q1.stop()
      evDF(b2).coalesce(1).write.parquet(s"$dir/in/b2")
      val q2 = startQuery()
      try { q2.processAllAvailable() } finally q2.stop()
      val rows = spark.read.parquet(s"$dir/out")
        .filter(org.apache.spark.sql.functions.size(col("minima")) > 0)
        .collect()
      assert(rows.length === 1)
      val got = rows.head.getAs[scala.collection.Seq[Long]]("minima").toSeq
      val want = evDF((b1 ++ b2).filter(_._2 < 45))
        .select(graft.functions.Kmv.hash(col("user_id")).as("h"))
        .distinct().collect().map(_.getLong(0)).sorted.take(64).toSeq
      assert(got === want,
        "minima after restart must equal the batch sketch over both batches")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("recordLinkStream decisions are bit-identical to the batch " +
      "kernel under scrambled cross-batch arrival") {
    implicit val sq = spark.sqlContext
    // the q_record_link hand corpus: 4 clean records, their 4 dirty
    // counterparts plus the generator applied to a 5th unseen entity
    // (matches nothing — must emit NO row, not a wrong link)
    val clean = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRST", 7L, "SEG", 12345L),
      (2L, "UVWXYZABCDEFGHIJKLMN", 7L, "SEG", 22345L),
      (3L, "QRSTUVWXYZ0123456789", 7L, "SEG", 32345L),
      (4L, "JIHGFEDCBA9876543210", 7L, "SEG", 12346L)
    ).toDF("ck", "nm", "nk", "seg", "bc")
    val allClean = clean.unionByName(
      Seq((5L, "ZYXWVUTSRQPONMLKJIHG", 7L, "SEG", 77777L))
        .toDF("ck", "nm", "nk", "seg", "bc"))
    val dirtyRows = graft.queries.DedupPack.dirtyGen(allClean)
      .collect().map(r => (r.getAs[Long]("dk"), r.getAs[Long]("nk"),
        r.getAs[String]("seg"), r.getAs[String]("dnm"),
        r.getAs[Long]("dbc")))
    val want = graft.queries.DedupPack
      .scoredPairs(graft.queries.DedupPack.dirtyGen(allClean), clean)
      .select("dk", "ck", "score", "decision").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(want.nonEmpty && !want.exists(_._1 == 5L),
      "the unseen entity must not link")
    val in = MemoryStream[(Long, Long, String, String, Long)]
    val q = StreamingOps.recordLinkStream(
        in.toDF().toDF("dk", "nk", "seg", "dnm", "dbc"), clean)
      .writeStream.format("memory").queryName("rl_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // scrambled split across two triggers
      val (b1, b2) = dirtyRows.sortBy(_._4).splitAt(2)
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("rl_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      assert(got === want)
    } finally q.stop()
  }
}
