package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The atomic-publish seam under [[TxLogTable]] — the piece a real
  * deployment swaps per storage backend (Delta's LogStore): publish
  * `content` as `name` in `dir` such that exactly one of any number
  * of concurrent publishers of the same name succeeds and readers
  * never observe partial content. [[LogPublisher.HardLink]] is the
  * local-filesystem implementation; an object-store backend
  * implements the same contract with a conditional put (S3
  * If-None-Match, GCS preconditions) or a commit service. */
trait LogPublisher {
  /** MUST throw [[java.nio.file.FileAlreadyExistsException]] if
    * `name` already exists — the mutual-exclusion edge the whole
    * optimistic-concurrency protocol rests on. */
  def publish(dir: Path, name: String, content: Array[Byte]): Unit
}

object LogPublisher {
  /** Local FS: write a temp file, then atomically HARD-LINK it to the
    * target — link creation fails loudly on an existing target and
    * the content is fully written before the link appears. (NOT a
    * rename: POSIX rename silently replaces, losing a racer's
    * commit — the bug TxLogSpec's racing committers caught.) */
  object HardLink extends LogPublisher {
    def publish(dir: Path, name: String, content: Array[Byte]): Unit = {
      val tmp = Files.createTempFile(dir, ".publish-", ".tmp")
      Files.write(tmp, content)
      try Files.createLink(dir.resolve(name), tmp)
      finally Files.deleteIfExists(tmp)
    }
  }
}

/** A minimal transactional table log — the Delta-style commit
  * protocol (Armbrust et al., "Delta Lake: High-Performance ACID
  * Table Storage over Cloud Object Stores", VLDB 2020) hand-rolled
  * over plain parquet + the local filesystem's atomic rename, so the
  * [[graft.streaming.StreamingOps.UpsertStateStore]] seam can commit
  * through a REAL log instead of the per-bucket bid bookkeeping
  * (SURVEY §8a's "what a format replaces" row, made concrete without
  * adding a dependency).
  *
  * Layout:
  * {{{
  *   table/
  *     data/<uuid>.parquet     — immutable data files
  *     _txlog/00000000000000000001.json  — one entry per commit
  * }}}
  *
  * Each log entry is one line-oriented record listing files ADDED and
  * files REMOVED by the commit, plus an optional idempotence token
  * (`txn` = the streaming batch id). A snapshot at version V is the
  * fold of entries 1..V: files added and not yet removed. Readers
  * list the log (metadata-only), then scan exactly the live files —
  * uncommitted data files are INVISIBLE by construction, which is
  * what makes a multi-file commit atomic.
  *
  * Commit protocol (optimistic concurrency, the paper's §3.2): write
  * data files, then try to RENAME a temp entry to the next version
  * number — rename is atomic and fails if the name exists, so exactly
  * one of two racing writers wins version V; the loser re-reads the
  * log (its snapshot moved) and retries at V+1. On a real object
  * store the atomic-rename step is the piece a commit service or
  * conditional put provides — everything else here carries over.
  *
  * Determinism note: data-file NAMES are uuids and never enter any
  * result; every read returns rows, not files. */
final class TxLogTable(root: String,
    publisher: LogPublisher = LogPublisher.HardLink,
    checkpointInterval: Long = TxLogTable.DefaultCheckpointInterval) {
  require(checkpointInterval >= 1,
    s"checkpointInterval must be >= 1, got $checkpointInterval")
  private val logDir = Paths.get(root, "_txlog")
  private val dataDir = Paths.get(root, "data")

  private def entryName(v: Long): String = f"$v%020d.json"
  private def ckptName(v: Long): String = f"$v%020d.checkpoint.json"

  // directory streams MUST close (round-13 ADVICE): each open stream
  // holds a directory fd until GC — a long-running streaming ingest
  // listing the log per batch leaks fds without this
  private def withList[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }
  private def withWalk[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  private val EntryRe = """(\d{20})\.json""".r
  private val CkptRe = """(\d{20})\.checkpoint\.json""".r

  private def listVersions(): Seq[Long] =
    if (!Files.isDirectory(logDir)) Seq.empty
    else withList(logDir)(_.map(_.getFileName.toString)
      .collect { case EntryRe(v) => v.toLong }
      .toSeq.sorted)

  private def listCheckpoints(): Seq[Long] =
    if (!Files.isDirectory(logDir)) Seq.empty
    else withList(logDir)(_.map(_.getFileName.toString)
      .collect { case CkptRe(v) => v.toLong }
      .toSeq.sorted)

  /** Latest committed version; 0 = empty table. */
  def currentVersion(): Long = listVersions().lastOption.getOrElse(0L)

  // entry encoding: tiny hand-rolled JSON (we control both ends; file
  // names are uuid-hex + ".parquet", txn is a long, stats rows are
  // pipe-delimited "<file>|<col>|<lo>|<hi>" over identifier column
  // names — nothing needs escaping)
  private def encode(add: Seq[String], remove: Seq[String],
      txn: Option[Long], stats: Seq[String] = Seq.empty,
      blooms: Seq[String] = Seq.empty, ts: Long = -1L,
      schemaDdl: Option[String] = None): String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"")
      .mkString("[", ",", "]")
    val t = txn.map(v => s""","txn":$v""").getOrElse("")
    val st = if (stats.isEmpty) "" else s""","stats":${arr(stats)}"""
    val bl = if (blooms.isEmpty) "" else s""","blooms":${arr(blooms)}"""
    val tm = if (ts < 0L) "" else s""","ts":$ts"""
    // StructType.toDDL: backquoted identifiers + SQL type names —
    // never a double quote or ']' in practice, so the regex parse
    // below holds; a pathological quoted column name fails LOUDLY
    // here instead of corrupting the log entry
    val sc = schemaDdl.map { d =>
      require(!d.contains("\""),
        s"schema DDL must not contain a double quote: $d")
      s""","schema":"$d""""
    }.getOrElse("")
    s"""{"add":${arr(add)},"remove":${arr(remove)}$t$st$bl$tm$sc}"""
  }

  private val AddRe = """"add":\[([^\]]*)\]""".r.unanchored
  private val RemRe = """"remove":\[([^\]]*)\]""".r.unanchored
  private val TxnRe = """"txn":(-?\d+)""".r.unanchored
  private val StatsRe = """"stats":\[([^\]]*)\]""".r.unanchored
  private val BloomsRe = """"blooms":\[([^\]]*)\]""".r.unanchored
  private val TsRe = """"ts":(\d+)""".r.unanchored
  private val SchemaRe = """"schema":"([^"]*)"""".r.unanchored

  private def names(group: String): Seq[String] =
    if (group.isEmpty) Seq.empty
    else group.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))

  private def readEntry(v: Long): (Seq[String], Seq[String], Option[Long],
      Seq[String], Seq[String], Option[Long], Option[String]) = {
    val s = new String(
      Files.readAllBytes(logDir.resolve(entryName(v))),
      StandardCharsets.UTF_8)
    val add = s match { case AddRe(g) => names(g); case _ => Seq.empty }
    val rem = s match { case RemRe(g) => names(g); case _ => Seq.empty }
    val txn = s match { case TxnRe(t) => Some(t.toLong); case _ => None }
    val st = s match { case StatsRe(g) => names(g); case _ => Seq.empty }
    val bl = s match { case BloomsRe(g) => names(g); case _ => Seq.empty }
    val ts = s match { case TsRe(t) => Some(t.toLong); case _ => None }
    val sc = s match { case SchemaRe(d) => Some(d); case _ => None }
    (add, rem, txn, st, bl, ts, sc)
  }

  /** Parse "<file>|<col>|<lo>|<hi>" stats rows into the per-file
    * per-column envelope map. */
  private def parseStats(rows: Seq[String])
      : Map[String, Map[String, (Long, Long)]] =
    rows.flatMap { r =>
      r.split('|') match {
        case Array(f, c, lo, hi) => Some((f, c, lo.toLong, hi.toLong))
        case _ => None
      }
    }.groupBy(_._1).map { case (f, xs) =>
      f -> xs.map(x => x._2 -> (x._3, x._4)).toMap
    }

  private def statsRows(m: Map[String, Map[String, (Long, Long)]])
      : Seq[String] =
    m.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
        s"$f|$c|$lo|$hi" }
    }

  /** Parse "<file>|<col>|<mBits>|<i>:<word>;..." bloom rows (round
    * 18) into file → column → (m, sparse word map). Word indexes are
    * sparse: an absent word is all-zero. */
  private def parseBlooms(rows: Seq[String])
      : Map[String, Map[String, (Long, Map[Int, Long])]] =
    rows.flatMap { r =>
      r.split('|') match {
        case Array(f, c, m, ws) =>
          val words = ws.split(';').filter(_.nonEmpty).flatMap { p =>
            p.split(':') match {
              case Array(i, w) => Some(i.toInt -> w.toLong)
              case _ => None
            }
          }.toMap
          Some((f, c, m.toLong, words))
        case Array(f, c, m) => // a saturated-empty or no-word bloom
          Some((f, c, m.toLong, Map.empty[Int, Long]))
        case _ => None
      }
    }.groupBy(_._1).map { case (f, xs) =>
      f -> xs.map(x => x._2 -> ((x._3, x._4))).toMap
    }

  private def bloomRows(
      m: Map[String, Map[String, (Long, Map[Int, Long])]]): Seq[String] =
    m.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, (mBits, words)) =>
        val ws = words.toSeq.sorted.map { case (i, w) => s"$i:$w" }
          .mkString(";")
        s"$f|$c|$mBits|$ws"
      }
    }

  // ---- checkpoint compaction (round 13) ------------------------------
  // Without it every snapshot/commit re-folded the ENTIRE log —
  // unbounded-commit streams degrade O(commits²) in driver metadata IO
  // (Delta's answer, §3.3 of the paper: a periodic checkpoint entry +
  // a _last_checkpoint pointer). Every `checkpointInterval`-th commit
  // writes the full folded state (live files + txn tokens) as
  // <v>.checkpoint.json; readers fold only entries PAST the newest
  // checkpoint ≤ their version, so snapshot read cost is bounded by
  // the interval regardless of table history, and entries at or below
  // a checkpoint can be retention-deleted without losing current
  // state (time travel below the oldest surviving checkpoint then
  // degrades, exactly as a vacuumed Delta log does). The pointer file
  // is a plain-overwrite HINT (readers derive the newest checkpoint
  // from the same listing that finds the entries, so a stale or
  // missing pointer is harmless — Delta tolerates the same).

  private val LiveRe = """"live":\[([^\]]*)\]""".r.unanchored
  private val TxnsRe = """"txns":\[([^\]]*)\]""".r.unanchored
  private val FStatsRe = """"fstats":\[([^\]]*)\]""".r.unanchored

  private val FBloomsRe = """"fblooms":\[([^\]]*)\]""".r.unanchored

  private def readCheckpoint(v: Long)
      : (Seq[String], Set[Long], Seq[String], Seq[String], Option[String]) = {
    val s = new String(
      Files.readAllBytes(logDir.resolve(ckptName(v))),
      StandardCharsets.UTF_8)
    val live = s match { case LiveRe(g) => names(g); case _ => Seq.empty }
    val txns = s match {
      case TxnsRe(g) if g.nonEmpty => g.split(",").map(_.trim.toLong).toSet
      case _ => Set.empty[Long]
    }
    val st = s match { case FStatsRe(g) => names(g); case _ => Seq.empty }
    val bl = s match { case FBloomsRe(g) => names(g); case _ => Seq.empty }
    val sc = s match { case SchemaRe(d) => Some(d); case _ => None }
    (live, txns, st, bl, sc)
  }

  private def writeCheckpoint(v: Long): Unit = {
    val (live, txns, fstats, fblooms, schemaDdl) = foldStateFull(v)
    val stArr = statsRows(fstats).map(x => "\"" + x + "\"")
      .mkString("[", ",", "]")
    val blArr = bloomRows(fblooms).map(x => "\"" + x + "\"")
      .mkString("[", ",", "]")
    val scPart = schemaDdl.map(d => s""","schema":"$d"""").getOrElse("")
    val body = s"""{"live":${live.map(x => "\"" + x + "\"")
        .mkString("[", ",", "]")},"txns":${txns.toSeq.sorted
        .mkString("[", ",", "]")},"fstats":$stArr,"fblooms":$blArr$scPart}"""
      .getBytes(StandardCharsets.UTF_8)
    // two committers can both reach a checkpoint version on their
    // retry paths: the fold at v is deterministic, so the content is
    // identical and a REPLACE move is race-safe
    val tmp = Files.createTempFile(logDir, ".ckpt-", ".tmp")
    Files.write(tmp, body)
    Files.move(tmp, logDir.resolve(ckptName(v)),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val ptr = Files.createTempFile(logDir, ".ptr-", ".tmp")
    Files.write(ptr, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(ptr, logDir.resolve("_last_checkpoint"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // latest-state fold memo: (folded version, live, txns) — a
  // long-running ingest calls txns()/liveFiles() several times per
  // batch; re-folding is pure, so caching on the observed version is
  // safe across instances (round-13 ADVICE)
  @volatile private var memo: Option[(Long, Seq[String], Set[Long],
    Map[String, Map[String, (Long, Long)]],
    Map[String, Map[String, (Long, Map[Int, Long])]],
    Option[String])] = None

  /** Fold of checkpoint + subsequent entries up to `version`.
    * Throws if `version` is no longer reconstructible: after
    * retention deletes entries at/below a checkpoint, a request for a
    * version whose entries are gone and that no checkpoint serves must
    * FAIL, not silently answer from the nearest older checkpoint with
    * stale state (round-14 ADVICE — Delta raises VersionNotFound for
    * the same gap). */
  private def foldState(version: Long): (Seq[String], Set[Long]) = {
    val (l, t, _, _, _) = foldStateFull(version)
    (l, t)
  }

  private def foldStateFull(version: Long): (Seq[String], Set[Long],
      Map[String, Map[String, (Long, Long)]],
      Map[String, Map[String, (Long, Map[Int, Long])]],
      Option[String]) = {
    val all = listVersions()
    val vs = all.takeWhile(_ <= version)
    val latest = vs.lastOption.getOrElse(0L)
    memo match {
      case Some((v, l, t, st, bl, sc)) if v == latest && latest >= version =>
        return (l, t, st, bl, sc)
      case Some((v, l, t, st, bl, sc)) if v == latest
          && version == Long.MaxValue =>
        return (l, t, st, bl, sc)
      case _ => ()
    }
    val ck = listCheckpoints().filter(_ <= version).lastOption
    // reconstructibility gate: every entry in (checkpoint, target]
    // must still exist (versions are contiguous by the commit
    // protocol, so any hole is retention damage, not a skipped number)
    val target =
      if (version == Long.MaxValue) latest
      else math.min(version, all.lastOption.getOrElse(0L))
    val base = ck.getOrElse(0L)
    if (target > base) {
      val have = vs.filter(_ > base).toSet
      val missing = (base + 1 to target).filterNot(have.contains)
      if (missing.nonEmpty) throw new IllegalStateException(
        s"version $version is not reconstructible: log entries " +
        s"${missing.mkString(",")} were retention-deleted and no " +
        s"checkpoint at or above ${missing.max} survives")
    }
    val (live0, txns0, st0, bl0, sc0) = ck.map(readCheckpoint)
      .getOrElse((Seq.empty[String], Set.empty[Long], Seq.empty[String],
        Seq.empty[String], None))
    val live = collection.mutable.LinkedHashSet(live0: _*)
    var txns = txns0
    // per-live-file column envelopes from add entries (Delta's
    // add-entry stats): removed files drop their stats with them
    var fstats = parseStats(st0)
    var fblooms = parseBlooms(bl0)
    // table schema = latest schema-carrying entry at or below the
    // version (Delta's metaData action): absent on pre-evolution
    // tables, where reads fall back to parquet's first-file schema
    var schemaDdl = sc0
    vs.filter(v => ck.forall(_ < v)).foreach { v =>
      val (add, rem, txn, st, bl, _, sc) = readEntry(v)
      rem.foreach { f => live -= f; fstats -= f; fblooms -= f }
      live ++= add
      fstats ++= parseStats(st)
      fblooms ++= parseBlooms(bl)
      txn.foreach(t => txns += t)
      sc.foreach(d => schemaDdl = Some(d))
    }
    val out = (live.toSeq, txns, fstats, fblooms, schemaDdl)
    // memoize only full-log folds: after retention deletes a prefix,
    // a truncated `vs` can be empty for a checkpoint-served version,
    // and keying the memo at its (zero) last entry would poison later
    // lookups for genuinely-empty folds
    if (version >= all.lastOption.getOrElse(0L))
      memo = Some((latest, out._1, out._2, out._3, out._4, out._5))
    out
  }

  /** Per-file column envelopes recorded in the log at `version` —
    * files committed without stats are simply absent. */
  def fileStats(version: Long = Long.MaxValue)
      : Map[String, Map[String, (Long, Long)]] = foldStateFull(version)._3

  /** The live data files at `version` (default: current) — the
    * checkpoint-bounded fold of the log, metadata-only. */
  def liveFiles(version: Long = Long.MaxValue): Seq[String] =
    foldState(version)._1

  /** Every idempotence token recorded up to `version`. */
  def txns(version: Long = Long.MaxValue): Set[Long] =
    foldState(version)._2

  /** The table schema recorded IN THE LOG at `version` (Delta's
    * metaData action, round 19): set by [[alterAddColumn]] or an
    * evolving [[merge]]; None on a table that never evolved, where
    * reads fall back to parquet's first-file schema. Schema-on-read:
    * files written BEFORE a column was added simply lack it, and
    * every read face projects them to the log schema with nulls for
    * the absent columns — no rewrite at ALTER time, the only answer
    * at 100 TB. */
  def tableSchema(version: Long = Long.MaxValue)
      : Option[org.apache.spark.sql.types.StructType] =
    foldStateFull(version)._5
      .map(org.apache.spark.sql.types.StructType.fromDDL)

  /** Schema-aware file read — EVERY bulk read of committed files
    * funnels here: with a log-recorded schema the read pins it
    * explicitly (old files yield nulls for later-added columns; a
    * raw read would take the FIRST file's schema and silently drop
    * newer columns depending on read order), without one it is a
    * plain parquet read. */
  private def readFiles(spark: SparkSession, files: Seq[String],
      version: Long = Long.MaxValue): DataFrame = {
    val paths = files.map(f => dataDir.resolve(f).toString)
    tableSchema(version) match {
      case Some(st) => spark.read.schema(st).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  /** Snapshot read (optionally time-traveled to `version`); None on
    * an empty table. Cost: list the log + scan exactly the live
    * files. */
  def snapshot(spark: SparkSession,
      version: Long = Long.MaxValue): Option[DataFrame] = {
    val files = liveFiles(version)
    if (files.isEmpty) None
    else Some(readFiles(spark, files, version))
  }

  // ---- timestamp-addressed time travel (round 19, r16 verdict #2) --
  // a user's first time-travel query is `TIMESTAMP AS OF` ("the table
  // as of yesterday 09:00"), not a version number. Each commit entry
  // records a timestamp IN ITS BODY — replay-stable (a copied or
  // restored log keeps its history; file mtimes would not survive
  // either) and MONOTONE by construction: the committer takes
  // max(now, predecessor ts + 1), so a clock stepping backwards
  // between commits can never make a later version look earlier
  // (Delta's in-commit-timestamp discipline). Resolution degrades
  // below the oldest surviving entry exactly like version-addressed
  // travel does after retention.

  /** The commit timestamp (epoch millis) recorded in entry `v`; None
    * for pre-round-19 entries, which carry no timestamp. */
  def commitTimestamp(v: Long): Option[Long] = {
    val c = tsCache.get(v)
    if (c != null) c
    else {
      val t = readEntry(v)._6
      tsCache.put(v, t)
      t
    }
  }
  private val tsCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Option[Long]]()

  /** Resolve a wall-clock instant to the LATEST version committed at
    * or before it — the `TIMESTAMP AS OF` helper every read face
    * composes with (`snapshotWhere(spark, ranges, versionAt(ts))`).
    * Entries without a recorded timestamp (pre-round-19) inherit
    * their predecessor's (0 for the first) — monotone, and an
    * all-legacy log resolves everything to its newest version, the
    * only defensible reading of an undated history. Throws when `ts`
    * predates the first SURVIVING entry's timestamp: answering from a
    * later state would silently time-travel forwards. The loud throw
    * is only as sharp as the first entry's stamp — an UNDATED first
    * entry inherits 0, so on a mixed legacy/dated log any ts ≥ 0
    * resolves into the undated prefix instead of throwing (the
    * prefix's age is unknown; absorbing pre-history instants there is
    * the same inheritance rule, not a hole — only fully-dated logs
    * can police their left edge). */
  def versionAt(ts: Long): Long = {
    val vs = listVersions()
    require(vs.nonEmpty, "versionAt on an empty table")
    var last = 0L   // running ts: legacy entries inherit predecessor
    var ans = -1L
    val first = commitTimestamp(vs.head).getOrElse(0L)
    if (ts < first) throw new IllegalArgumentException(
      s"timestamp $ts predates the first surviving commit ($first); " +
        "earlier history was retention-deleted or never existed")
    vs.foreach { v =>
      last = commitTimestamp(v).getOrElse(last)
      if (last <= ts) ans = v
    }
    ans
  }

  /** `SELECT ... TIMESTAMP AS OF` — [[snapshot]] at [[versionAt]]. */
  def snapshotAt(spark: SparkSession, ts: Long): Option[DataFrame] =
    snapshot(spark, versionAt(ts))

  /** `RESTORE TABLE ... TO VERSION AS OF` (round 19) — roll the table
    * back to `toVersion` as a NEW commit, never by rewriting history:
    * the restore entry re-adds exactly the files live at the target
    * that are no longer live, removes the files added since, and
    * re-records the target's per-file stats + bloom envelopes (the
    * fold drops them with the remove, so the entry must carry them
    * back) and the target's schema. History stays intact — the bad
    * versions remain time-travelable, and a second restore can undo
    * the first. Metadata-only when the target's files survive on
    * disk; throws loudly when VACUUM already reclaimed one (the same
    * retention boundary version-addressed time travel has). Aborts
    * (None) on any concurrent commit — a restore is a statement about
    * the CURRENT state, so it must not rebase over a racer. */
  def restore(spark: SparkSession, toVersion: Long,
      txn: Option[Long] = None): Option[Long] = {
    val v0 = currentVersion()
    require(toVersion <= v0, s"restore target $toVersion is in the " +
      s"future (current $v0)")
    if (txn.exists(txns(v0).contains)) return None
    val (oldLive, _, oldStats, oldBlooms, oldSchema) =
      foldStateFull(toVersion)
    val curLive = liveFiles(v0)
    val adds = oldLive.filterNot(curLive.toSet)
    val removes = curLive.filterNot(oldLive.toSet)
    // the target's schema, pinned EXPLICITLY: a restore below an
    // ALTER must narrow tableSchema back, and the fold cannot unset —
    // a pre-evolution target (None) pins its parquet birth schema.
    // The DECISION is made before the no-op check (a metadata-only
    // rollback — same files, only an ALTER since — must still commit
    // the reversal), but the parquet derivation waits until AFTER the
    // vacuumed-file gate: every oldLive file is either in `adds`
    // (checked below) or still live (never vacuumed), so the read is
    // safe there and a reclaimed target fails with the loud
    // IllegalStateException, not a raw path error.
    val curSchema = foldStateFull(v0)._5
    val schemaDiffers = oldSchema != curSchema && oldLive.nonEmpty
    if (adds.isEmpty && removes.isEmpty && !schemaDiffers) return None
    adds.filterNot(f => Files.exists(dataDir.resolve(f))) match {
      case Seq() => ()
      case gone => throw new IllegalStateException(
        s"version $toVersion is not restorable: data file(s) " +
        s"${gone.take(3).mkString(",")} were vacuumed")
    }
    val targetDdl: Option[String] =
      if (!schemaDiffers) None
      else oldSchema.orElse(Some(spark.read
        .parquet(dataDir.resolve(oldLive.head).toString).schema.toDDL))
    val addSet = adds.toSet
    val v = commit(adds, removes, txn, rebase = _ => None,
      readVersion = v0,
      stats = oldStats.filter { case (f, _) => addSet.contains(f) },
      blooms = oldBlooms.filter { case (f, _) => addSet.contains(f) },
      schemaDdl = () => targetDdl)
    if (v < 0L) None else Some(v)
  }

  /** Row-level CHANGE DATA FEED between two versions (round 19 —
    * Delta CDF's read face, derived instead of stored): every row in
    * `(vFrom, vTo]`'s churn tagged `_change_type` insert | delete
    * (an update surfaces as delete + insert — whole-row replacement,
    * [[merge]]'s own semantics). Because data files are immutable,
    * rows in files live at BOTH versions cancel by construction, so
    * the diff reads ONLY the symmetric difference of the live sets —
    * CDC cost is proportional to the CHURN, never the table: a
    * 2-file delete on a 100k-file table reads a handful of files,
    * where a naive snapshot-vs-snapshot EXCEPT scans both full
    * snapshots. The multiset `exceptAll` keeps duplicate-row
    * arithmetic exact; both sides read under `vTo`'s schema (older
    * files project with nulls). None when nothing changed. */
  def tableChanges(spark: SparkSession, vFrom: Long, vTo: Long)
      : Option[DataFrame] = {
    require(vFrom <= vTo,
      s"tableChanges wants vFrom <= vTo, got $vFrom > $vTo")
    val from = liveFiles(vFrom).toSet
    val to = liveFiles(vTo).toSet
    val addedF = (to -- from).toSeq.sorted
    val removedF = (from -- to).toSeq.sorted
    if (addedF.isEmpty && removedF.isEmpty) return None
    def side(fs: Seq[String], other: Seq[String]): DataFrame =
      if (fs.nonEmpty) readFiles(spark, fs, vTo)
      else readFiles(spark, other, vTo).limit(0)
    val post = side(addedF, removedF)
    val pre = side(removedF, addedF)
    import org.apache.spark.sql.functions.lit
    Some(post.exceptAll(pre)
        .withColumn("_change_type", lit("insert"))
      .unionByName(pre.exceptAll(post)
        .withColumn("_change_type", lit("delete"))))
  }

  /** [[tableChanges]] with per-version ATTRIBUTION (round 19 —
    * Delta CDF's `_commit_version`/`_commit_timestamp` columns):
    * one symmetric-difference diff PER version in `(vFrom, vTo]`,
    * each tagged with the version that made the change and its
    * recorded commit timestamp (null for pre-timestamp legacy
    * entries). Where the interval face nets out churn that was later
    * undone, this face reports every intermediate change — the audit
    * / debugging read ("who deleted this row, and when"). Cost is
    * the union of the per-version churns; disjoint churn reads the
    * same files the interval face would, overlapping churn re-reads
    * the overlap once per touching version. None when no version in
    * the interval changed a row. */
  def tableChangesByVersion(spark: SparkSession, vFrom: Long,
      vTo: Long): Option[DataFrame] = {
    import org.apache.spark.sql.functions.lit
    require(vFrom <= vTo,
      s"tableChangesByVersion wants vFrom <= vTo, got $vFrom > $vTo")
    val steps = ((vFrom + 1) to vTo).flatMap { v =>
      tableChanges(spark, v - 1, v).map(
        _.withColumn("_commit_version", lit(v))
          .withColumn("_commit_timestamp", commitTimestamp(v)
            .map(lit(_)).getOrElse(lit(null).cast("long"))))
    }
    steps.reduceOption(_ unionByName _)
  }

  /** Publish committed ADDED files into an append-only SPOOL
    * directory — the `readStream` projection (round 19, the missing
    * Delta read face): Spark's built-in file-stream source tails a
    * directory with checkpointed exactly-once file tracking, but
    * pointing it at `data/` would observe uncommitted (pre-entry)
    * files; the spool instead receives a file only AFTER its commit
    * entry exists, via HARDLINK — the name appears atomically, and
    * the linked inode survives a later VACUUM of the source (a slow
    * stream consumer can never lose bytes it has not read yet).
    * `spark.readStream.schema(s).parquet(spoolDir)` is then a true
    * transactional tail. Idempotent and cheap to poll: each call
    * links the window's added files once (existing link = already
    * published) and returns the version the spool now reflects —
    * feed it back as `fromVersion` next poll. Deletes and rewrites
    * do NOT retract spooled files: the spool is the append-only
    * CHANGE-ARRIVAL projection (Delta readStream's `ignoreDeletes`
    * contract — exactly what a downstream ingest stream wants; a
    * consumer needing retractions reads [[tableChanges]] instead).
    * A consumer older than log retention bootstraps the current
    * live set (the trimmed increments are unrecoverable as
    * increments); an added file that was itself already vacuumed is
    * skipped — its arrival is unrecoverable. */
  def spoolTail(spoolDir: String, fromVersion: Long = 0L): Long = {
    val sp = Paths.get(spoolDir)
    Files.createDirectories(sp)
    val cur = currentVersion()
    if (cur <= fromVersion) return cur
    val vs = listVersions().filter(v => v > fromVersion && v <= cur)
    val trimmed = vs.size.toLong != cur - fromVersion
    val arrivals =
      (if (trimmed) liveFiles(cur) else Seq.empty[String]) ++
        vs.flatMap(readEntry(_)._1)
    arrivals.distinct.foreach { f =>
      val src = dataDir.resolve(f)
      val target = sp.resolve(f)
      if (!Files.exists(target) && Files.exists(src))
        try Files.createLink(target, src)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    cur
  }

  /** Shared scaffolding of the two metadata-only ALTERs: derive the
    * current schema (log-recorded outranks first-file), apply
    * `transform` (None = the alter's precondition no longer holds),
    * commit the result with a rebase that RE-DERIVES against any
    * racer's state — so every guard inside `transform` (existence,
    * tombstones, last-column) re-runs on the retry path too, the
    * same discipline merge's rebase follows. A racer that made the
    * alter a no-op aborts (None); one that made it IMPOSSIBLE (a
    * require inside transform) fails loudly out of the retry loop. */
  private def alterSchema(spark: SparkSession, noopMsg: => String)(
      transform: org.apache.spark.sql.types.StructType
        => Option[org.apache.spark.sql.types.StructType])
      : Option[Long] = {
    def next(): Option[String] = {
      val cur = tableSchema().orElse {
        val live = liveFiles()
        if (live.isEmpty) None
        else Some(spark.read
          .parquet(dataDir.resolve(live.head).toString).schema)
      }.getOrElse(throw new IllegalStateException(
        "schema ALTER on an empty, schema-less table — the first " +
          "write defines the schema"))
      transform(cur).map(_.toDDL)
    }
    val w0 = next().getOrElse(
      throw new IllegalArgumentException(noopMsg))
    val v0 = currentVersion()
    var w = w0
    val v = commit(Nil, Nil, txn = None, rebase = _ =>
      next() match {
        case Some(d) => w = d; Some((Nil, Nil))
        case None => None
      },
      readVersion = v0, schemaDdl = () => Some(w))
    if (v < 0L) None else Some(v)
  }

  /** ALTER TABLE ADD COLUMN — records the WIDENED schema as a log
    * entry (no data movement: old files simply lack the column and
    * every read projects them with nulls — schema-on-read, round 19).
    * `columnDdl` is one `name TYPE` DDL fragment. Returns the commit
    * version; a concurrent identical ALTER aborts (None). Name
    * matching is CASE-INSENSITIVE, like Spark's default parquet
    * resolution — both for "already exists" and for the tombstone
    * guard (re-adding a dropped name in different case would
    * resurrect the stale values just the same). */
  def alterAddColumn(spark: SparkSession, columnDdl: String)
      : Option[Long] = {
    import org.apache.spark.sql.types.StructType
    val added = StructType.fromDDL(columnDdl)
    require(added.fields.length == 1,
      s"one column per ALTER, got: $columnDdl")
    val name = added.fields.head.name
    alterSchema(spark, s"column $name already exists") { cur =>
      // inside the transform ⇒ re-checked on every rebase retry: a
      // racer that added-then-dropped the name mid-flight cannot
      // sneak a resurrection past a stale first check
      require(!tombstonedColumns(spark).contains(name.toLowerCase),
        s"column $name was previously dropped; re-adding it would " +
          "resurrect stale values from pre-drop files (restore " +
          "below the drop to bring schema AND values back, or use " +
          "a new name)")
      if (cur.fieldNames.exists(_.equalsIgnoreCase(name))) None
      else Some(StructType(cur.fields :+ added.fields.head))
    }
  }

  /** Columns that were ever in a RECORDED schema but are absent from
    * the current one — the RESURRECTION guard behind
    * [[alterDropColumn]] (round 19): a dropped column's values still
    * sit in the old parquet files (schema-on-read never rewrites),
    * so re-ADDing the same name would silently resurrect stale data
    * where the user expects nulls — the hazard Delta's column
    * mapping exists to solve. Without mapping ids the honest answer
    * is to REFUSE the re-add. Derived from surviving schema history
    * (latest checkpoint's schema + every surviving entry's), no
    * extra persistence: [[restore]] below the drop re-records the
    * wider schema, putting the name back in the CURRENT set and
    * thereby legitimately un-tombstoning it (restore resurrects the
    * values on purpose). Two sources, both needed: recorded schema
    * history (catches columns whose files were since rewritten) AND
    * the PHYSICAL union of live-file schemas via one mergeSchema
    * read (catches a drop on a never-evolved table, whose pre-drop
    * schema was never recorded, and survives retention-trimmed
    * history — stale bytes in a live file ARE the hazard, whatever
    * the log remembers). Metadata-only: footer reads, no data pages;
    * runs only on the rare ALTER/evolve paths, and short-circuits to
    * empty on a never-evolved table (a DROP always records a schema,
    * so no recorded schema ⇒ no drop ever ⇒ no tombstones — no
    * footer sweep on the first ALTER of a 100k-file table). Names
    * are returned LOWERCASED: Spark's default parquet resolution is
    * case-insensitive, so a different-case re-add would resurrect
    * just the same — compare with `name.toLowerCase`. */
  private def tombstonedColumns(spark: SparkSession): Set[String] = {
    import org.apache.spark.sql.types.StructType
    val cur0 = tableSchema()
    if (cur0.isEmpty) return Set.empty
    val ckSc = listCheckpoints().lastOption
      .flatMap(readCheckpoint(_)._5)
    val hist = ckSc.toSeq ++ listVersions().flatMap(v => readEntry(v)._7)
    val live = liveFiles()
    val physical: Set[String] =
      if (live.isEmpty) Set.empty
      else spark.read.option("mergeSchema", "true")
        .parquet(live.map(f => dataDir.resolve(f).toString): _*)
        .schema.fieldNames.map(_.toLowerCase).toSet
    val cur = cur0.get.fieldNames.map(_.toLowerCase).toSet
    (hist.flatMap(d => StructType.fromDDL(d).fieldNames)
      .map(_.toLowerCase).toSet ++ physical) -- cur
  }

  /** ALTER TABLE DROP COLUMN (round 19) — metadata-only like
    * [[alterAddColumn]]: records the NARROWED schema, every read
    * projects it (parquet simply stops reading the column's pages —
    * no rewrite at any scale), time travel below the entry still
    * shows the column. The dropped name becomes a TOMBSTONE: a later
    * re-add (ALTER or evolving merge) is refused because old files
    * still carry the stale values ([[tombstonedColumns]]); a
    * [[restore]] below the drop legitimately resurrects both schema
    * and values. Aborts (None) when a racer already dropped it; a
    * racer that made the drop IMPOSSIBLE (only one column left)
    * fails loudly. Case-insensitive, like the rest of the faces. */
  def alterDropColumn(spark: SparkSession, name: String)
      : Option[Long] = {
    import org.apache.spark.sql.types.StructType
    alterSchema(spark, s"no such column: $name") { cur =>
      if (!cur.fieldNames.exists(_.equalsIgnoreCase(name))) None
      else {
        require(cur.fields.length > 1,
          s"cannot drop the last column ($name)")
        Some(StructType(cur.fields
          .filterNot(_.name.equalsIgnoreCase(name))))
      }
    }
  }

  /** Per-file [min, max] envelope of an integral top-level column,
    * read from the parquet FOOTER — the stats [[optimizeZorder]]'s
    * clustered write makes quadrant-tight (and any write makes
    * truthful). Metadata-only: a footer read opens no data pages.
    * None when any row group lacks usable stats for the column — the
    * caller must then treat the file as possibly-matching.
    *
    * MEMOIZED per (file, column): data files are immutable once
    * committed, so a footer envelope never changes — without the
    * cache every [[pruneLiveFiles]]/[[snapshotWhereIn]] call pays
    * O(stats-free live files) driver IO (pre-round-17 tables carry
    * no add-entry stats at all). An UNREADABLE footer degrades to
    * None = "keep the file" (cached too): the skipping contract
    * allows keeping any file, so one corrupt footer must not fail
    * the whole prune. */
  private val footerCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Option[(Long, Long)]]()

  private[graft] def footerRange(spark: SparkSession, file: String,
      column: String): Option[(Long, Long)] = {
    val k = (file, column)
    val cached = footerCache.get(k)
    if (cached != null) cached
    else scala.util.Try(footerRangeUncached(spark, file, column)) match {
      // only a SUCCESSFUL read is a fact about the immutable file —
      // cache it (None included: "no usable stats" is definitive).
      // A thrown read may be a transient FS blip: degrade to
      // keep-the-file for THIS call without pinning the file as
      // unprunable for the instance's lifetime.
      case scala.util.Success(v) => footerCache.put(k, v); v
      case scala.util.Failure(_) => None
    }
  }

  private def footerRangeUncached(spark: SparkSession, file: String,
      column: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(dataDir.resolve(file).toString),
        conf))
    try {
      val rngs = rd.getFooter.getBlocks.asScala.toSeq.map { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .flatMap { c =>
            val st = c.getStatistics
            (Option(st).filter(_.hasNonNullValue)
              .map(s => (s.genericGetMin, s.genericGetMax)) match {
              case Some((mn: Number, mx: Number)) =>
                Some((mn.longValue, mx.longValue))
              case _ => None
            })
          }
      }
      if (rngs.isEmpty || rngs.exists(_.isEmpty)) None
      else Some((rngs.flatten.map(_._1).min, rngs.flatten.map(_._2).max))
    } finally rd.close()
  }

  /** The live files at `version` that can POSSIBLY satisfy every
    * inclusive range in `ranges` (`(column, lo, hi)` conjuncts over
    * integral columns), judged by footer envelopes — plus the live
    * count, so callers can observe the skip rate. A file is kept
    * unless some conjunct's envelope provably misses it; missing
    * stats keep the file (skipping may only ever drop certain
    * non-matches — no false negative by construction). */
  def pruneLiveFiles(spark: SparkSession,
      ranges: Seq[(String, Long, Long)],
      version: Long = Long.MaxValue): (Seq[String], Int) = {
    // prefer envelopes recorded IN THE LOG at commit time (Delta's
    // add-entry stats, round 17): pruning then folds metadata the
    // reader already holds — zero per-file footer round trips for
    // stats-carrying files; footer envelopes remain the fallback for
    // files committed without stats
    val (live, _, fstats, _, _) = foldStateFull(version)
    val kept = live.filter { f =>
      ranges.forall { case (c, lo, hi) =>
        fstats.get(f).flatMap(_.get(c))
          .orElse(footerRange(spark, f, c)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }
    (kept, live.size)
  }

  /** [[snapshot]] with scan-side FILE SKIPPING — the read that makes
    * [[optimizeZorder]]'s clustering pay off: list the log, prune the
    * live-file list against the footer envelopes, scan only what
    * survives. Returns a SUPERSET of the rows matching `ranges`
    * (exactly a format's data-skipping contract) — the caller still
    * applies the actual predicate; the spec proves pruned-then-
    * filtered ≡ unpruned-then-filtered and that a zordered layout
    * opens strictly fewer files than a linear one on a quadrant
    * query. None when no live file can match (or the table is
    * empty) — the provably-empty result. */
  def snapshotWhere(spark: SparkSession,
      ranges: Seq[(String, Long, Long)],
      version: Long = Long.MaxValue): Option[DataFrame] = {
    val (kept, _) = pruneLiveFiles(spark, ranges, version)
    if (kept.isEmpty) None
    else Some(readFiles(spark, kept, version))
  }

  /** [[snapshotWhere]] for an IN-list predicate over an integral
    * column — a file is kept iff its envelope contains SOME listed
    * value (a sparse bucket set {2, 30} prunes tighter than the
    * [2, 30] range). Same superset contract and stats-over-footer
    * preference; `(kept, total)` observability via the second
    * return. An EMPTY `values` list is the provably-empty predicate:
    * every enveloped file prunes (stats-free files are still kept —
    * the no-false-negative rule outranks the empty list). */
  def snapshotWhereIn(spark: SparkSession, column: String,
      values: Seq[Long], version: Long = Long.MaxValue)
      : (Option[DataFrame], Int, Int) = {
    val (live, _, fstats, _, _) = foldStateFull(version)
    val kept = live.filter { f =>
      fstats.get(f).flatMap(_.get(column))
        .orElse(footerRange(spark, f, column)) match {
        case Some((mn, mx)) => values.exists(v => v >= mn && v <= mx)
        case None => true
      }
    }
    val df = if (kept.isEmpty) None
      else Some(readFiles(spark, kept, version))
    (df, kept.size, live.size)
  }

  // ---- point-lookup bloom envelopes (round 18, r15 verdict #8) -----
  // min/max ranges prune RANGE and IN-list predicates but not point
  // lookups on a high-cardinality UNclustered column: every file's
  // range contains almost every key, so `snapshotWhereIn` opens
  // everything. The standard answer (Delta/Iceberg per-file bloom
  // indexes) is a small bloom beside the envelope in the add entry:
  // `bloomEnvelope` builds it writer-side (one file-local job — the
  // sharded-bloom kernel from RuntimeFilter, packed words via
  // bit_or), `snapshotWherePoint` probes it reader-side off the log
  // fold alone. The Spark-side hash (md5 → first 8 hex chars → u32)
  // is replicated bit-for-bit in driver Scala below — the membership
  // test never touches a data file. No false negatives: every value
  // in the file set its own bits; a saturated bloom degrades to
  // "keep", never to a miss.

  /** Packed bloom words for `column` of a just-written file:
    * (mBits, sparse wordIdx → mask). `mBits` defaults to 2¹³ (1 KiB —
    * right for file cardinalities in the low thousands; size
    * ~10 bits/key for production files and cap the entry row at the
    * point a saturated filter stops pruning anyway). */
  def bloomEnvelope(spark: SparkSession, file: String, column: String,
      mBits: Long = TxLogTable.DefaultBloomBits)
      : (Long, Map[Int, Long]) = {
    require(java.lang.Long.bitCount(mBits) == 1 && mBits >= 64,
      s"mBits must be a pow2 >= 64: $mBits")
    import graft.operators.RuntimeFilter.u32 // the ONE hash kernel
    val df = spark.read.parquet(dataDir.resolve(file).toString)
    // INTEGRAL keys only — the probe side (`snapshotWherePoint`,
    // `snapshotWhereIn`) renders the lookup value via Long.toString;
    // a bloom built on e.g. a double column would hash "42.0"
    // writer-side vs "42" probe-side and prune the owning file — a
    // false NEGATIVE despite the contract. Enforce the shared
    // integral-key restriction at the build end too.
    df.schema(column).dataType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"bloomEnvelope($column): integral key columns only (probe " +
          s"renders Long.toString; a $other column would hash " +
          "differently writer- vs probe-side and false-negative)")
    }
    val words = df.select(col(column).cast("string").as("s"))
      .where(col("s").isNotNull).distinct()
      .select(explode(array((1 to TxLogTable.BloomK).map(i =>
        pmod(u32(concat(lit(s"bf$i:"), col("s"))), lit(mBits))): _*))
        .as("bit"))
      .distinct()
      .groupBy(expr("bit div 64").as("w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), " +
        "cast(bit % 64 as int)))").as("mask"))
      .collect()
      .map(r => r.getAs[Long]("w").toInt -> r.getAs[Long]("mask"))
      .toMap
    (mBits, words)
  }

  /** Driver-side twin of the Spark hash in [[bloomEnvelope]]:
    * md5("bf<i>:<value>") → first 4 bytes as u32. The mod-m fold is
    * split out so an erasure-list probe ([[deleteWhereIn]]) pays the
    * md5 once per (probe, value) instead of once per (probe, value,
    * FILE) — at a 100k-file table that is the difference between
    * k·|values| and k·|values|·10⁵ digests on the driver. */
  private def bloomHashU32(i: Int, value: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"bf$i:$value".getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def bloomBit(i: Int, value: String, mBits: Long): Long =
    bloomHashU32(i, value) % mBits

  /** Driver-side bloom membership: true when the envelope is absent
    * (keep — no false negatives) or every probe bit is set. Shared by
    * [[snapshotWherePoint]] and [[deleteWhereIn]]. */
  private def bloomMaybeContains(env: Option[(Long, Map[Int, Long])],
      value: Long): Boolean =
    bloomMaybeContainsHashed(env, (1 to TxLogTable.BloomK)
      .map(i => bloomHashU32(i, value.toString)).toArray)

  /** [[bloomMaybeContains]] with the value's probe hashes
    * pre-computed — the erasure-list shape, where the same values
    * probe every candidate file's envelope. */
  private def bloomMaybeContainsHashed(
      env: Option[(Long, Map[Int, Long])],
      hashes: Array[Long]): Boolean = env match {
    case Some((m, words)) => hashes.forall { u =>
      val bit = u % m
      (words.getOrElse((bit / 64).toInt, 0L)
        & (1L << (bit % 64).toInt)) != 0L
    }
    case None => true
  }

  /** [[snapshot]] with POINT-LOOKUP file skipping: a file is kept iff
    * its range envelope contains `value` AND its bloom (when present)
    * maybe-contains it — on an unclustered high-cardinality column
    * the bloom is what prunes where ranges cannot (spec-proven:
    * strictly fewer files opened than [[snapshotWhereIn]] can
    * justify). Same superset contract as every skipping read: the
    * caller still applies the predicate; files without stats or
    * blooms are kept. `(df, kept, live)` observability. */
  def snapshotWherePoint(spark: SparkSession, column: String,
      value: Long, version: Long = Long.MaxValue)
      : (Option[DataFrame], Int, Int) = {
    val (live, _, fstats, fblooms, _) = foldStateFull(version)
    val kept = live.filter { f =>
      val rangeOk = fstats.get(f).flatMap(_.get(column))
        .orElse(footerRange(spark, f, column)) match {
        case Some((mn, mx)) => value >= mn && value <= mx
        case None => true
      }
      rangeOk && bloomMaybeContains(
        fblooms.get(f).flatMap(_.get(column)), value)
    }
    val df = if (kept.isEmpty) None
      else Some(readFiles(spark, kept, version))
    (df, kept.size, live.size)
  }

  /** Write `df` as new data files (INVISIBLE until committed);
    * returns the file names.
    *
    * SINGLE-FILE commit path: the frame funnels through one task
    * (`coalesce(1)`) — right for the bucket-sized state slices and
    * metadata-scale frames this seam serves, WRONG for a real table's
    * bulk writes, where one task becomes the write bottleneck and the
    * file loses all parallel-scan granularity. The scale path is
    * [[writeBucketFiles]] (one file per bucket, single parallel write
    * job); a general table would write unbucketed multi-file commits
    * the same way minus the bucket column. */
  def writeDataFiles(df: DataFrame): Seq[String] = {
    Files.createDirectories(dataDir)
    val staging = Files.createTempDirectory(dataDir, ".stage-")
    df.coalesce(1).write.mode("overwrite")
      .parquet(staging.resolve("out").toString)
    val parts = withList(staging.resolve("out"))(
      _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
    val named = parts.map { p =>
      val name = java.util.UUID.randomUUID().toString + ".parquet"
      Files.move(p, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    // best-effort staging cleanup — stray staging dirs are invisible
    // to readers either way
    try {
      withWalk(staging)(_.toSeq.reverse.foreach(Files.deleteIfExists))
    } catch { case _: java.io.IOException => () }
    named
  }

  /** [[writeDataFiles]] with one file PER BUCKET (single write job via
    * a duplicated partition column): commits stay bucket-aligned, so a
    * later commit touching bucket b rewrites only b's file — bounded
    * rewrite amplification, the layout a format's partition transform
    * maintains. The duplicate keeps `bucketCol` as a DATA column (a
    * plain partitionBy would hoist it into directory names and drop it
    * from the rows). */
  def writeBucketFiles(df: DataFrame, bucketCol: String): Seq[String] = {
    require(!df.columns.contains("_bp"),
      "writeBucketFiles reserves the _bp working column and the frame " +
        "already carries one (it would be silently replaced and " +
        "hoisted out of the data pages)")
    Files.createDirectories(dataDir)
    val staging = Files.createTempDirectory(dataDir, ".stage-")
    df.withColumn("_bp", col(bucketCol))
      .repartition(col("_bp"))
      .write.partitionBy("_bp").mode("overwrite")
      .parquet(staging.resolve("out").toString)
    val parts = withWalk(staging.resolve("out"))(
      _.filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq)
    val named = parts.map { p =>
      val name = java.util.UUID.randomUUID().toString + ".parquet"
      Files.move(p, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    try {
      withWalk(staging)(_.toSeq.reverse.foreach(Files.deleteIfExists))
    } catch { case _: java.io.IOException => () }
    named
  }

  /** Atomically commit: `add` become visible, `remove` become
    * invisible, `txn` is recorded — all in ONE log entry, so the
    * commit is atomic across any number of files/buckets. The entry
    * is published with an atomic HARD-LINK create, NOT a rename:
    * POSIX rename silently REPLACES an existing target, so two racers
    * moving onto the same version would lose the first writer's
    * commit (caught by the concurrency spec — the earlier rename
    * form passed only by timing luck); link creation fails loudly on
    * an existing target and the content is fully written before the
    * link appears, so readers never see a torn entry. Retries on a
    * version race after the caller-supplied `rebase` recomputes what
    * to add/remove against the new snapshot; `rebase(v)` returning
    * None aborts (e.g. the txn turned out to be already committed by
    * the racer). Returns the committed version, or -1 on abort. */
  /** Compact the current live files into ONE rewrite committed as a
    * single add+remove entry — Delta's OPTIMIZE, the execution step
    * behind the q_compaction planner: readers see either the old or
    * the new layout atomically, values are unchanged (a pure layout
    * move), and the superseded files become [[vacuum]]'s work. Uses
    * [[writeBucketFiles]] when `bucketCol` is set (one packed file per
    * bucket — the layout the state store maintains) else
    * [[writeDataFiles]]. Concurrency: OPTIMIZE of a stale snapshot
    * must NOT clobber a racer's data commit, so the rebase retries
    * only while the live set it compacted is still exactly current —
    * any real change aborts (returns None; the orphaned rewrite ages
    * out via vacuum) and the caller re-runs against the new snapshot.
    * Returns the committed version, None if nothing to do or aborted. */
  def optimize(spark: SparkSession,
      bucketCol: Option[String] = None): Option[Long] = {
    // anchor the commit at the version the live set was read at: any
    // racer committing during the rewrite then forces the
    // FileAlreadyExists path, where the `liveFiles() == live` check
    // correctly aborts the stale compaction (round-14 ADVICE, high —
    // previously only a same-version collision triggered the check,
    // so a racer landing at a later version was silently rebuilt upon,
    // resurrecting rows it had removed)
    val v0 = currentVersion()
    val live = liveFiles(v0)
    if (live.size <= 1) return None
    val df = readFiles(spark, live, v0)
    val added = bucketCol match {
      case Some(b) => writeBucketFiles(df, b)
      case None => writeDataFiles(df)
    }
    val v = commit(added, live, txn = None, rebase = _ =>
      if (liveFiles() == live) Some((added, live)) else None,
      readVersion = v0)
    if (v < 0L) None else Some(v)
  }

  /** Size-targeted OPTIMIZE — the bin-packing face of [[optimize]]:
    * only live files SMALLER than `targetBytes` are rewrite
    * candidates, packed greedily (largest-first first-fit, the
    * classic FFD bound) into bins of ≤ `targetBytes` input bytes, so
    * already-compacted files are never rewritten and amplification
    * per run is bounded by the small-file tail's size rather than the
    * table's. A table whose small tail is a single file is already
    * optimal — returns None without writing (the second-run no-op).
    * Same stale-snapshot abort discipline as [[optimize]]: the commit
    * is anchored at the read version, and any concurrent data commit
    * aborts the compaction (orphaned rewrite ages out via vacuum). */
  def optimizePacked(spark: SparkSession, targetBytes: Long): Option[Long] = {
    require(targetBytes > 0L, s"targetBytes must be > 0, got $targetBytes")
    val v0 = currentVersion()
    val live = liveFiles(v0)
    val sized = live.map(f => f -> Files.size(dataDir.resolve(f)))
    val small = sized.filter(_._2 < targetBytes)
    if (small.size <= 1) return None
    // first-fit decreasing over input sizes: deterministic (stable
    // sort on (size desc, name)), and never produces more bins than
    // files so the rewrite strictly reduces the file count
    val bins = collection.mutable.ArrayBuffer.empty[
      (collection.mutable.ArrayBuffer[String], Long)]
    small.sortBy { case (n, s) => (-s, n) }.foreach { case (n, s) =>
      bins.indexWhere(_._2 + s <= targetBytes) match {
        case -1 => bins += ((collection.mutable.ArrayBuffer(n), s))
        case i => bins(i)._1 += n
          bins(i) = (bins(i)._1, bins(i)._2 + s)
      }
    }
    val removed = small.map(_._1)
    val added = bins.toSeq.flatMap { case (names, _) =>
      writeDataFiles(readFiles(spark, names.toSeq, v0))
    }
    val v = commit(added, removed, txn = None, rebase = _ =>
      if (liveFiles() == live) Some((added, removed)) else None,
      readVersion = v0)
    if (v < 0L) None else Some(v)
  }

  /** OPTIMIZE ZORDER BY — [[optimize]]'s multi-dimensional layout
    * face (Delta's `OPTIMIZE ... ZORDER BY (x, y)`): the full rewrite
    * is clustered into `nFiles` EQUI-WIDTH slices of the 32-bit Morton
    * key of two integral columns (`graft.operators.Layout` — the same
    * key q_zorder audits) and sorted by it inside each file, so every
    * output file carries a tight min/max envelope on BOTH dimensions
    * — the parquet footer stats a scan prunes on for filters over
    * either column, where a linear sort serves only its leading key.
    * Equi-width slices (`z·n div (zMax+1)`) rather than sampled range
    * boundaries: deterministic (the layout, like every result here,
    * must not depend on a sampler), and on power-of-two grids they
    * ARE the Morton quadrants; a skew-heavy table wanting equi-depth
    * files would swap in `repartitionByRange` and accept sampled
    * cuts. Grid normalization reads each column's max from the data
    * (one 1-row aggregate). Same read-version anchoring / stale-abort
    * discipline as [[optimize]]; a racer's data commit aborts the
    * stale rewrite, the orphan ages out via [[vacuum]]. */
  def optimizeZorder(spark: SparkSession, xCol: String, yCol: String,
      nFiles: Int = 4): Option[Long] = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val v0 = currentVersion()
    val live = liveFiles(v0)
    if (live.isEmpty) return None
    val df = readFiles(spark, live, v0)
    val mx = df.selectExpr(s"cast(max($xCol) as bigint)",
      s"cast(max($yCol) as bigint)").head()
    if (mx.isNullAt(0) || mx.isNullAt(1)) return None
    val z = graft.operators.Layout.zorder16(
      graft.operators.Layout.grid16(xCol, mx.getLong(0).toString),
      graft.operators.Layout.grid16(yCol, mx.getLong(1).toString))
    val zdf = df.withColumn("_z", z)
    val zMax = zdf.agg(max("_z")).head().getLong(0)
    val added = writeZorderFiles(
      zdf.withColumn("_zb", expr(s"(_z * $nFiles) div ${zMax + 1}L")))
    // record both clustering columns' envelopes IN the commit entry
    // (Delta's add-entry stats, round 17) — snapshotWhere then prunes
    // off the log fold alone, no footer reads; the writer pays one
    // footer read per file it just wrote
    val stats = added.map { f =>
      f -> Seq(xCol, yCol).flatMap(c =>
        footerRange(spark, f, c).map(c -> _)).toMap
    }.toMap
    val v = commit(added, live, txn = None, rebase = _ =>
      if (liveFiles() == live) Some((added, live)) else None,
      readVersion = v0, stats = stats)
    if (v < 0L) None else Some(v)
  }

  /** One file per `_zb` slice, rows sorted by `_z` inside it (the
    * clustered-write shape); both layout columns are derivable, not
    * data — `_zb` hoists into directory names via partitionBy and
    * `_z` is dropped after the in-task sort. */
  private def writeZorderFiles(df: DataFrame): Seq[String] = {
    Files.createDirectories(dataDir)
    val staging = Files.createTempDirectory(dataDir, ".stage-")
    df.repartition(col("_zb"))
      .sortWithinPartitions("_zb", "_z")
      .drop("_z")
      .write.partitionBy("_zb").mode("overwrite")
      .parquet(staging.resolve("out").toString)
    val parts = withWalk(staging.resolve("out"))(
      _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
    val named = parts.map { p =>
      val name = java.util.UUID.randomUUID().toString + ".parquet"
      Files.move(p, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    try {
      withWalk(staging)(_.toSeq.reverse.foreach(Files.deleteIfExists))
    } catch { case _: java.io.IOException => () }
    named
  }

  /** Delete data files no RETAINED snapshot can reach — Delta's
    * VACUUM, the GC for (a) files removed by commits at or below the
    * retention version and (b) ORPHANS of crashed commits (written,
    * never committed — the kill-mid-commit spec's leftovers). The
    * reachable set is exact and checkpoint-bounded:
    * liveFiles(retainVersion) ∪ every add in later entries (a file
    * added after the horizon is live at its own add version, so it
    * stays even if since removed — time travel within retention keeps
    * working; below the horizon it degrades, exactly as a vacuumed
    * Delta table does). `minAgeMs` is the concurrency guard (Delta's
    * retention-age check): an in-flight commit's files are on disk
    * before its log entry, so only files older than the longest
    * plausible commit are eligible — callers pass 0 only when no
    * writer can be in flight. Stray staging dirs age out the same
    * way. Returns the deleted data-file names. */
  /** Row-level COPY-ON-WRITE DELETE — the op a GDPR erasure runs
    * weekly (the r15 verdict's missing #1): rewrite ONLY the live
    * files that actually hold matching rows (detected by ONE
    * distributed semi-scan over the candidates, never per-file driver
    * jobs), drop fully-matching files outright, leave every other
    * file byte-untouched, and commit add+remove as ONE atomic entry
    * under [[optimize]]'s anchored-rebase discipline — any concurrent
    * commit aborts, and the orphaned rewrites age out via [[vacuum]].
    * `ranges` (optional, conjunctive envelope bounds implied by the
    * predicate) prunes candidates off log-carried stats BEFORE any
    * data is read — at 100 TB the difference between scanning the
    * table and scanning the files the predicate can possibly touch.
    * SQL DELETE semantics: a row whose predicate evaluates NULL is
    * KEPT (only provably-true matches die). `txn` makes a replayed
    * delete a no-op. `bloomCols` re-derives point-lookup bloom
    * envelopes for the rewritten files (round 18 upkeep — one
    * file-local job per rewrite per column). Returns the committed version; None when nothing
    * matched, the txn already committed, or a racer forced an abort.
    * Spec-proven: post-state ≡ snapshot-filter, untouched files keep
    * their names (immutable ⇒ byte-identical), time travel to the
    * pre-delete version still shows the deleted rows. */
  /** ONE distributed rewrite of `touched` files: rows tag their
    * source file AT THE SCAN (before `trim`'s joins/filters — the
    * broadcast shapes both callers use keep the scan stage intact),
    * then one partitioned write emits one file per surviving source
    * file; a file whose every row was trimmed produces no partition
    * and so no replacement. Replaces the per-file driver loop the
    * first cut used (~3 sequential jobs per touched file — a
    * 5,000-file GDPR delete would have paid ~15,000 driver-scheduled
    * jobs; this shape pays 1 write job regardless). `_bp` hoists into
    * directory names and is dropped from the data pages, so the
    * output schema equals the input's. */
  private def rewriteFiltered(spark: SparkSession, touched: Seq[String],
      trim: DataFrame => DataFrame): Seq[String] = {
    Files.createDirectories(dataDir)
    val tagged = readFiles(spark, touched)
      .withColumn("_bp", input_file_name())
    val staging = Files.createTempDirectory(dataDir, ".stage-")
    trim(tagged)
      .repartition(col("_bp"))
      .write.partitionBy("_bp").mode("overwrite")
      .parquet(staging.resolve("out").toString)
    // REGULAR FILES only: the partition DIRECTORY names embed the
    // escaped source-file URI and therefore also end in ".parquet" —
    // a name-only filter would move the directory first and orphan
    // the part file inside it (caught by the delete specs)
    val parts = withWalk(staging.resolve("out"))(
      _.filter(p => Files.isRegularFile(p)
        && p.getFileName.toString.endsWith(".parquet")
        && !p.getFileName.toString.startsWith(".")).toSeq)
    val named = parts.map { p =>
      val name = java.util.UUID.randomUUID().toString + ".parquet"
      Files.move(p, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    try {
      withWalk(staging)(_.toSeq.reverse.foreach(Files.deleteIfExists))
    } catch { case _: java.io.IOException => () }
    named
  }

  def deleteWhere(spark: SparkSession,
      predicate: org.apache.spark.sql.Column,
      ranges: Seq[(String, Long, Long)] = Nil,
      txn: Option[Long] = None,
      bloomCols: Seq[String] = Nil): Option[Long] = {
    val v0 = currentVersion()
    if (txn.exists(txns(v0).contains)) return None
    val live = liveFiles(v0)
    if (live.isEmpty) return None
    val cand = if (ranges.isEmpty) live
      else pruneLiveFiles(spark, ranges, v0)._1
    deleteCore(spark, predicate, ranges.map(_._1), cand, live, v0,
      txn, bloomCols)
  }

  /** [[deleteWhere]] for an IN-LIST erasure (`DELETE WHERE col IN
    * (…)` — the GDPR shape, round 19): candidates are pruned PER
    * VALUE against range envelopes AND point blooms (the
    * [[snapshotWherePoint]] discipline applied to an erasure list),
    * so on a bloom-carrying table the scan opens only the files that
    * may actually hold a doomed key — a plain range prune would keep
    * nearly every file for ids scattered across the key space. */
  def deleteWhereIn(spark: SparkSession, column: String,
      values: Seq[Long], txn: Option[Long] = None): Option[Long] = {
    val v0 = currentVersion()
    if (txn.exists(txns(v0).contains)) return None
    val live = liveFiles(v0)
    if (live.isEmpty || values.isEmpty) return None
    val (_, _, fstats, fblooms, _) = foldStateFull(v0)
    // md5 probe hashes once per DISTINCT value, not per (value, file);
    // the sorted array lets each file's range envelope cut its probe
    // set to a binary-searched window — a file holding none of the
    // erasure list costs O(log V), not O(V), so a 100k-key GDPR list
    // against a 100k-file table is ~F·log V + matched-window probes
    // on the driver, never the 10¹⁰ full cross product
    val vsArr = values.distinct.sorted.toArray
    val probes = vsArr.map(v => v -> (1 to TxLogTable.BloomK)
      .map(i => bloomHashU32(i, v.toString)).toArray).toMap
    val cand = live.filter { f =>
      // envelope + bloom resolved once per FILE (footerRange is
      // cached, but the fallback read belongs outside the loop)
      val range = fstats.get(f).flatMap(_.get(column))
        .orElse(footerRange(spark, f, column))
      val bloom = fblooms.get(f).flatMap(_.get(column))
      range match {
        case Some((mn, mx)) =>
          val s = java.util.Arrays.binarySearch(vsArr, mn)
          var i = if (s >= 0) s else -s - 1
          var hit = false
          while (!hit && i < vsArr.length && vsArr(i) <= mx) {
            hit = bloomMaybeContainsHashed(bloom, probes(vsArr(i)))
            i += 1
          }
          hit
        case None =>
          vsArr.exists(v => bloomMaybeContainsHashed(bloom, probes(v)))
      }
    }
    deleteCore(spark, col(column).isin(values: _*), Seq(column),
      cand, live, v0, txn, Nil)
  }

  private def deleteCore(spark: SparkSession,
      predicate: org.apache.spark.sql.Column,
      rangeCols: Seq[String], cand: Seq[String], live: Seq[String],
      v0: Long, txn: Option[Long], bloomCols: Seq[String])
      : Option[Long] = {
    if (cand.isEmpty) return None
    // which candidates actually hold matching rows: tag each row with
    // its source file AT THE SCAN (input_file_name is stage-local —
    // tagging before any exchange keeps it correct), filter, distinct
    // — the job returns ≤ |cand| file-name rows
    val scan = readFiles(spark, cand, v0)
    require(!scan.columns.contains("__f"),
      "deleteWhere reserves the __f working column and the table " +
        "schema already uses it (it would be silently replaced)")
    val hitUris = scan
      .withColumn("__f", input_file_name())
      .filter(predicate)
      .select("__f").distinct()
      .collect().map(_.getString(0))
    // basename-Set membership, not per-candidate suffix scans: the
    // O(|cand|·|hit|) endsWith form is 10¹⁰ driver compares at the
    // 100k-file tables this log is designed for (r16 verdict)
    val hitNames = hitUris.map(u => u.substring(u.lastIndexOf('/') + 1)).toSet
    val touched = cand.filter(hitNames.contains)
    if (touched.isEmpty) return None
    // ONE distributed rewrite of the touched files minus their
    // true-matching rows — one output file per surviving input file;
    // a file whose every row matches gets no replacement
    require(!scan.columns.contains("_bp"),
      "deleteWhere reserves the _bp working column and the table " +
        "schema already uses it")
    val added = rewriteFiltered(spark, touched,
      _.filter(coalesce(not(predicate), lit(true))))
    // writer-side stats for the pruning columns PLUS every column the
    // replaced files carried envelopes for (r16 verdict #6): a delete
    // on a zordered table re-deriving only the predicate's columns
    // would quietly drop the OTHER clustering column's envelope from
    // rewritten files, degrading quadrant skipping until the next
    // OPTIMIZE. One footer read per just-written file per column —
    // optimizeZorder's discipline. Bloom envelopes for `bloomCols` so
    // a table relying on [[snapshotWherePoint]] keeps point-pruning
    // tight ACROSS deletes too.
    val fstats0 = fileStats(v0)
    val statCols = (rangeCols ++ touched.flatMap(f =>
      fstats0.get(f).map(_.keySet.toSeq).getOrElse(Seq.empty))).distinct
    val stats =
      if (statCols.isEmpty) Map.empty[String, Map[String, (Long, Long)]]
      else added.map { f =>
        f -> statCols.flatMap(c =>
          footerRange(spark, f, c).map(c -> _)).toMap
      }.toMap
    // bloom upkeep is AUTO-CARRIED like stats (round 19): any column
    // the replaced files carried blooms for is re-derived on the
    // rewrites, so a point-pruned table stays file-tight across
    // deletes without every caller remembering `bloomCols`
    val fblooms0 = foldStateFull(v0)._4
    val bloomColsAll = (bloomCols ++ touched.flatMap(f =>
      fblooms0.get(f).map(_.keySet.toSeq).getOrElse(Seq.empty))).distinct
    val blooms =
      if (bloomColsAll.isEmpty)
        Map.empty[String, Map[String, (Long, Map[Int, Long])]]
      else added.map { f =>
        f -> bloomColsAll.map(c =>
          c -> bloomEnvelope(spark, f, c)).toMap
      }.toMap
    val v = commit(added, touched, txn, rebase = _ =>
      if (liveFiles() == live && !txn.exists(txns().contains))
        Some((added, touched))
      else None,
      readVersion = v0, stats = stats, blooms = blooms)
    if (v < 0L) None else Some(v)
  }

  /** Row-level copy-on-write MERGE — the CDC upsert (missing #1's
    * second half): every target row whose `keyCol` appears in
    * `source` is REPLACED by the source's row(s), unmatched source
    * rows INSERT, and only files actually carrying a source key are
    * rewritten — `MERGE INTO t USING s ON t.key = s.key WHEN MATCHED
    * THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` under
    * whole-row replacement. Candidates prune off the log-carried
    * keyCol envelopes first (integral keys; other types scan all
    * live files), touched files are detected by one distributed
    * semi-join with the file tag applied at the scan, survivors
    * rewrite per-file, and the source batch lands as its own file —
    * all committed in ONE atomic add+remove entry under the
    * anchored-rebase abort discipline. The source is broadcast
    * (a CDC batch — if it outgrows broadcast, split the batch, the
    * dedup_incremental contract). `txn` makes a replayed batch a
    * no-op. Returns the committed version; None on empty source,
    * already-committed txn, or abort.
    *
    * Schema (round 19): shared columns must match by NAME AND TYPE —
    * a name-set-only check let an Int-keyed batch write a file whose
    * physical schema diverged from the table's, failing or silently
    * miscasting later reads depending on read order (r16 ADVICE).
    * With `evolveSchema = true` a source carrying EXTRA columns
    * widens the table in the same atomic commit (the entry records
    * the widened schema; old files project with nulls —
    * schema-on-read, no rewrite); without it, extra columns fail
    * loudly. */
  def merge(spark: SparkSession, source: DataFrame, keyCol: String,
      txn: Option[Long] = None,
      bloomCols: Seq[String] = Nil,
      evolveSchema: Boolean = false): Option[Long] = {
    import org.apache.spark.sql.types.StructType
    val v0 = currentVersion()
    if (txn.exists(txns(v0).contains)) return None
    val live = liveFiles(v0)
    val src0 = source.localCheckpoint(true)
    if (src0.isEmpty) return None
    // the LOG-recorded schema outranks the first file's (post-ALTER,
    // the first live file may predate the newest column) — and it
    // governs even when live is EMPTY: a table whose rows were all
    // deleted still HAS a schema, and skipping the guards there would
    // let a divergent batch write a physical schema the log-pinned
    // read can't resolve (the r16-ADVICE failure mode through the
    // emptied-table side door)
    val schemaAtRead = foldStateFull(v0)._5
    val tblSchema: Option[StructType] =
      schemaAtRead.map(StructType.fromDDL).orElse(
        if (live.isEmpty) None
        else Some(spark.read
          .parquet(dataDir.resolve(live.head).toString).schema))
    // align the source to the table's column ORDER (parquet readers
    // take the first file's schema — a reordered batch must not
    // depend on read-time name resolution)
    var newDdl: Option[String] = None
    val src = tblSchema match {
      case None => src0
      case Some(ts0) =>
        val tMap = ts0.fields.map(f => f.name -> f.dataType).toMap
        val sMap = src0.schema.fields.map(f => f.name -> f.dataType).toMap
        val missing = tMap.keySet -- sMap.keySet
        require(missing.isEmpty,
          s"merge source lacks table columns: ${missing.toSeq.sorted
            .mkString(",")}")
        val mistyped = ts0.fields.filter(f =>
          sMap.get(f.name).exists(_ != f.dataType)).map(f =>
            s"${f.name}: table ${f.dataType.simpleString} vs source " +
              sMap(f.name).simpleString)
        require(mistyped.isEmpty,
          s"merge source column types diverge from the table's " +
            s"(${mistyped.mkString("; ")}) — a divergent physical " +
            "schema fails or miscasts later reads by read order")
        val extra = src0.schema.fields.filter(f => !tMap.contains(f.name))
        if (extra.isEmpty) src0.select(ts0.fieldNames.toSeq.map(col): _*)
        else {
          require(evolveSchema,
            s"merge source adds columns ${extra.map(_.name).sorted
              .mkString(",")} — pass evolveSchema=true to widen the " +
              "table (schema-on-read: old files project with nulls)")
          val tomb = tombstonedColumns(spark)
          val dead = extra.map(_.name).filter(n =>
            tomb.contains(n.toLowerCase))
          require(dead.isEmpty,
            s"merge source re-adds dropped column(s) ${dead.sorted
              .mkString(",")} — that would resurrect stale values " +
              "from pre-drop files; use a new name or restore")
          val widened = StructType(ts0.fields ++ extra)
          newDdl = Some(widened.toDDL)
          src0.select(widened.fieldNames.toSeq.map(col): _*)
        }
    }
    val integralKey = src.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val cand =
      if (live.isEmpty) Seq.empty[String]
      else if (!integralKey) live
      else {
        val mm = src.agg(min(col(keyCol)).cast("long"),
          max(col(keyCol)).cast("long")).head()
        // an all-NULL key batch matches nothing (SQL equality): no
        // candidate files, the batch lands insert-only
        if (mm.isNullAt(0)) Seq.empty[String]
        else pruneLiveFiles(spark,
          Seq((keyCol, mm.getLong(0), mm.getLong(1))), v0)._1
      }
    val keys = src.select(col(keyCol).as("__k")).distinct()
    val touched =
      if (cand.isEmpty) Seq.empty[String]
      else {
        val scan = readFiles(spark, cand, v0)
        require(!scan.columns.contains("__f")
            && !scan.columns.contains("__k")
            && !scan.columns.contains("_bp"),
          "merge reserves the __f/__k/_bp working columns and the " +
            "table schema already uses one (it would be silently " +
            "replaced)")
        val hitUris = scan
          .withColumn("__f", input_file_name())
          .join(broadcast(keys), col(keyCol) === col("__k"),
            "left_semi")
          .select("__f").distinct()
          .collect().map(_.getString(0))
        // basename-Set membership (r16 verdict #7) — not the
        // O(|cand|·|hit|) suffix scan
        val hitNames = hitUris
          .map(u => u.substring(u.lastIndexOf('/') + 1)).toSet
        cand.filter(hitNames.contains)
      }
    val added = (if (touched.isEmpty) Seq.empty[String]
      else rewriteFiltered(spark, touched,
        _.join(broadcast(keys), col(keyCol) === col("__k"),
          "left_anti"))) ++ writeDataFiles(src)
    // keyCol envelope for the next merge's pruning, PLUS every column
    // the replaced files carried stats for (r16 verdict #6 — zorder
    // upkeep, same rule as deleteWhere)
    val fstats0 = fileStats(v0)
    val statCols = ((if (integralKey) Seq(keyCol) else Nil) ++
      touched.flatMap(f =>
        fstats0.get(f).map(_.keySet.toSeq).getOrElse(Seq.empty))).distinct
    val stats =
      if (statCols.isEmpty) Map.empty[String, Map[String, (Long, Long)]]
      else added.map { f =>
        f -> statCols.flatMap(c =>
          footerRange(spark, f, c).map(c -> _)).toMap
      }.toMap
    // same auto-carry as deleteWhere: blooms the replaced files
    // carried are re-derived on every added file (rewrites AND the
    // landed source batch)
    val fblooms0 = foldStateFull(v0)._4
    val bloomColsAll = (bloomCols ++ touched.flatMap(f =>
      fblooms0.get(f).map(_.keySet.toSeq).getOrElse(Seq.empty))).distinct
    val blooms =
      if (bloomColsAll.isEmpty)
        Map.empty[String, Map[String, (Long, Map[Int, Long])]]
      else added.map { f =>
        f -> bloomColsAll.map(c =>
          c -> bloomEnvelope(spark, f, c)).toMap
      }.toMap
    // rebase also checks the SCHEMA is unchanged: an ALTER commit
    // leaves liveFiles identical, and an evolving merge re-committing
    // over it would record a widened DDL missing the racer's column
    val v = commit(added, touched, txn, rebase = _ =>
      if (liveFiles() == live && !txn.exists(txns().contains)
          && foldStateFull(Long.MaxValue)._5 == schemaAtRead)
        Some((added, touched))
      else None,
      readVersion = v0, stats = stats, blooms = blooms,
      schemaDdl = () => newDdl)
    if (v < 0L) None else Some(v)
  }

  def vacuum(retainVersion: Long = -1L,
      minAgeMs: Long = TxLogTable.DefaultVacuumAgeMs): Seq[String] = {
    if (!Files.isDirectory(dataDir)) return Seq.empty
    val cur = currentVersion()
    val r = if (retainVersion < 0L) cur else math.min(retainVersion, cur)
    val keep = collection.mutable.HashSet.empty[String]
    keep ++= liveFiles(r)
    listVersions().filter(_ > r).foreach(v => keep ++= readEntry(v)._1)
    val cutoff = System.currentTimeMillis() - minAgeMs
    def oldEnough(p: Path): Boolean =
      Files.getLastModifiedTime(p).toMillis <= cutoff
    val victims = withList(dataDir)(_.filter { p =>
      val n = p.getFileName.toString
      n.endsWith(".parquet") && !keep.contains(n) && oldEnough(p)
    }.toSeq)
    val stages = withList(dataDir)(_.filter(p =>
      Files.isDirectory(p) && p.getFileName.toString.startsWith(".stage-")
        && oldEnough(p)).toSeq)
    stages.foreach { s =>
      try withWalk(s)(_.toSeq.reverse.foreach(Files.deleteIfExists))
      catch { case _: java.io.IOException => () }
    }
    // log-dir temp sweep (round-14 ADVICE): a crash between
    // createTempFile and the atomic move in writeCheckpoint (or a
    // publisher's temp write) strands `.ckpt-*/.ptr-*/.publish-*.tmp`
    // files under _txlog forever — same age guard, same GC pass
    if (Files.isDirectory(logDir)) {
      val tmps = withList(logDir)(_.filter(p =>
        p.getFileName.toString.endsWith(".tmp") && oldEnough(p)).toSeq)
      tmps.foreach(Files.deleteIfExists)
    }
    victims.map { p =>
      Files.deleteIfExists(p)
      p.getFileName.toString
    }
  }

  def commit(add: Seq[String], remove: Seq[String], txn: Option[Long],
      rebase: Long => Option[(Seq[String], Seq[String])] = v => None,
      readVersion: Long = -1L,
      stats: Map[String, Map[String, (Long, Long)]] = Map.empty,
      blooms: Map[String, Map[String, (Long, Map[Int, Long])]] = Map.empty,
      schemaDdl: () => Option[String] = () => None)
      : Long = {
    Files.createDirectories(logDir)
    var (a, r) = (add, remove)
    // Delta's optimistic protocol anchors the FIRST attempt at the
    // version the caller's snapshot was READ at, not at commit-call
    // time (round-14 ADVICE, high): computing `currentVersion() + 1`
    // here silently builds on any racer that committed inside the
    // caller's read→commit window (optimize's whole rewrite sits in
    // that window) — the racer's version never collides, so the rebase
    // validity check never runs and the racer's removals are
    // resurrected. With readVersion anchored, an intervening commit
    // forces FileAlreadyExists on the first publish, and the caller's
    // rebase decides whether its (add, remove) is still valid.
    var attempt = (if (readVersion >= 0L) readVersion else currentVersion()) + 1
    while (true) {
      try {
        // per-attempt commit timestamp: max(now, predecessor + 1) —
        // monotone even under a backwards clock step, replay-stable
        // (recorded in the entry body, never mtime); the predecessor
        // entry always exists because versions are contiguous
        val prevTs = if (attempt <= 1L) 0L
          else commitTimestamp(attempt - 1).getOrElse(0L)
        val ts = math.max(System.currentTimeMillis(), prevTs + 1L)
        // stats ride the entry keyed by file name — a rebase that
        // changes the add set keeps only the stats of files it still
        // adds (stats for dropped files would be dead weight; files
        // the rebase introduces fall back to footer envelopes)
        publisher.publish(logDir, entryName(attempt),
          encode(a, r, txn,
            statsRows(stats.filter { case (f, _) => a.contains(f) }),
            bloomRows(blooms.filter { case (f, _) => a.contains(f) }),
            ts, schemaDdl())
            .getBytes(StandardCharsets.UTF_8))
        // best-effort checkpoint on the interval: the fold at this
        // version is deterministic, so a failed/raced checkpoint write
        // only defers compaction — never correctness
        if (attempt % checkpointInterval == 0)
          try writeCheckpoint(attempt)
          catch { case _: java.io.IOException => () }
        return attempt
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          rebase(attempt) match {
            case Some((a2, r2)) => a = a2; r = r2
              // re-derive the retry version SOLELY from the log
              // (round-13 ADVICE): the old max(attempt+1, current+1)
              // left version-number GAPS when a backend reports
              // phantom conflicts (the object-store conditional-put
              // case) — gap-tolerant folds survived, but the Delta
              // "fold of entries 1..V" contract and any
              // contiguity-assuming reader would not. Versions now
              // stay contiguous; the trade is that PROGRESS relies on
              // the publisher's conflict signal being eventually
              // accurate (a publisher that lies forever loops — the
              // racy-fake spec pins both behaviors)
              attempt = currentVersion() + 1
            case None => return -1L
          }
      }
    }
    -1L // unreachable
  }
}

object TxLogTable {
  /** Apply a [[TxLogTable.tableChanges]] frame to a materialized
    * replica — the CDC CONSUMER half (round 19): downstream
    * replication is pure multiset algebra, `replica ∖ deletes ⊎
    * inserts`, needing no key column and no knowledge of which
    * change was an update (whole-row replacement makes delete +
    * insert exact). Composition law (spec-pinned): folding
    * `tableChanges(v, v+1)` from an empty replica reproduces
    * `snapshot(vN)` at every step — bootstrap is just the v0→v1
    * changes (an empty `from` live set reads the whole first commit
    * as inserts), and each increment costs only that interval's
    * churn. */
  def applyChanges(replica: org.apache.spark.sql.DataFrame,
      changes: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val ins = changes.filter(col("_change_type") === "insert")
      .drop("_change_type")
    val del = changes.filter(col("_change_type") === "delete")
      .drop("_change_type")
    // schema evolution mid-fold: the change frame reads under vTo's
    // schema, so a replica bootstrapped before an ADD is narrower
    // (null-fill the added columns, exactly how the source table's
    // own schema-on-read projects its old files) and one bootstrapped
    // before a DROP is wider (project the dropped columns away — the
    // replica loses them just as the source's reads did). The final
    // select also pins column ORDER to the change frame's, which
    // exceptAll requires. ALTER-only intervals have no row churn
    // (tableChanges = None); the re-shape lands with the first
    // post-ALTER data change.
    val filled = ins.schema.fields
      .filterNot(f => replica.columns.contains(f.name))
      .foldLeft(replica)((r, f) =>
        r.withColumn(f.name, lit(null).cast(f.dataType)))
    val aligned = filled.select(ins.columns.map(col): _*)
    aligned.exceptAll(del).unionByName(ins)
  }

  /** Checkpoint every N commits: snapshot fold cost is bounded by N
    * entry reads; Delta's default is every 10 commits. */
  val DefaultCheckpointInterval = 10L

  /** Default vacuum eligibility age: a file younger than this may
    * belong to an in-flight commit (data lands before the log entry),
    * so it is never deleted by default. */
  val DefaultVacuumAgeMs: Long = 24L * 3600 * 1000

  /** Default per-file point-lookup bloom size (bits) — 1 KiB packed;
    * ~10 bits/key up to ≈800 distinct keys per file, degrading
    * gracefully (more false positives = fewer skips, never a false
    * negative) beyond. */
  val DefaultBloomBits: Long = 1L << 13

  /** Hash probes per bloom membership test. */
  val BloomK: Int = 3
}

/** [[graft.streaming.StreamingOps.UpsertStateStore]] backed by a
  * [[TxLogTable]] — the adapter SURVEY §8a maps: `read` = snapshot
  * read filtered to the touched buckets, `alreadyCommitted` = the
  * batch id in the log's txn records (ONE check — the log entry is
  * atomic across buckets, so the per-bucket bid dance disappears,
  * exactly as the §8a table promises), `commit` = new data files for
  * the touched buckets + one atomic log entry that swaps them in.
  * Crash between data-file write and log rename leaves only invisible
  * files: the replayed batch re-merges idempotently and commits once.
  * Concurrency contract: racing committers must touch DISJOINT
  * buckets (commits are bucket-aligned files, so disjoint buckets
  * cannot conflict at the file level; row-level conflict CHECKING is
  * the piece a full format adds on top of this same log shape). */
final class TxLogStore(root: String,
    publisher: LogPublisher = LogPublisher.HardLink,
    keyBloomCol: Option[String] = None)
    extends graft.streaming.StreamingOps.UpsertStateStore {
  private val table = new TxLogTable(root, publisher)

  /** Point lookup on the state's KEY column (round 19, r16 verdict
    * #5): with `keyBloomCol` set, every commit records a per-file key
    * bloom beside the bucket envelope, so a single-key read opens
    * exactly the owning file — the bucket range alone cannot separate
    * files by key (key mins/maxes interleave across buckets).
    * `(df, kept, live)` observability, superset contract: the caller
    * still applies the equality filter. */
  def readPoint(spark: SparkSession, key: Long)
      : (Option[DataFrame], Int, Int) = {
    val c = keyBloomCol.getOrElse(throw new IllegalStateException(
      "readPoint needs a keyBloomCol-configured store"))
    val (df, kept, live) = table.snapshotWherePoint(spark, c, key)
    (df.map(_.filter(col(c) === key)), kept, live)
  }
  // file → buckets bookkeeping lives IN THE LOG since round 17: each
  // commit writes one file per touched bucket AND records the file's
  // bucket envelope in its add entry, so a read folds the metadata it
  // already holds and OPENS only the touched buckets' files
  // (snapshotWhereIn — the "production refinement" the earlier
  // footer-pruning comment promised); files from pre-stats commits
  // fall back to footer envelopes, and the isin filter below is the
  // residual predicate data-skipping always leaves with the caller
  def read(spark: SparkSession, touched: Seq[Int]): Option[DataFrame] =
    table.snapshotWhereIn(spark, "bucket",
        touched.map(_.toLong))._1
      .map(_.filter(col("bucket").isin(touched: _*)))

  def alreadyCommitted(spark: SparkSession, touched: Seq[Int],
      batchId: Long): Boolean = table.txns().contains(batchId)

  def commit(merged: DataFrame, batchId: Long): Unit = {
    val spark = merged.sparkSession
    // the merged frame carries ONLY the touched buckets; the commit
    // must replace exactly those buckets' current rows, so untouched
    // buckets' files survive and touched buckets' rows are re-written
    // (simplest complete rule on a bucket-keyed state table: rewrite
    // the full live state of the touched buckets)
    val m = merged.localCheckpoint(true)
    val touched = m.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    // anchor at the read version so ANY concurrent commit (not just a
    // same-version collision) routes through the rebase below, which
    // recomputes the removal set against the new snapshot
    val v0 = table.currentVersion()
    val prior = table.snapshot(spark)
    // files whose rows are ALL in untouched buckets stay; files
    // containing any touched-bucket row are replaced (their untouched
    // remainder is re-written alongside the merge)
    val liveNames = table.liveFiles()
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    val carried = prior.map { p =>
      val withFile = p.withColumn("_f",
        regexp_extract(input_file_name(), "([^/]+\\.parquet)", 1))
      val touchedFiles = withFile
        .filter(col("bucket").isin(touched.toSeq: _*))
        .select("_f").distinct().collect().map(_.getString(0)).toSet
      removed ++= liveNames.filter(touchedFiles)
      withFile.filter(col("_f").isin(touchedFiles.toSeq: _*))
        .filter(!col("bucket").isin(touched.toSeq: _*)).drop("_f")
    }
    val out = carried match {
      case Some(c) => m.unionByName(c)
      case None => m
    }
    val added = table.writeBucketFiles(out, "bucket")
    // record each file's bucket envelope in the add entry (one footer
    // read per just-written file, writer-side — reads then prune off
    // the log fold alone), plus a KEY bloom when configured (round
    // 19) so [[readPoint]] opens exactly the owning file
    val stats = added.map { f =>
      f -> table.footerRange(spark, f, "bucket")
        .map(r => Map("bucket" -> r)).getOrElse(Map.empty[String, (Long, Long)])
    }.toMap
    val blooms = keyBloomCol match {
      case None => Map.empty[String, Map[String, (Long, Map[Int, Long])]]
      case Some(c) => added.map { f =>
        f -> Map(c -> table.bloomEnvelope(spark, f, c))
      }.toMap
    }
    table.commit(added, removed.toSeq, Some(batchId), stats = stats,
      blooms = blooms,
      rebase = _ => {
      // a racer advanced the table: if it was OUR batch replayed
      // concurrently, abort; otherwise recompute the removal set
      // against the new snapshot and retry
      if (table.txns().contains(batchId)) None
      else {
        val names2 = table.liveFiles()
        Some((added, names2.filter(removed.toSet)))
      }
    }, readVersion = v0)
  }
}
