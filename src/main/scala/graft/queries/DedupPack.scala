package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Deduplication query pack over `documents` (SURVEY.md §2). */
object DedupPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact duplicate groups keyed by md5(text); keeper = min doc_id.
    "dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keep_id"))
    }),

    // Blocked exact near-dup: word-set Jaccard ≥ 0.6 inside
    // (lang, n_chars/100) blocks — the block key bounds pair count.
    // Blocked exact near-dup over hashed word sets (native NGramHashSet
    // = DuckDB md5_number_lower), exact-dup collapse + linear long-merge
    // verify — see Dedup.blockedNgramJaccard for the scale shape.
    "dedup_jaccard" -> ((s, d) =>
      Dedup.blockedNgramJaccard(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 100).as("lb"), col("text")),
        ngramN = 1, threshold = 0.6)),

    // Threshold-sensitivity sweep (round 8) — THE practical dedup
    // tuning question: how many pairs does each candidate τ admit?
    // One pair pass at the loosest τ (0.5 — the size-ratio prefilter
    // loosens with it, so every tighter band is a subset), then the
    // five bands as conditional-count COLUMNS of one aggregate (§3
    // rule 13). Both engines compare the same round-4 jaccard against
    // the same double literals, so the bands cut identically.
    "dedup_sweep" -> ((s, d) => {
      val pairs = Dedup.blockedNgramJaccard(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 100).as("lb"), col("text")),
        ngramN = 1, threshold = 0.5)
      val bands = Seq(0.5, 0.6, 0.7, 0.8, 0.9).map(t =>
        sum(when(col("jaccard") >= t, 1L).otherwise(0L))
          .as(s"n_${(t * 100).toInt}"))
      pairs.agg(bands.head, bands.tail: _*)
    }),

    // MinHash(128) + LSH(32×4) candidates, exact-Jaccard verified.
    "dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(Tables.documents(s, d), "doc_id", "text", 0.5)),

    // Index-quality evaluation of the MinHash banding itself (round
    // 11): rep-level banding precision/recall against exact-Jaccard
    // ground truth — the measurement run before trusting the dedup
    // index, `ann_recall`'s twin on the dedup side. Truth blocking is
    // exact-integer binary-magnitude buckets (complete for τ ≥ 0.5);
    // the oracle brute-forces truth, so blocking completeness is
    // itself hash-gated.
    "dedup_eval" -> ((s, d) =>
      Dedup.lshEval(Tables.documents(s, d), "doc_id", "text", 0.5)),

    // Sampled-truth banding eval (round 14) — dedup_eval's honest form
    // on length-concentrated corpora, where the exact key's size-bucket
    // truth join degenerates toward all-pairs: truth is brute-forced
    // only around a deterministic 1/7 rep sample, every join is
    // sample × corpus (linear at any length distribution), and the
    // spec pins the estimator against the exact key at gate scale.
    "dedup_eval_sampled" -> ((s, d) =>
      Dedup.lshEvalSampled(Tables.documents(s, d), "doc_id", "text", 0.5)),

    // 64-bit SimHash, Hamming ≤ 3, complete 4-band pigeonhole blocking.
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text")),

    // Duplicate-group resolution: connected components over the blocked
    // Jaccard pairs; cluster_id = canonical keeper (min doc id). Uses
    // the connectivity-equivalent sparse edge set (group stars + rep
    // pairs) — identical components, |V|+|repPairs| edges instead of
    // the full quadratic expansion.
    "dedup_clusters" -> ((s, d) =>
      Dedup.connectedComponents(Dedup.blockedNgramJaccardSparse(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 100).as("lb"), col("text")),
        ngramN = 1, threshold = 0.6))),

    // Same duplicate-group resolution via alternating large-star /
    // small-star edge contraction (the trillion-edge CC algorithm —
    // per-round shuffle shrinks with the edge set instead of staying
    // O(V) like min-label). Identical semantics, same oracle.
    "dedup_clusters_star" -> ((s, d) =>
      Dedup.connectedComponentsStar(Dedup.blockedNgramJaccardSparse(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 100).as("lb"), col("text")),
        ngramN = 1, threshold = 0.6))),

    // Incremental component merge: the "yesterday's labels + today's
    // pairs" state update. Yesterday = pairs among even doc_ids only,
    // resolved to labels; today = every other pair, folded in via
    // mergeComponents. Because the label table is connectivity-
    // equivalent to the old pair set, the result must equal a full
    // recompute over ALL pairs — which is exactly what the shared
    // oracle checks.
    "dedup_clusters_merge" -> ((s, d) => {
      val all = Dedup.blockedNgramJaccardSparse(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 100).as("lb"), col("text")),
        ngramN = 1, threshold = 0.6)
      val old = all.filter(pmod(col("id_a"), lit(2)) === 0
        && pmod(col("id_b"), lit(2)) === 0)
      val fresh = all.filter(!(pmod(col("id_a"), lit(2)) === 0
        && pmod(col("id_b"), lit(2)) === 0))
      Dedup.mergeComponents(Dedup.connectedComponents(old), fresh)
    }),

    // End-to-end dedup applied to the corpus: near-dup clusters keep
    // their min-id doc, uniques pass through; per-lang survivor counts.
    // Sparse edges — applyDedup only needs connectivity.
    "dedup_apply" -> ((s, d) =>
      Dedup.applyDedup(Tables.documents(s, d), "doc_id",
          Dedup.blockedNgramJaccardSparse(
            Tables.documents(s, d).select(col("doc_id"), col("lang"),
              floor(col("n_chars") / 100).as("lb"), col("text")),
            ngramN = 1, threshold = 0.6))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("chars_kept"))),

    // Priority-keeper dedup (round 9): same clusters as dedup_apply,
    // but the kept member is the LONGEST doc (n_chars desc, tie min
    // id), not the min id — the production rule when near-dup members
    // differ in value (a truncated mirror should lose to the full
    // copy). Keeper choice is one window over cluster members only.
    "dedup_apply_priority" -> ((s, d) =>
      Dedup.applyDedupPriority(Tables.documents(s, d), "doc_id", "n_chars",
          Dedup.blockedNgramJaccardSparse(
            Tables.documents(s, d).select(col("doc_id"), col("lang"),
              floor(col("n_chars") / 100).as("lb"), col("text")),
            ngramN = 1, threshold = 0.6))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("chars_kept"))),

    // Incremental ingest-time dedup: odd doc_ids are the "incoming
    // batch", even doc_ids the existing corpus; incoming docs that are
    // exact or blocked-Jaccard near-dups of the corpus are dropped.
    "dedup_incremental" -> ((s, d) => {
      def side(parity: Int) = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(2)) === parity)
        .select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 100).as("lb"), col("text"), col("n_chars"))
      // collapseCorpus: the parity-split "corpus" is as duplicate-heavy
      // as the incoming side on replica-probe data
      Dedup.incrementalDedup(side(1), side(0), ngramN = 1, threshold = 0.6,
          collapseCorpus = true)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_new"), sum(col("n_chars")).as("chars_new"))
    }),

    // Cross-doc repeated-span measurement — the per-doc metric behind
    // exact-substring dedup ("what fraction of this doc's 5-word spans
    // also appear in other docs?"); pipelines drop or trim docs whose
    // content is mostly shared boilerplate. Linear shape: explode
    // distinct 5-gram hashes, span doc-frequency by hash agg, join back
    // — never a doc×doc join. Gram hashing runs once per distinct text
    // (§3a'); span df counts member DOCS (identical texts weight by
    // their member count), so exact duplicates correctly score 1.0.
    "dedup_spans" -> ((s, d) => {
      import graft.functions.DedupExpressions.ngramHashSet
      val hashed = Dedup.withTextHash(
        Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
      val members = hashed.select("doc_id", "h")
      val mcount = members.groupBy("h").agg(count(lit(1)).as("mc"))
      val repG = hashed.dropDuplicates("h")
        .withColumn("g", ngramHashSet(words(col("text")), 5))
        .filter(col("g").isNotNull)
        .select(col("h"), size(col("g")).as("n_spans"), explode(col("g")).as("gh"))
      val dfreq = repG.select("h", "gh").join(mcount, "h")
        .groupBy("gh").agg(sum("mc").as("df"))
      val repStats = repG.join(dfreq, "gh")
        .groupBy("h", "n_spans")
        .agg(sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      members.join(repStats, "h")
        .select(col("doc_id"), col("n_spans").cast("long").as("n_spans"),
          col("n_shared"),
          round(col("n_shared") / col("n_spans"), 4).as("dup_span_frac"))
    }),

    // Span-level text surgery — the ACTION behind exact-substring dedup
    // (dedup_spans is the measurement): every word covered by a 5-word
    // span appearing in >= 2 member docs is removed, and the output is
    // the per-doc kept/trimmed funnel plus the md5 of the trimmed text
    // (the key downstream exact dedup would group on). Linear shape
    // like dedup_spans: POSITIONAL gram hashes once per distinct text
    // (§3a', NGramHashList — position decides which words die), span
    // doc-frequency by hash agg, coverage = bounded explode of the
    // 5-wide windows of shared grams, reassembly via array_sort over
    // (pos, word) per doc — never doc×doc.
    "dedup_spans_trim" -> ((s, d) => {
      import graft.functions.DedupExpressions.ngramHashList
      val hashed = Dedup.withTextHash(
        Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
      val members = hashed.select("doc_id", "h")
      val mcount = members.groupBy("h").agg(count(lit(1)).as("mc"))
      val reps = hashed.dropDuplicates("h")
      val repG = reps
        .withColumn("gl", ngramHashList(words(col("text")), 5))
        .filter(col("gl").isNotNull)
        .select(col("h"), posexplode(col("gl")).as(Seq("pos", "gh")))
      val dfreq = repG.join(mcount, "h").groupBy("gh").agg(sum("mc").as("df"))
      val shared = dfreq.filter(col("df") >= 2).select("gh")
      val cov = repG.join(shared, "gh")
        .select(col("h"), explode(sequence(col("pos"), col("pos") + 4)).as("cpos"))
        .distinct()
      val wpos = reps
        .select(col("h"), posexplode(words(col("text"))).as(Seq("wp", "word")))
      val kept = wpos.as("wv")
        .join(cov.as("cv"),
          col("wv.h") === col("cv.h") && col("wv.wp") === col("cv.cpos"),
          "left_anti")
      val repOut = kept.groupBy("h").agg(
        count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("wp"), col("word")))),
            x => x.getField("word")), " ").cast("binary")).as("trimmed_h"))
      val nWords = reps.select(col("h"), size(words(col("text"))).as("n_words"))
      members.join(nWords, "h")
        .join(repOut, Seq("h"), "left")
        .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_words") - coalesce(col("n_kept"), lit(0L))).cast("long")
            .as("n_trimmed"),
          coalesce(col("trimmed_h"), md5(lit("").cast("binary"))).as("trimmed_h"))
    }),

    // n-gram (word-bigram) Jaccard near-dup: order-sensitive, so it
    // catches shuffled-word docs that the word-SET Jaccard calls equal.
    // Same collapsed blocked shape over hashed bigram sets.
    "dedup_ngram" -> ((s, d) =>
      Dedup.blockedNgramJaccard(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 100).as("lb"), col("text")),
        ngramN = 2, threshold = 0.5)),

    // Asymmetric CONTAINMENT detection (round 8) — the near-dup class
    // Jaccard's length blocking deliberately skips: a short doc wholly
    // embedded in a longer one (boilerplate wrapper, quote expansion)
    // has low Jaccard but containment ≈ 1. Candidates come from PREFIX
    // FILTERING (the PPJoin/containment-join scheme): every distinct
    // text indexes its ⌊10%·|set|⌋+1 RAREST grams (global df order,
    // gh tiebreak), and a pair is generated iff a container holds one
    // of the contained side's prefix grams — complete for containment
    // ≥ 0.9, because dropping >90% of a set cannot remove its whole
    // rarest decile. Scale shape: candidate volume is Σ prefix ×
    // posting length, and prefix grams are by construction each set's
    // rarest — under any Zipfian vocabulary their postings are the
    // short tail, while ubiquitous grams are only ever probed, never
    // expanded pairwise. Verification is the exact sorted-hash-set
    // intersect; containment(a in b) = inter / |a|. Output: every
    // text's best container (max containment, ties to min id) —
    // thresholds are the caller's.
    "text_containment" -> ((s, d) =>
      Dedup.containmentBestContainer(Tables.documents(s, d), "doc_id", "text")),

    // Record linkage / entity resolution (Fellegi & Sunter JASA 1969;
    // round 13) — the STRUCTURED-record member of the dedup family:
    // where the text keys above ask "same document", linkage asks
    // "same ENTITY behind two differently-dirty records", combining
    // per-field evidence into a log-odds score with a three-zone
    // decision (match / possible / non-match). The dirty side is a
    // deterministic corruption of every customer (one name digit
    // dropped at position 10 + key mod 9, balance off by key mod 3 −
    // 1 cents) — the mm-corpus discipline: generated, not stored, so
    // the oracle replays the corruption and the gate covers
    // block → compare → score → decide end to end. Decision quality
    // is MEASURED against the planted truth (dedup_eval's discipline):
    // per zone n_pairs / n_true / precision / recall. Determinism:
    // trigram jaccard quantizes to (|∩|·2²⁰) div |∪| before the
    // agreement threshold; field weights are DECLARED integer log-odds
    // literals (·1e3: name ln(.9/.01)=4500 / ln(.1/.99)=−2293, balance
    // ln(.95/.001)=6856 / ln(.05/.999)=−2996, name-suffix
    // ln(.55/.3)=606 / ln(.45/.7)=−442; a production system fits m,u
    // by EM — the trained-artifact stash); the score is an exact
    // integer sum, so match needs name+balance agreement (≥ 9000) and
    // either field alone lands in the clerical-review zone (≥ 2000). Scale shape: blocking on
    // (nation, segment, shifted-cents div 1e4) with the dirty side
    // probing the ±1-cent ADJACENT bands (an off-by-a-cent record at
    // a band edge is exactly the case naive banding loses — blocking
    // completeness for the planted noise is by construction, and the
    // shift keeps the division truncation-vs-floor-proof on negative
    // balances); candidates ∝ block occupancy, never |dirty|×|clean|.
    "q_record_link" -> ((s, d) => recordLinkFrom(cleanCustomers(s, d))),

    // Fellegi–Sunter with EM-FIT m/u (the paper's §5 latent-mixture
    // estimation; round 13) — q_record_link's declared log-odds
    // literals replaced by parameters ESTIMATED from the comparison
    // space itself: EM over the 8-row agreement-pattern census (pure
    // driver arithmetic on exact integer counts, bounded by the 2³
    // pattern domain at any corpus size), every pair then classified
    // by its pattern's fitted match posterior. The fitted posteriors
    // quantize to 1e6-unit integers ON THE DRIVER and inline in both
    // plans (ann_trained_recall's trained-artifact discipline — no
    // float ever crosses the engine boundary), so the gate covers
    // block → compare → pattern → fitted-posterior → zone end to end.
    "q_record_link_em" -> ((s, d) =>
      recordLinkEmFrom(cleanCustomers(s, d))),

    // Fellegi–Sunter §3 OPTIMAL thresholds from target error rates
    // (round 14) — the paper's actual decision-theoretic contribution,
    // which the fixed 0.95/0.05 posterior cuts of q_record_link_em
    // dodge: given admissible error targets μ (false-match rate among
    // true non-matches) and λ (false-non-match rate among true
    // matches), order the 8 agreement patterns by likelihood ratio
    // P(γ|M)/P(γ|U) and take the WIDEST match prefix with Σ P(γ|U) ≤ μ
    // and the widest non-match suffix with Σ P(γ|M) ≤ λ; the middle is
    // exactly the clerical-review zone the theorem proves minimal.
    // Per-zone output: pattern count, pair census against the planted
    // truth, the theoretical masses the cuts promise, and the MEASURED
    // achieved shares (match row's false share = achieved μ̂,
    // non-match row's true share = achieved λ̂).
    "q_record_link_thresh" -> ((s, d) =>
      recordLinkThreshFrom(cleanCustomers(s, d)))
  )

  /** The clean-record projection both linkage keys share. */
  private def cleanCustomers(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("ck"), col("c_name").as("nm"),
      col("c_nationkey").cast("long").as("nk"),
      col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") * 100).cast("long").as("bc"))

  /** The shared linkage comparison space over any clean (`ck`, `nm`,
    * `nk`, `seg`, `bc`) record table (names must be ≥ 3 chars —
    * customer names are fixed 18): deterministic dirty generation,
    * ±1-cent band-probe blocking, quantized trigram jaccard, and the
    * three boolean agreement fields per candidate pair. */
  /** The deterministic dirty-record generator (one name digit dropped
    * at position 10 + key mod 9, balance off by key mod 3 − 1 cents). */
  private[graft] def dirtyGen(cl: DataFrame): DataFrame =
    cl.select(col("ck").as("dk"), col("nk"), col("seg"),
      expr("concat(substr(nm, 1, 9 + ck % 9), substr(nm, 11 + ck % 9))")
        .as("dnm"),
      (col("bc") + pmod(col("ck"), lit(3)) - 1).as("dbc"))

  /** Block, compare and score any (`dk`, `nk`, `seg`, `dnm`, `dbc`)
    * dirty-record frame against a clean table — every operation here
    * is STATELESS (explode, stream-static-joinable equi-join, per-row
    * column math), so the same kernel drives both the batch keys and
    * `StreamingOps.recordLinkStream`. */
  private[graft] def scoredPairs(dirtyRec: DataFrame,
      cl: DataFrame): DataFrame = {
    val trigs = "array_distinct(transform(sequence(1, length(%s) - 2), " +
      "i -> substring(%s, i, 3)))"
    val dirty = dirtyRec
      .withColumn("band", explode(array_distinct(array(
        expr("(dbc + 99999) div 10000"),
        expr("(dbc + 100000) div 10000"),
        expr("(dbc + 100001) div 10000")))))
      .withColumn("dtg", expr(trigs.format("dnm", "dnm")))
    val clb = cl
      .withColumn("band", expr("(bc + 100000) div 10000"))
      .withColumn("tg", expr(trigs.format("nm", "nm")))
    dirty.join(clb, Seq("nk", "seg", "band"))
      .withColumn("i0", size(array_intersect(col("dtg"), col("tg"))))
      .withColumn("u0",
        size(col("dtg")) + size(col("tg")) - col("i0"))
      .withColumn("jq", expr("(cast(i0 as bigint) * 1048576) div u0"))
      .withColumn("a_name", col("jq") >= 629146)
      .withColumn("a_bal", abs(col("dbc") - col("bc")) <= 1)
      .withColumn("a_sfx", expr("right(dnm, 4) = right(nm, 4)"))
      .withColumn("score",
        when(col("a_name"), lit(4500L)).otherwise(lit(-2293L))
          + when(col("a_bal"), lit(6856L)).otherwise(lit(-2996L))
          + when(col("a_sfx"), lit(606L)).otherwise(lit(-442L)))
      .withColumn("decision",
        when(col("score") >= 9000, "match")
          .when(col("score") >= 2000, "possible")
          .otherwise("non_match"))
      .select(col("dk"), col("ck"), col("a_name"), col("a_bal"),
        col("a_sfx"), col("score"), col("decision"))
  }

  private[graft] def linkEvidence(cl: DataFrame): DataFrame =
    scoredPairs(dirtyGen(cl), cl)
      .select("dk", "ck", "a_name", "a_bal", "a_sfx")

  /** The zone census shared by both linkage keys. */
  private def linkCensus(decided: DataFrame, cl: DataFrame): DataFrame =
    decided.groupBy("decision")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("dk") === col("ck"), 1L).otherwise(0L)).as("n_true"))
      .crossJoin(broadcast(cl.agg(count(lit(1)).as("n_truth"))))
      .select(col("decision"), col("n_pairs"), col("n_true"),
        round(col("n_true").cast("double") / col("n_pairs"), 6)
          .as("precision"),
        round(col("n_true").cast("double") / col("n_truth"), 6)
          .as("recall"))

  /** The declared-weights linkage kernel — public to the test JVM for
    * the planted-truth gate. */
  private[graft] def recordLinkFrom(clean: DataFrame): DataFrame = {
    val cl = clean.localCheckpoint(true) // feeds dirty gen + clean side
    linkCensus(scoredPairs(dirtyGen(cl), cl), cl)
  }

  /** Fellegi–Sunter EM over the 8-row agreement-pattern census (the
    * paper's §5 latent-mixture fit): patterns γ ∈ {0,1}³ with counts
    * n_γ, model P(γ) = p·Π mᵢ^γᵢ(1−mᵢ)^(1−γᵢ) + (1−p)·Π uᵢ^…, fixed
    * 20 iterations from the fixed (0.5, .9, .1) init, parameters
    * clamped to [1e-6, 1−1e-6] (the all-agree field drives m → 1).
    * Pure driver arithmetic over the exact integer census —
    * deterministic, and bounded by the 2³ pattern domain regardless
    * of corpus size. Returns (p, m, u, pattern → match-posterior). */
  private[graft] def fsEm(counts: Map[Int, Long], iters: Int = 20)
      : (Double, Array[Double], Array[Double], Map[Int, Double]) = {
    def clamp(x: Double) = math.min(1 - 1e-6, math.max(1e-6, x))
    var p = 0.5
    var m = Array(0.9, 0.9, 0.9)
    var u = Array(0.1, 0.1, 0.1)
    val pats = (0 until 8).map(g => g -> counts.getOrElse(g, 0L))
    val n = math.max(1L, pats.map(_._2).sum).toDouble
    def lik(a: Array[Double], g: Int): Double =
      (0 until 3).map(i =>
        if (((g >> (2 - i)) & 1) == 1) a(i) else 1 - a(i)).product
    var post = Map.empty[Int, Double]
    for (_ <- 1 to iters) {
      post = pats.map { case (g, _) =>
        val a = p * lik(m, g)
        g -> a / (a + (1 - p) * lik(u, g))
      }.toMap
      val wm = pats.map { case (g, c) => c * post(g) }.sum
      val wu = n - wm
      p = clamp(wm / n)
      m = (0 until 3).map(i => clamp(pats.collect {
        case (g, c) if ((g >> (2 - i)) & 1) == 1 => c * post(g)
      }.sum / math.max(1e-9, wm))).toArray
      u = (0 until 3).map(i => clamp(pats.collect {
        case (g, c) if ((g >> (2 - i)) & 1) == 1 => c * (1 - post(g))
      }.sum / math.max(1e-9, wu))).toArray
    }
    (p, m, u, post)
  }

  // q_record_link_em's trained artifact, stashed at query run time so
  // the oracle def inlines the EXACT per-pattern posterior integers
  // (SimilarityPack's trainedCb idiom; Verify emits oracle_sql.json
  // after every query has run)
  @volatile private var emPosts: Option[Map[Int, Long]] = None

  // the comparison-space prelude both linkage oracles share: dirty
  // generation, ±1-cent band probes, quantized trigram jaccard
  private val linkPreludeSql: String =
    """cl AS (SELECT CAST(c_custkey AS BIGINT) AS ck, c_name AS nm,
      |    CAST(c_nationkey AS BIGINT) AS nk, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bc
      |  FROM customer),
      |dirty AS (SELECT ck AS dk, nk, seg,
      |    substr(nm, 1, CAST(9 + ck % 9 AS INT))
      |      || substr(nm, CAST(11 + ck % 9 AS INT)) AS dnm,
      |    bc + ck % 3 - 1 AS dbc
      |  FROM cl),
      |dbands AS (SELECT *, unnest(list_distinct([
      |    (dbc + 99999) // 10000, (dbc + 100000) // 10000,
      |    (dbc + 100001) // 10000])) AS band FROM dirty),
      |dtgs AS (SELECT *, list_distinct(list_transform(
      |    range(1, length(dnm) - 1),
      |    i -> substr(dnm, CAST(i AS INT), 3))) AS dtg FROM dbands),
      |ctgs AS (SELECT *, (bc + 100000) // 10000 AS band,
      |    list_distinct(list_transform(range(1, length(nm) - 1),
      |      i -> substr(nm, CAST(i AS INT), 3))) AS tg FROM cl),
      |sc AS (SELECT d.dk, c.ck,
      |    (CAST(len(list_intersect(d.dtg, c.tg)) AS BIGINT) * 1048576)
      |      // (len(d.dtg) + len(c.tg) - len(list_intersect(d.dtg, c.tg)))
      |      AS jq,
      |    abs(d.dbc - c.bc) AS bdiff,
      |    right(d.dnm, 4) = right(c.nm, 4) AS sfx
      |  FROM dtgs d JOIN ctgs c
      |    ON d.nk = c.nk AND d.seg = c.seg AND d.band = c.band)"""
      .stripMargin

  // the zone census both linkage oracles share (consumes a CTE `z`
  // with (decision, is_true))
  private val linkCensusSql: String =
    """t AS (SELECT count(*) AS n_truth FROM cl)
      |SELECT decision, count(*) AS n_pairs,
      |  CAST(sum(is_true) AS BIGINT) AS n_true,
      |  round(CAST(sum(is_true) AS DOUBLE) / count(*), 6) AS precision,
      |  round(CAST(sum(is_true) AS DOUBLE) / max(n_truth), 6) AS recall
      |FROM z, t GROUP BY 1""".stripMargin

  /** The `q_record_link_em` replay: the shared comparison space, the
    * pattern id, the STASHED fitted-posterior integers as a CASE
    * mapping, the same zone cuts and census. */
  private def recordLinkEmSql: String = emPosts match {
    case None =>
      // query never ran in this process: an impossible row, so a stale
      // pairing fails the compare loudly instead of silently passing
      "SELECT 'match' AS decision, 0 AS n_pairs, 0 AS n_true, " +
        "0.0 AS precision, 0.0 AS recall WHERE 1 = 0"
    case Some(pq) =>
      val cases = (0 until 8).map(g => s"WHEN $g THEN ${pq(g)}")
        .mkString(" ")
      s"WITH $linkPreludeSql,\n" +
        s"""pat AS (SELECT dk, ck,
           |    (CASE WHEN jq >= 629146 THEN 4 ELSE 0 END
           |     + CASE WHEN bdiff <= 1 THEN 2 ELSE 0 END
           |     + CASE WHEN sfx THEN 1 ELSE 0 END) AS g
           |  FROM sc),
           |z AS (SELECT CASE WHEN pq >= 950000 THEN 'match'
           |      WHEN pq >= 50000 THEN 'possible'
           |      ELSE 'non_match' END AS decision,
           |    CASE WHEN dk = ck THEN 1 ELSE 0 END AS is_true
           |  FROM (SELECT dk, ck, CASE g $cases END AS pq FROM pat)),
           |""".stripMargin + linkCensusSql
  }

  /** The EM-fitted linkage kernel: fit on the collected 8-row pattern
    * census (bounded by the 2³ domain — the sanctioned
    * codebook-collect), classify every pair by its pattern's fitted
    * match posterior quantized to exact 1e6-unit integers (computed
    * ONCE on the driver and inlined in BOTH plans, so no float
    * crosses the engine boundary), zone cuts at 0.95 / 0.05. */
  private[graft] def recordLinkEmFrom(clean: DataFrame): DataFrame = {
    val cl = clean.localCheckpoint(true)
    val ev = linkEvidence(cl)
      .withColumn("g",
        when(col("a_name"), 4).otherwise(0)
          + when(col("a_bal"), 2).otherwise(0)
          + when(col("a_sfx"), 1).otherwise(0))
      .localCheckpoint(true) // feeds the census collect + the classify
    val counts = ev.groupBy("g").count().collect()
      .map(r => r.getAs[Int]("g") -> r.getAs[Long]("count")).toMap
    val (_, _, _, post) = fsEm(counts)
    val pq = (0 until 8).map(g =>
      g -> math.floor(post.getOrElse(g, 0.0) * 1e6).toLong).toMap
    emPosts = Some(pq)
    val pqCol = (0 until 8).foldLeft(lit(0L)) { (acc, g) =>
      when(col("g") === g, lit(pq(g))).otherwise(acc)
    }
    val decided = ev.withColumn("pq", pqCol)
      .withColumn("decision",
        when(col("pq") >= 950000L, "match")
          .when(col("pq") >= 50000L, "possible")
          .otherwise("non_match"))
    linkCensus(decided, cl)
  }

  /** Fellegi–Sunter §3 threshold selection: given per-pattern
    * P(γ|M) = mg and P(γ|U) = ug and target error rates μ / λ, order
    * patterns by likelihood ratio descending (1e6-quantized, pattern
    * id ascending as the deterministic tie-break) and take the widest
    * match prefix with Σ ug ≤ μ and the widest non-match suffix with
    * Σ mg ≤ λ (never crossing the prefix). Pure driver arithmetic on
    * the 8-pattern domain. Returns pattern → zone. */
  private[graft] def fsThresholds(mg: Map[Int, Double],
      ug: Map[Int, Double], mu: Double, lambda: Double)
      : Map[Int, String] = {
    val rq = (0 until 8).map(g => g -> math.floor(
      1e6 * mg.getOrElse(g, 0.0) / math.max(ug.getOrElse(g, 0.0), 1e-9))
      .toLong).toMap
    val order = (0 until 8).sortBy(g => (-rq(g), g))
    var cumU = 0.0
    var k = 0
    while (k < 8 && cumU + ug.getOrElse(order(k), 0.0) <= mu + 1e-12) {
      cumU += ug.getOrElse(order(k), 0.0); k += 1
    }
    var cumM = 0.0
    var l = 8
    while (l > k && cumM + mg.getOrElse(order(l - 1), 0.0)
        <= lambda + 1e-12) {
      cumM += mg.getOrElse(order(l - 1), 0.0); l -= 1
    }
    order.zipWithIndex.map { case (g, i) =>
      g -> (if (i < k) "match" else if (i >= l) "non_match"
        else "possible")
    }.toMap
  }

  /** The error-rate targets `q_record_link_thresh` runs at: at most
    * 0.1% of true non-matches may be declared matches, at most 1% of
    * true matches may be declared non-matches. */
  private[graft] val ThreshMu = 0.001
  private[graft] val ThreshLambda = 0.01

  // q_record_link_thresh's trained artifact (zone map + quantized
  // per-pattern theory masses), stashed at query run time for the
  // oracle replay — the emPosts idiom
  @volatile private var threshArt
      : Option[(Map[Int, String], Map[Int, Long], Map[Int, Long])] = None

  /** The threshold-selection linkage kernel — public to the test JVM.
    * EM fit as in [[recordLinkEmFrom]], per-pattern class likelihoods
    * from the fitted per-field (m, u), zones from [[fsThresholds]]
    * quantized and inlined in BOTH plans, then a per-zone census with
    * the theoretical masses and the measured achieved shares:
    * false_share_q = (zone's false pairs)·1e6 div (all false pairs) —
    * the match row's value is the achieved μ̂; true_share_q mirrors it
    * for λ̂ on the non-match row. */
  private[graft] def recordLinkThreshFrom(clean: DataFrame): DataFrame = {
    val cl = clean.localCheckpoint(true)
    val ev = linkEvidence(cl)
      .withColumn("g",
        when(col("a_name"), 4).otherwise(0)
          + when(col("a_bal"), 2).otherwise(0)
          + when(col("a_sfx"), 1).otherwise(0))
      .localCheckpoint(true)
    val counts = ev.groupBy("g").count().collect()
      .map(r => r.getAs[Int]("g") -> r.getAs[Long]("count")).toMap
    val (_, m, u, _) = fsEm(counts)
    def lik(a: Array[Double], g: Int): Double =
      (0 until 3).map(i =>
        if (((g >> (2 - i)) & 1) == 1) a(i) else 1 - a(i)).product
    val mg = (0 until 8).map(g => g -> lik(m, g)).toMap
    val ug = (0 until 8).map(g => g -> lik(u, g)).toMap
    val zone = fsThresholds(mg, ug, ThreshMu, ThreshLambda)
    val mq = (0 until 8).map(g =>
      g -> math.floor(mg(g) * 1e6).toLong).toMap
    val uq = (0 until 8).map(g =>
      g -> math.floor(ug(g) * 1e6).toLong).toMap
    threshArt = Some((zone, mq, uq))
    val zoneCol = (0 until 8).foldLeft(lit("possible")) { (acc, g) =>
      when(col("g") === g, lit(zone(g))).otherwise(acc)
    }
    val decided = ev.withColumn("decision", zoneCol)
    val byZone = decided.groupBy("decision")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("dk") === col("ck"), 1L).otherwise(0L)).as("n_true"))
    val tot = decided.agg(
      sum(when(col("dk") =!= col("ck"), 1L).otherwise(0L)).as("tot_false"),
      sum(when(col("dk") === col("ck"), 1L).otherwise(0L)).as("tot_true"))
    def zoneLit(f: String => Long): Column =
      Seq("match", "possible", "non_match").foldLeft(lit(0L)) {
        (acc, z) => when(col("decision") === z, lit(f(z))).otherwise(acc)
      }
    byZone.crossJoin(broadcast(tot))
      .select(col("decision"),
        zoneLit(z => zone.count(_._2 == z).toLong).as("n_patterns"),
        col("n_pairs"), col("n_true"),
        zoneLit(z => zone.collect { case (g, zz) if zz == z => mq(g) }
          .sum).as("m_mass_q"),
        zoneLit(z => zone.collect { case (g, zz) if zz == z => uq(g) }
          .sum).as("u_mass_q"),
        expr("(n_pairs - n_true) * 1000000 div greatest(tot_false, 1)")
          .as("false_share_q"),
        expr("n_true * 1000000 div greatest(tot_true, 1)")
          .as("true_share_q"))
  }

  /** The `q_record_link_thresh` replay: shared comparison space, the
    * stashed zone map as a CASE, the same census and share math. */
  private def recordLinkThreshSql: String = threshArt match {
    case None =>
      "SELECT 'match' AS decision, 0 AS n_patterns, 0 AS n_pairs, " +
        "0 AS n_true, 0 AS m_mass_q, 0 AS u_mass_q, " +
        "0 AS false_share_q, 0 AS true_share_q WHERE 1 = 0"
    case Some((zone, mq, uq)) =>
      val zcases = (0 until 8).map(g => s"WHEN $g THEN '${zone(g)}'")
        .mkString(" ")
      def zlit(f: String => Long): String =
        Seq("match", "possible", "non_match").map(z =>
          s"WHEN '$z' THEN ${f(z)}").mkString("CASE decision ", " ", " END")
      s"WITH $linkPreludeSql,\n" +
        s"""pat AS (SELECT dk, ck,
           |    (CASE WHEN jq >= 629146 THEN 4 ELSE 0 END
           |     + CASE WHEN bdiff <= 1 THEN 2 ELSE 0 END
           |     + CASE WHEN sfx THEN 1 ELSE 0 END) AS g
           |  FROM sc),
           |z AS (SELECT CASE g $zcases END AS decision,
           |    CASE WHEN dk = ck THEN 1 ELSE 0 END AS is_true
           |  FROM pat),
           |tot AS (SELECT CAST(sum(1 - is_true) AS BIGINT) AS tot_false,
           |    CAST(sum(is_true) AS BIGINT) AS tot_true FROM z)
           |SELECT decision,
           |  ${zlit(z => zone.count(_._2 == z).toLong)} AS n_patterns,
           |  count(*) AS n_pairs,
           |  CAST(sum(is_true) AS BIGINT) AS n_true,
           |  ${zlit(z => zone.collect {
                case (g, zz) if zz == z => mq(g) }.sum)} AS m_mass_q,
           |  ${zlit(z => zone.collect {
                case (g, zz) if zz == z => uq(g) }.sum)} AS u_mass_q,
           |  CAST((count(*) - sum(is_true)) * 1000000
           |    // greatest(tot_false, 1) AS BIGINT) AS false_share_q,
           |  CAST(sum(is_true) * 1000000
           |    // greatest(tot_true, 1) AS BIGINT) AS true_share_q
           |FROM z, tot GROUP BY 1, tot_false, tot_true""".stripMargin
  }

  // the deterministic MinHash permutation constants the Spark plan
  // bakes in, inlined as exact BIGINT literals
  private def permsSql: String = {
    val (pa, pb) = graft.functions.DedupHashing.perms(graft.operators.Dedup.NumHashes)
    pa.indices.map(j => s"($j, ${pa(j)}, ${pb(j)})").mkString(", ")
  }
  // rows per band derives from the same constants MinHashBands uses —
  // changing NumHashes/Bands re-bands both sides together
  private val BandRows = graft.operators.Dedup.NumHashes / graft.operators.Dedup.Bands

  // connected components as a recursive reachability closure: reach
  // (id, r) holds every node r reachable from id; min(r) = cluster id.
  // Shared by dedup_clusters (min-label) and dedup_clusters_star
  // (star contraction) — both must produce this exact table.
  private val clustersOracle: String =
    """WITH RECURSIVE
      |t AS (
      |  SELECT doc_id, lang, CAST(floor(n_chars/100) AS BIGINT) AS lb,
      |    list_distinct(list_transform(regexp_split_to_array(text, '\s+'),
      |      x -> md5_number_lower(x))) AS w
      |  FROM documents),
      |jp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
      |  WHERE round(len(list_intersect(a.w, b.w)) /
      |      (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 4) >= 0.6),
      |e AS (SELECT id_a AS src, id_b AS dst FROM jp
      |      UNION ALL SELECT id_b, id_a FROM jp),
      |n AS (SELECT DISTINCT src AS id FROM e),
      |reach AS (
      |  SELECT id, id AS r FROM n
      |  UNION
      |  SELECT e.src AS id, reach.r FROM e JOIN reach ON reach.id = e.dst)
      |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin

  def oracles: Map[String, String] = Map(
    // the same corruption, blocking (±1-cent band probes), quantized
    // trigram jaccard, declared log-odds weights and zone census —
    // DuckDB's scalar range(a,b) is the list [a, b) and // floors,
    // matching Spark's div on the shift-positive operands
    "q_record_link" ->
      (s"WITH $linkPreludeSql,\n" +
        """dec AS (SELECT dk, ck,
          |    (CASE WHEN jq >= 629146 THEN 4500 ELSE -2293 END
          |     + CASE WHEN bdiff <= 1 THEN 6856 ELSE -2996 END
          |     + CASE WHEN sfx THEN 606 ELSE -442 END) AS score
          |  FROM sc),
          |z AS (SELECT CASE WHEN score >= 9000 THEN 'match'
          |    WHEN score >= 2000 THEN 'possible' ELSE 'non_match' END
          |    AS decision,
          |    CASE WHEN dk = ck THEN 1 ELSE 0 END AS is_true
          |  FROM dec),
          |""".stripMargin + linkCensusSql),

    "q_record_link_em" -> recordLinkEmSql,
    "q_record_link_thresh" -> recordLinkThreshSql,

    // MinHash LSH is reproduced bit-exactly: shingle hashes and band
    // bucket keys live in DuckDB's md5_number_lower space, and the
    // permutation constants are inlined above. Output = pairs sharing
    // >= 1 band bucket, exact-Jaccard-verified (identical texts share
    // all bands, so the per-doc formulation equals Spark's
    // collapse-then-expand one).
    "dedup_minhash" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws FROM documents),
         |base AS (
         |  SELECT doc_id, ws,
         |    list_distinct(list_transform(ws, x -> md5_number_lower(x))) AS wd
         |  FROM d WHERE len(ws) >= 3),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
         |  FROM base),
         |hh AS (
         |  SELECT doc_id, CAST(md5_number_lower(s) & 2147483647 AS BIGINT) AS h
         |  FROM sh),
         |p(j, a, b) AS (VALUES $permsSql),
         |sig AS (
         |  SELECT doc_id, p.j, min(p.a * hh.h + p.b) AS sg
         |  FROM hh CROSS JOIN p GROUP BY doc_id, p.j),
         |band AS (
         |  SELECT doc_id,
         |    md5_number_lower(string_agg(CAST(sg AS VARCHAR), ' ' ORDER BY j)
         |      || ' ' || CAST(j // $BandRows AS VARCHAR)) AS bk
         |  FROM sig GROUP BY doc_id, j // $BandRows),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM band x JOIN band y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |ver AS (
         |  SELECT c.id_a, c.id_b,
         |    round(len(list_intersect(a.wd, b.wd)) /
         |      (len(a.wd) + len(b.wd) - len(list_intersect(a.wd, b.wd))), 4) AS jaccard
         |  FROM cand c
         |  JOIN base a ON a.doc_id = c.id_a
         |  JOIN base b ON b.doc_id = c.id_b)
         |SELECT id_a, id_b, jaccard FROM ver WHERE jaccard >= 0.5""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n_dups, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,

    // rep-level banding replay (dedup_minhash's pipeline over the
    // distinct-text reps) + BRUTE-FORCE truth: the Spark side's
    // size-bucket truth blocking must find exactly these pairs, so
    // blocking completeness is itself under the hash gate
    "dedup_eval" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS ws
         |  FROM documents),
         |f AS (SELECT doc_id, text, ws FROM d WHERE len(ws) >= 3),
         |rep AS MATERIALIZED (
         |  SELECT min(doc_id) AS doc_id, arg_min(ws, doc_id) AS ws
         |  FROM f GROUP BY md5(text)),
         |base AS MATERIALIZED (
         |  SELECT doc_id, ws,
         |    list_distinct(list_transform(ws, x -> md5_number_lower(x))) AS wd
         |  FROM rep),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
         |  FROM base),
         |hh AS (
         |  SELECT doc_id, CAST(md5_number_lower(s) & 2147483647 AS BIGINT) AS h
         |  FROM sh),
         |p(j, a, b) AS (VALUES $permsSql),
         |sig AS (
         |  SELECT doc_id, p.j, min(p.a * hh.h + p.b) AS sg
         |  FROM hh CROSS JOIN p GROUP BY doc_id, p.j),
         |band AS (
         |  SELECT doc_id,
         |    md5_number_lower(string_agg(CAST(sg AS VARCHAR), ' ' ORDER BY j)
         |      || ' ' || CAST(j // $BandRows AS VARCHAR)) AS bk
         |  FROM sig GROUP BY doc_id, j // $BandRows),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM band x JOIN band y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |jac AS MATERIALIZED (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    round(len(list_intersect(a.wd, b.wd)) /
         |      (len(a.wd) + len(b.wd) - len(list_intersect(a.wd, b.wd))), 4)
         |      AS j
         |  FROM base a JOIN base b ON a.doc_id < b.doc_id),
         |truth AS MATERIALIZED (SELECT id_a, id_b FROM jac WHERE j >= 0.5),
         |tp AS MATERIALIZED (
         |  SELECT c.id_a, c.id_b FROM cand c
         |  JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b)
         |SELECT (SELECT count(*) FROM base) AS n_reps,
         |  (SELECT count(*) FROM truth) AS n_truth,
         |  (SELECT count(*) FROM cand) AS n_cand,
         |  (SELECT count(*) FROM tp) AS n_tp,
         |  CASE WHEN (SELECT count(*) FROM cand) > 0 THEN
         |    round(CAST((SELECT count(*) FROM tp) AS DOUBLE)
         |      / (SELECT count(*) FROM cand), 4) END AS band_precision,
         |  CASE WHEN (SELECT count(*) FROM truth) > 0 THEN
         |    round(CAST((SELECT count(*) FROM tp) AS DOUBLE)
         |      / (SELECT count(*) FROM truth), 4) END AS band_recall"""
        .stripMargin,
    // the sampled eval replays the same banding; truth is the SAME
    // brute force restricted to pairs touching the 1/7 id sample
    "dedup_eval_sampled" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS ws
         |  FROM documents),
         |f AS (SELECT doc_id, text, ws FROM d WHERE len(ws) >= 3),
         |rep AS MATERIALIZED (
         |  SELECT min(doc_id) AS doc_id, arg_min(ws, doc_id) AS ws
         |  FROM f GROUP BY md5(text)),
         |base AS MATERIALIZED (
         |  SELECT doc_id, ws,
         |    list_distinct(list_transform(ws, x -> md5_number_lower(x))) AS wd
         |  FROM rep),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
         |  FROM base),
         |hh AS (
         |  SELECT doc_id, CAST(md5_number_lower(s) & 2147483647 AS BIGINT) AS h
         |  FROM sh),
         |p(j, a, b) AS (VALUES $permsSql),
         |sig AS (
         |  SELECT doc_id, p.j, min(p.a * hh.h + p.b) AS sg
         |  FROM hh CROSS JOIN p GROUP BY doc_id, p.j),
         |band AS (
         |  SELECT doc_id,
         |    md5_number_lower(string_agg(CAST(sg AS VARCHAR), ' ' ORDER BY j)
         |      || ' ' || CAST(j // $BandRows AS VARCHAR)) AS bk
         |  FROM sig GROUP BY doc_id, j // $BandRows),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM band x JOIN band y ON x.bk = y.bk AND x.doc_id < y.doc_id
         |  WHERE x.doc_id % 7 = 0 OR y.doc_id % 7 = 0),
         |jac AS MATERIALIZED (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    round(len(list_intersect(a.wd, b.wd)) /
         |      (len(a.wd) + len(b.wd) - len(list_intersect(a.wd, b.wd))), 4)
         |      AS j
         |  FROM base a JOIN base b ON a.doc_id < b.doc_id
         |  WHERE a.doc_id % 7 = 0 OR b.doc_id % 7 = 0),
         |truth AS MATERIALIZED (SELECT id_a, id_b FROM jac WHERE j >= 0.5),
         |tp AS MATERIALIZED (
         |  SELECT c.id_a, c.id_b FROM cand c
         |  JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b)
         |SELECT (SELECT count(*) FROM base) AS n_reps,
         |  (SELECT count(*) FROM base WHERE doc_id % 7 = 0) AS n_sample,
         |  (SELECT count(*) FROM truth) AS n_truth_s,
         |  (SELECT count(*) FROM cand) AS n_cand_s,
         |  (SELECT count(*) FROM tp) AS n_tp_s,
         |  CASE WHEN (SELECT count(*) FROM cand) > 0 THEN
         |    round(CAST((SELECT count(*) FROM tp) AS DOUBLE)
         |      / (SELECT count(*) FROM cand), 4) END AS precision_est,
         |  CASE WHEN (SELECT count(*) FROM truth) > 0 THEN
         |    round(CAST((SELECT count(*) FROM tp) AS DOUBLE)
         |      / (SELECT count(*) FROM truth), 4) END AS recall_est"""
        .stripMargin,

    "dedup_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars/100) AS BIGINT) AS lb,
        |    list_distinct(list_transform(regexp_split_to_array(text, '\s+'),
        |      x -> md5_number_lower(x))) AS w
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(len(list_intersect(a.w, b.w)) /
        |      (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 4) AS jaccard
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.6""".stripMargin,
    "dedup_sweep" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars/100) AS BIGINT) AS lb,
        |    list_distinct(list_transform(regexp_split_to_array(text, '\s+'),
        |      x -> md5_number_lower(x))) AS w
        |  FROM documents),
        |p AS (
        |  SELECT round(len(list_intersect(a.w, b.w)) /
        |      (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 4) AS j
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
        |SELECT
        |  CAST(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_50,
        |  CAST(sum(CASE WHEN j >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_60,
        |  CAST(sum(CASE WHEN j >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_70,
        |  CAST(sum(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_80,
        |  CAST(sum(CASE WHEN j >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_90
        |FROM p""".stripMargin,
    // span trimming: positional grams over distinct texts, member-doc
    // frequency, 5-wide coverage windows, ordered reassembly
    "dedup_spans_trim" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h, text FROM documents),
        |mc AS (SELECT h, count(*) AS mc FROM d GROUP BY h),
        |rep AS (SELECT h, arg_min(text, doc_id) AS text FROM d GROUP BY h),
        |rw AS (SELECT h, regexp_split_to_array(text, '\s+') AS ws FROM rep),
        |g AS (
        |  SELECT h, i.i AS pos,
        |    md5_number_lower(array_to_string(ws[i.i:i.i+4], ' ')) AS gh
        |  FROM rw, unnest(range(1, len(ws) - 3)) i(i)
        |  WHERE len(ws) >= 5),
        |df AS (SELECT gh, sum(mc.mc) AS df FROM g JOIN mc USING (h) GROUP BY gh),
        |sh AS (SELECT gh FROM df WHERE df >= 2),
        |cov AS (SELECT DISTINCT g.h, c.c AS cpos
        |  FROM g JOIN sh USING (gh), unnest(range(g.pos, g.pos + 5)) c(c)),
        |wp AS (SELECT h, generate_subscripts(ws, 1) AS wp, unnest(ws) AS word FROM rw),
        |kept AS (
        |  SELECT wp.h, wp.wp, wp.word FROM wp
        |  LEFT JOIN cov ON cov.h = wp.h AND cov.cpos = wp.wp
        |  WHERE cov.h IS NULL),
        |ro AS (SELECT h, count(*) AS n_kept,
        |  md5(string_agg(word, ' ' ORDER BY wp)) AS trimmed_h
        |  FROM kept GROUP BY h),
        |nw AS (SELECT h, len(ws) AS n_words FROM rw)
        |SELECT d.doc_id, CAST(nw.n_words AS BIGINT) AS n_words,
        |  CAST(coalesce(ro.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(nw.n_words - coalesce(ro.n_kept, 0) AS BIGINT) AS n_trimmed,
        |  coalesce(ro.trimmed_h, md5('')) AS trimmed_h
        |FROM d JOIN nw USING (h) LEFT JOIN ro ON ro.h = d.h""".stripMargin,
    "dedup_clusters" -> clustersOracle,
    // the star-contraction variant computes the same components; one
    // oracle definition keeps both gates pinned to one semantic
    "dedup_clusters_star" -> clustersOracle,
    // the merge path must equal a full recompute over all pairs
    "dedup_clusters_merge" -> clustersOracle,
    "dedup_apply" ->
      """WITH RECURSIVE
        |t AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars/100) AS BIGINT) AS lb,
        |    list_distinct(list_transform(regexp_split_to_array(text, '\s+'),
        |      x -> md5_number_lower(x))) AS w
        |  FROM documents),
        |jp AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.w, b.w)) /
        |      (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 4) >= 0.6),
        |e AS (SELECT id_a AS src, id_b AS dst FROM jp
        |      UNION ALL SELECT id_b, id_a FROM jp),
        |n AS (SELECT DISTINCT src AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM n
        |  UNION
        |  SELECT e.src AS id, reach.r FROM e JOIN reach ON reach.id = e.dst),
        |drops AS (
        |  SELECT id AS doc_id FROM (
        |    SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
        |  WHERE id <> cluster_id)
        |SELECT lang, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |GROUP BY lang""".stripMargin,
    // same recursive cluster replay as dedup_apply; only the keeper
    // rule differs (longest member, tie min id)
    "dedup_apply_priority" ->
      """WITH RECURSIVE
        |t AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars/100) AS BIGINT) AS lb,
        |    list_distinct(list_transform(regexp_split_to_array(text, '\s+'),
        |      x -> md5_number_lower(x))) AS w
        |  FROM documents),
        |jp AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.w, b.w)) /
        |      (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 4) >= 0.6),
        |e AS (SELECT id_a AS src, id_b AS dst FROM jp
        |      UNION ALL SELECT id_b, id_a FROM jp),
        |n AS (SELECT DISTINCT src AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM n
        |  UNION
        |  SELECT e.src AS id, reach.r FROM e JOIN reach ON reach.id = e.dst),
        |memb AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        |rk AS (
        |  SELECT m.id AS doc_id,
        |    row_number() OVER (PARTITION BY m.cluster_id
        |      ORDER BY d.n_chars DESC, m.id) AS krk
        |  FROM memb m JOIN documents d ON d.doc_id = m.id),
        |drops AS (SELECT doc_id FROM rk WHERE krk > 1)
        |SELECT lang, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |GROUP BY lang""".stripMargin,
    // The 4×16-bit band blocking is COMPLETE for Hamming ≤ 3
    // (pigeonhole), so the oracle is the brute-force semantic: rebuild
    // each 64-bit signature from md5_number_lower word hashes (±1 votes
    // per bit, sign → bit; duplicates counted — no list_distinct), then
    // keep every pair with popcount(xor) ≤ 3.
    "dedup_simhash" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents),
        |wh AS (
        |  SELECT doc_id, md5_number_lower(unnest(ws)) AS h FROM d),
        |votes AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM wh, range(0, 64) t(j) GROUP BY doc_id, j),
        |sim AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v > 0 THEN 1::UBIGINT << j ELSE 0::UBIGINT END)
        |      AS UBIGINT) AS sig
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,
    // drops are text-hash-level: any incoming text exactly present in
    // the corpus, or whose representative verified as a near-dup of a
    // corpus representative within its (lang, length-bucket) block
    "dedup_incremental" ->
      """WITH inc AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars/100) AS BIGINT) AS lb,
        |    text, n_chars, md5(text) AS h,
        |    list_distinct(list_transform(regexp_split_to_array(text, '\s+'),
        |      x -> md5_number_lower(x))) AS w
        |  FROM documents WHERE doc_id % 2 = 1),
        |cor AS (
        |  SELECT lang, CAST(floor(n_chars/100) AS BIGINT) AS lb,
        |    md5(text) AS h,
        |    list_distinct(list_transform(regexp_split_to_array(text, '\s+'),
        |      x -> md5_number_lower(x))) AS w
        |  FROM documents WHERE doc_id % 2 = 0),
        |exact_h AS (SELECT DISTINCT h FROM cor),
        |near_h AS (
        |  SELECT DISTINCT i.h
        |  FROM (SELECT DISTINCT h, lang, lb, w FROM inc) i
        |  JOIN (SELECT DISTINCT h, lang, lb, w FROM cor) c
        |    ON i.lang = c.lang AND i.lb = c.lb
        |  WHERE round(len(list_intersect(i.w, c.w)) /
        |      (len(i.w) + len(c.w) - len(list_intersect(i.w, c.w))), 4) >= 0.6),
        |kept AS (
        |  SELECT * FROM inc
        |  WHERE h NOT IN (SELECT h FROM exact_h)
        |    AND h NOT IN (SELECT h FROM near_h))
        |SELECT lang, count(*) AS n_new,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_new
        |FROM kept GROUP BY lang""".stripMargin,
    // span df counts DOCS (not distinct texts): DuckDB formulates it
    // directly as count(DISTINCT doc_id) per gram — equal to Spark's
    // member-count-weighted rep sum because identical texts contribute
    // identical gram sets
    "dedup_spans" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-3),
        |    i -> md5_number_lower(w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |      || ' ' || w[i+3] || ' ' || w[i+4]))) AS gs
        |  FROM d WHERE len(w) >= 5),
        |e AS (SELECT doc_id, len(gs) AS n_spans, unnest(gs) AS gh FROM g),
        |dfq AS (SELECT gh, count(DISTINCT doc_id) AS df FROM e GROUP BY gh)
        |SELECT e.doc_id, CAST(e.n_spans AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  round(sum(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) / e.n_spans, 4)
        |    AS dup_span_frac
        |FROM e JOIN dfq ON e.gh = dfq.gh
        |GROUP BY e.doc_id, e.n_spans""".stripMargin,
    "dedup_ngram" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars/100) AS BIGINT) AS lb,
        |    regexp_split_to_array(text, '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang, lb,
        |    list_distinct(list_transform(range(1, len(w)),
        |      i -> md5_number_lower(w[i] || ' ' || w[i+1]))) AS bg
        |  FROM t WHERE len(w) >= 2),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(len(list_intersect(a.bg, b.bg)) /
        |      (len(a.bg) + len(b.bg) - len(list_intersect(a.bg, b.bg))), 4) AS jaccard
        |  FROM g a JOIN g b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5""".stripMargin,
    "text_containment" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h, text FROM documents),
        |rep AS (SELECT h, min(doc_id) AS rid, arg_min(text, doc_id) AS text
        |  FROM d GROUP BY h),
        |tw AS (SELECT rid, h, regexp_split_to_array(text, '\s+') AS ws FROM rep),
        |t AS (SELECT rid, h,
        |  list_distinct(list_transform(range(1, len(ws) - 1),
        |    i -> md5_number_lower(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS w
        |  FROM tw WHERE len(ws) >= 3),
        |t2 AS (SELECT * FROM t WHERE len(w) >= 1),
        |g AS (SELECT h, unnest(w) AS gh FROM t2),
        |dfc AS (SELECT gh, count(*) AS df FROM g GROUP BY gh),
        |pref AS (SELECT ha, gh FROM (
        |  SELECT g.h AS ha, g.gh, s.len,
        |    row_number() OVER (PARTITION BY g.h ORDER BY dfc.df, g.gh) AS rn
        |  FROM g JOIN dfc USING (gh)
        |  JOIN (SELECT h, len(w) AS len FROM t2) s ON s.h = g.h)
        |  WHERE rn <= floor(len * 0.1) + 1),
        |cand AS (SELECT DISTINCT p.ha, g2.h AS hb
        |  FROM pref p JOIN g g2 ON g2.gh = p.gh AND g2.h <> p.ha),
        |v AS (SELECT ta.rid AS ra, tb.rid AS rb,
        |    round(len(list_intersect(ta.w, tb.w)) / len(ta.w), 4) AS containment
        |  FROM cand
        |  JOIN t2 ta ON ta.h = cand.ha
        |  JOIN t2 tb ON tb.h = cand.hb)
        |SELECT doc_id, container_id, containment FROM (
        |  SELECT ra AS doc_id, rb AS container_id, containment,
        |    row_number() OVER (PARTITION BY ra
        |      ORDER BY containment DESC, rb) AS rk
        |  FROM v) WHERE rk = 1""".stripMargin
  )
}
