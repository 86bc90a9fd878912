package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis query pack over `documents` (SURVEY.md §2): token
  * stats, quality scoring, heuristic language ID, fingerprinting.
  * Single-pass, shuffle only for the final small aggregations. */
object TextPack extends QueryPack {

  /** Gated BPE training depth (round 11: 3 → 16). The oracle replays
    * every round as a MATERIALIZED CTE pair, so this is also the
    * oracle's stage count. */
  val BpeTrainRounds = 16

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).withColumn("w", words(col("text")))

  /** The `text_bpe_train` plan body (see the defs entry's docstring for
    * semantics). `ckpt` is the iterative-state seam
    * ([[graft.operators.CheckpointStrategy]]): each round's vocab
    * re-materialization goes through it, so a reliable-checkpoint run
    * survives executor loss at the cost of a vocab-sized write per
    * round. CheckpointStrategySpec gates Local/Reliable equality. */
  def bpeTrain(s: SparkSession, d: String, rounds: Int = BpeTrainRounds,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local,
      vocabPartitions: Int = 1): DataFrame = {
    import s.implicits._
    // the vocab table is CHECKPOINTED once: without it, every
    // round's argmax action re-executes the full corpus word-count
    // through lineage (measured 12.1 s → 2.5 s at the 10× probe);
    // with it the corpus is scanned exactly once and each round's
    // rewrite re-materializes only the vocab-sized table.
    // The vocab then lives at `vocabPartitions` (the corpus agg stays
    // fully parallel — this is a post-agg exchange of vocab-sized
    // rows): a distinct-WORD table is orders of magnitude smaller
    // than its corpus, and the training loop's cost is per-round
    // STAGE overhead × rounds, not data — at 32 partitions the
    // 16-round loop spent 37 s scheduling ~2,000 near-empty tasks for
    // a 31-word vocab (measured sf0.1; 2.5 s at 1 partition). A
    // billion-word-corpus vocab (~10M rows) still fits a handful of
    // partitions; raise this only when one partition's rewrite
    // becomes the bottleneck.
    var seqs = ckpt(docs(s, d)
      .select(explode(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "),
        concat_ws(" ", split(col("word"), "")), lit(" ")).as("seq"),
        col("cnt"))
      .repartition(vocabPartitions))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val toks = split(trim(col("seq")), " ")
      val top = seqs
        .where(size(toks) >= 2)
        .select(explode(transform(sequence(lit(0), size(toks) - 2),
          i => concat(element_at(toks, i + 1), lit(" "),
            element_at(toks, i + 2)))).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) {
        // degenerate corpus: no word has >= 2 symbols left — stop
        // with the merges learned so far instead of throwing
        exhausted = true
      } else {
        val (bp, pc) = (top(0).getString(0), top(0).getLong(1))
        val merged = bp.replace(" ", "")
        merges += ((round, bp, merged, pc))
        val delim = " " + bp + " "
        // delta index: the contains() pre-filter is a cheap scan of
        // the checkpointed vocab; the regexp runs only on hits
        val hit = seqs.where(col("seq").contains(delim))
          .withColumn("seq",
            regexp_replace(col("seq"),
              lit(java.util.regex.Pattern.quote(delim)),
              lit(java.util.regex.Matcher.quoteReplacement(s" $merged "))))
        // coalesce pins the partition count (the union of two
        // seqs-derived branches would double it every round)
        seqs = ckpt(hit.unionByName(seqs.where(!col("seq").contains(delim)))
          .coalesce(vocabPartitions))
        round += 1
      }
    }
    merges.result().toDF("round", "pair", "merged", "cnt")
  }

  /** The engine's one quality-score definition (length, stopword and
    * punctuation signals, rounded to 6 so every engine agrees at
    * decision boundaries). Shared by text_quality,
    * text_filter_adaptive, q_mixture_quality and text_quality_bins —
    * one formula, one oracle twin. Expects `text` and `w` columns. */
  private def qualityScore: Column = {
    val nWords = size(col("w"))
    val nChars = length(col("text"))
    val stopR = round(hitCount(col("w"), langProfiles.toMap.apply("en")) / nWords, 6)
    val punctR = round((nChars - charClassCount(col("text"), "a-zA-Z0-9 ")) / nChars, 6)
    round(lit(0.5) * least(lit(1.0), nWords / 50.0)
      + lit(0.3) * stopR + lit(0.2) * (lit(1.0) - punctR), 6)
  }

  private[graft] val CoverageK = 5

  /** Greedy max-coverage document selection (Nemhauser, Wolsey &
    * Fisher 1978 — the (1−1/e) greedy; the facility-location shape of
    * training-data subset selection, cf. submodular data curation):
    * k rounds, each picking the document with the largest MARGINAL
    * distinct-token gain over everything already covered (ties → min
    * doc_id), the budgeted "which docs buy the most new vocabulary"
    * readout a top-k-by-length cannot give (long near-duplicate docs
    * add nothing; the spec plants exactly that trap). Output: one row
    * per round (t, doc_id, gain, covered). Scale shape: the covered
    * set is bounded by the BUDGET's token mass (k docs' distinct
    * tokens — broadcastable), so each round is one broadcast anti-join
    * over the (doc, token) pair table + a doc-keyed hash agg + a
    * top-1; k scans total, nothing corpus-sized ever sits in driver
    * or state. */
  private[graft] def coverageGreedyFrom(pairs0: DataFrame,
      k: Int = CoverageK): DataFrame = {
    val s = pairs0.sparkSession
    val pairs = pairs0.localCheckpoint(true)
    var pickedIds = Vector.empty[Long]
    var out = Vector.empty[(Int, Long, Long, Long)]
    for (t <- 1 to k) {
      val cand = if (pickedIds.isEmpty) pairs
        else pairs.join(
          broadcast(pairs.filter(col("doc_id").isin(pickedIds: _*))
            .select("tok").distinct()),
          Seq("tok"), "left_anti")
      val best = cand.groupBy("doc_id").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id")).limit(1)
        .collect().headOption
      best.foreach { b =>
        pickedIds :+= b.getLong(0)
        val covered = pairs.filter(col("doc_id").isin(pickedIds: _*))
          .select("tok").distinct().count()
        out :+= ((t, b.getLong(0), b.getLong(1), covered))
      }
    }
    import s.implicits._
    out.toDF("t", "doc_id", "gain", "covered")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "text_coverage_greedy" -> ((s, d) => {
      // coverage universe = BIGRAMS (the unigram vocabulary of the
      // synthetic corpus is 31 tokens — one doc covers it and the
      // greedy run degenerates to a single round; bigrams give a
      // 916-type universe at gate scale and 5 genuine rounds)
      val n1 = greatest(size(col("w")) - 1, lit(0))
      coverageGreedyFrom(docs(s, d)
        .select(col("doc_id"), explode(zip_with(
          slice(col("w"), lit(1), n1), slice(col("w"), lit(2), n1),
          (a, b) => concat(a, lit(" "), b))).as("tok"))
        .distinct())
    }),

    "token_count" -> ((s, d) => {
      docs(s, d)
        .select(col("lang"), size(col("w")).as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          round(avg("n_tokens"), 4).as("avg_tokens"),
          max("n_tokens").as("max_tokens"))
    }),

    // Heaps-law vocabulary-growth audit (round 11) — the corpus-health
    // curve V(n): cumulative distinct vocabulary vs cumulative tokens
    // over doc_id-ordered 100-doc prefixes. A natural corpus grows
    // vocabulary sub-linearly (V ≈ K·n^β, β≈0.5); a flat curve means
    // template/duplicated content, a linear one means synthetic noise
    // — both pre-training red flags no per-doc quality score catches.
    // The heavy step is ONE word→min(bucket) hash agg (map-side
    // combined, shuffles distinct words once — the §3a′ per-distinct
    // collapse); the cumulative readout rides the range-partitioned
    // two-pass [[graft.operators.PrefixSum]] (round 16) — the bucket
    // table grows as docs/100, so the earlier Window.orderBy running
    // total was the repo's last unbounded SINGLE-partition fold
    // (PlanSpec now pins the plan window-free). All counts
    // integer-exact; values identical to the global window.
    "text_vocab_growth" -> ((s, d) => {
      val dw = docs(s, d)
        .select(expr("doc_id div 100").as("b"), explode(col("w")).as("word"))
        .where(col("word") =!= "")
      val wf = dw.groupBy("word").agg(min("b").as("fb"))
      val vh = wf.groupBy(col("fb").as("b")).agg(count(lit(1)).as("nv"))
      val tb = dw.groupBy("b").agg(count(lit(1)).as("toks"))
      val db = Tables.documents(s, d)
        .select(expr("doc_id div 100").as("b"))
        .groupBy("b").agg(count(lit(1)).as("nd"))
      val base = db.join(tb, Seq("b"), "left").join(vh, Seq("b"), "left")
        .select(col("b"), col("nd"),
          coalesce(col("toks"), lit(0L)).as("toks"),
          coalesce(col("nv"), lit(0L)).as("nv"))
      graft.operators.PrefixSum.cumulative(base, "b",
          Seq("nd", "toks", "nv"))
        .select(col("b").as("bucket"), col("nd").as("n_docs"),
          col("toks").as("cum_tokens"), col("nv").as("vocab"))
    }),

    "text_quality" -> ((s, d) => {
      val nWords = size(col("w"))
      val nChars = length(col("text"))
      val stopHits = hitCount(col("w"), langProfiles.toMap.apply("en"))
      val digitR = round(charClassCount(col("text"), "0-9") / nChars, 6)
      val alnumSpace = "a-zA-Z0-9 "
      val punctR = round((nChars - charClassCount(col("text"), alnumSpace)) / nChars, 6)
      val stopR = round(stopHits / nWords, 6)
      docs(s, d).select(
        col("doc_id"),
        nChars.cast("long").as("n_chars"),
        nWords.cast("long").as("n_words"),
        round(length(regexp_replace(col("text"), " ", "")) / nWords, 4).as("avg_word_len"),
        digitR.as("digit_ratio"),
        punctR.as("punct_ratio"),
        stopR.as("stop_ratio"),
        qualityScore.as("quality_score"))
    }),

    "lang_id" -> ((s, d) => {
      docs(s, d)
        .withColumn("predicted", predictedLang(col("w")))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
    }),

    // Gopher-style repetition signals: the fraction of tokens taken by
    // the single most frequent word / word-bigram. High values flag the
    // boilerplate and keyword-stuffed docs a training pipeline drops.
    // Bigrams are built array-side per row (triShingles' pattern) so
    // the only shuffles are the two partial-combined aggregations — no
    // per-token window sort, no token strings riding an extra exchange.
    "text_repetition" -> ((s, d) => {
      // signals are a pure function of the text: compute per DISTINCT
      // text, expand to docs by text hash at the end
      val hashed = graft.operators.Dedup.withTextHash(
        docs(s, d).filter(size(col("w")) >= 2)
          .select(col("doc_id"), col("text"), col("w")), "text").drop("text")
      val members = hashed.select("doc_id", "h")
      val reps = hashed.dropDuplicates("h").select("h", "w")
      val wordTop = reps
        .select(col("h"), explode(col("w")).as("t"))
        .groupBy("h", "t").agg(count(lit(1)).as("n"))
        .groupBy("h")
        .agg(round(max("n") / sum("n"), 4).as("top_word_frac"))
      val bigrams = transform(sequence(lit(0), size(col("w")) - 2), i =>
        concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2)))
      val bigramTop = reps
        .select(col("h"), explode(bigrams).as("bg"))
        .groupBy("h", "bg").agg(count(lit(1)).as("n"))
        .groupBy("h")
        .agg(round(max("n") / sum("n"), 4).as("top_bigram_frac"))
      wordTop.join(bigramTop, "h").join(members, "h")
        .select("doc_id", "top_word_frac", "top_bigram_frac")
    }),

    // Benchmark decontamination: per TRAIN doc, how many of its distinct
    // word 3-grams appear anywhere in the EVAL split (doc_id % 20 == 0 —
    // a stand-in benchmark set). The n-gram inverted index of the eval
    // side is benchmark-sized (small by definition), so it broadcasts;
    // the corpus side is one scan + explode + hash agg — the exact shape
    // a 100 TB decontamination pass needs (no corpus self-join). Gram
    // stats are computed once per distinct text (§3a') and expanded to
    // member docs by text hash.
    "text_contamination" -> ((s, d) => {
      import graft.functions.DedupExpressions.ngramHashSet
      val hashed = graft.operators.Dedup.withTextHash(
        Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
      val members = hashed.select("doc_id", "h")
      val repG = hashed.dropDuplicates("h")
        .withColumn("g", ngramHashSet(words(col("text")), 3))
        .filter(col("g").isNotNull)
        .select(col("h"), col("g"))
      // eval membership is per doc_id: the eval gram set is the union
      // over texts that have at least one eval member
      val evalH = members.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select("h").distinct()
      val benchGrams = repG.join(broadcast(evalH), "h")
        .select(explode(col("g")).as("gh")).distinct()
      val repStats = repG
        .select(col("h"), size(col("g")).as("n_grams"), explode(col("g")).as("gh"))
        .join(broadcast(benchGrams.withColumn("hit", lit(1))), Seq("gh"), "left")
        .groupBy("h", "n_grams")
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_contam"))
      members.filter(pmod(col("doc_id"), lit(20)) =!= 0)
        .join(repStats, "h")
        .select(col("doc_id"), col("n_grams").cast("long").as("n_grams"),
          col("n_contam"),
          round(col("n_contam") / col("n_grams"), 4).as("contam_frac"))
    }),

    // Canonical text normalization — the step every hash-keyed op
    // (exact dedup, fingerprints, contamination) runs first in a real
    // pipeline: Unicode NFC (native codegen'd expression), lowercase,
    // whitespace collapse, trim. Output keeps the dump atomic: lengths,
    // a changed flag, and the md5 of the canonical form (the key
    // downstream dedup would group on). Pure per-row column math — one
    // scan, no shuffle, whole-stage codegen end to end.
    "text_normalize" -> ((s, d) => {
      import graft.functions.NormalizeExpression.nfcNormalize
      val norm = trim(regexp_replace(lower(nfcNormalize(col("text"))), "\\s+", " "))
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(norm).cast("long").as("n_chars_norm"),
        (norm =!= col("text")).as("changed"),
        md5(norm.cast("binary")).as("h_norm"))
    }),

    "text_fingerprint" -> ((s, d) => {
      docs(s, d)
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), fingerprint(col("w")).as("fp"))
    }),

    // Adaptive quality filtering: instead of global constants, each
    // source drops its own bottom decile by quality score — the cut
    // adapts to per-source quality distributions (a boilerplate-heavy
    // crawl and a curated corpus get different bars). The per-source
    // cut is an exact percentile computed as a window aggregate over
    // ONE subtree (a groupBy+join would plan the scan twice); the
    // score itself is text_quality's formula. At 100 TB swap the exact
    // percentile for approx_percentile — the plan shape is unchanged.
    "text_filter_adaptive" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val q = qualityScore
      docs(s, d).select(col("source"), q.as("q"))
        .withColumn("cut",
          round(expr("percentile(q, 0.1)").over(Window.partitionBy("source")), 6))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("q") > col("cut"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("q") <= col("cut"), 1L).otherwise(0L)).as("n_dropped"),
          min("cut").as("cut"))
    }),

    // One-row corpus health report — the operational dashboard a
    // curation team refreshes per snapshot: sizes, diversity, exact-dup
    // rate, and token-length quantiles, all from one scan + one global
    // aggregate (distincts expand to two-phase aggs; everything else is
    // partial-combined).
    "text_corpus_report" -> ((s, d) => {
      docs(s, d).agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("w"))).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(md5(col("text").cast("binary"))).as("n_distinct_texts"),
        round(lit(1.0) - countDistinct(md5(col("text").cast("binary")))
          / count(lit(1)), 4).as("dup_frac"),
        round(expr("percentile(size(w), 0.5)"), 2).as("p50_words"),
        round(expr("percentile(size(w), 0.9)"), 2).as("p90_words"))
    }),

    // The end-to-end curation pipeline as ONE declarative plan — the
    // composite a training-data team actually ships: normalize (NFC +
    // lowercase + whitespace collapse) → rule filter (abbreviated
    // two-rule set; text_filter_pipeline is the full battery) → exact
    // dedup on the NORMALIZED text (min-id keeper — normalization is
    // what makes near-identical crawls collapse) → per-lang mixture
    // draw to the smallest surviving stratum (the shared prefiltered
    // hash draw). Output is the per-lang funnel through all four
    // stages. Each stage re-derives from the same scan lineage — at
    // 100 TB persist the ruled/deduped sets between stages; the shape
    // per stage is scan + hash agg / bounded window, nothing
    // quadratic.
    "text_curate_pipeline" -> ((s, d) => {
      import graft.functions.NormalizeExpression.nfcNormalize
      import graft.operators.Sampling
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, d).select(col("doc_id"), col("lang"),
        size(col("w")).as("n_words"),
        round(charClassCount(col("text"), "0-9") / length(col("text")), 6)
          .as("digit_ratio"),
        md5(trim(regexp_replace(lower(nfcNormalize(col("text"))), "\\s+", " "))
          .cast("binary")).as("nh"))
      val ruled = base.filter(col("n_words") >= 15 && col("digit_ratio") <= 0.2)
      val deduped = ruled
        .withColumn("keep_id", min("doc_id").over(Window.partitionBy("nh")))
        .filter(col("doc_id") === col("keep_id"))
        .select("doc_id", "lang")
      val counts = deduped.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val strata = counts
        .withColumn("target", min("cnt").over(Window.partitionBy()))
        .select(col("lang"), col("target"),
          Sampling.prefixCut(col("target"), col("cnt")).as("cut"))
      val drawn = Sampling.stratifiedHashDraw(deduped, "lang", "doc_id",
        strata, "text_curate_pipeline")
      base.groupBy("lang").agg(count(lit(1)).as("n_input"))
        .join(ruled.groupBy("lang").agg(count(lit(1)).as("n_ruled")),
          Seq("lang"), "left")
        .join(deduped.groupBy("lang").agg(count(lit(1)).as("n_deduped")),
          Seq("lang"), "left")
        .join(drawn.groupBy("lang").agg(count(lit(1)).as("n_final")),
          Seq("lang"), "left")
        .select(col("lang"), col("n_input"),
          coalesce(col("n_ruled"), lit(0L)).as("n_ruled"),
          coalesce(col("n_deduped"), lit(0L)).as("n_deduped"),
          coalesce(col("n_final"), lit(0L)).as("n_final"))
    }),

    // Learned quality filtering by DISTILLATION — the model-based
    // filter pattern (CCNet/fastText-style) on the signal this corpus
    // actually carries: compress the engine's composite rule score
    // into a calibrated linear model. Label = "above the global median
    // quality", model = logistic regression over the RAW component
    // features (length, stopword/punct/digit ratios, word length) fit
    // on the even-doc_id half — production swaps the label source for
    // human/LLM judgments and keeps this exact plumbing. Scale shape:
    // featurization + scoring are single scans; the median is one
    // percentile aggregate broadcast back; MLlib's LR keeps k-feature
    // driver state with treeAggregate gradient passes (the k-means
    // fits' shape). Rows-gated (MLlib internals, like km_fit_mllib)
    // with a held-out AUC-floor spec.
    "text_quality_learned" -> ((s, d) => {
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val nWords = size(col("w"))
      val nChars = length(col("text"))
      val scored = docs(s, d).select(
        col("doc_id"), qualityScore.as("q"),
        array(
          least(lit(1.0), nWords / 50.0),
          round(hitCount(col("w"), langProfiles.toMap.apply("en")) / nWords, 6),
          round((nChars - charClassCount(col("text"), "a-zA-Z0-9 ")) / nChars, 6),
          round(charClassCount(col("text"), "0-9") / nChars, 6),
          round(length(regexp_replace(col("text"), " ", "")) / nWords, 4) / 10.0
        ).as("farr"))
      val med = scored.agg(round(expr("percentile(q, 0.5)"), 6).as("med"))
      val feats = scored.join(broadcast(med))
        .withColumn("features", array_to_vector(col("farr")))
        .withColumn("label", when(col("q") > col("med"), 1.0).otherwise(0.0))
      val train = feats.filter(pmod(col("doc_id"), lit(2)) === 0).cache()
      val model = try {
        new LogisticRegression().setMaxIter(25).setRegParam(0.01).fit(train)
      } finally train.unpersist()
      model.transform(feats)
        .select(col("doc_id"), col("label").cast("long").as("above_med"),
          round(element_at(vector_to_array(col("probability")), 2), 3).as("p_keep"))
    }),

    // Perplexity-proxy quality scoring — the CCNet-style LM filter with
    // a unigram stand-in: score = average negative log corpus frequency
    // of the doc's token occurrences. Fluent/common text scores low;
    // gibberish and rare-token-stuffed docs score high, and pipelines
    // cut on the score like a real LM perplexity. Linear shape: the
    // corpus unigram table is one token hash agg (counts weighted by
    // exact-dup member counts), per-doc scoring runs once per distinct
    // text (§3a'), and the corpus-total is a sanctioned single-row
    // broadcast (text_tfidf's pattern).
    "text_ppl_proxy" -> ((s, d) => {
      val hashed = graft.operators.Dedup.withTextHash(
        Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
      val members = hashed.select("doc_id", "h")
      val mcount = members.groupBy("h").agg(count(lit(1)).as("mc"))
      val tokCounts = hashed.dropDuplicates("h")
        .select(col("h"), explode(words(col("text"))).as("t"))
        .groupBy("h", "t").agg(count(lit(1)).as("n"))
      val freq = tokCounts.join(mcount, "h")
        .groupBy("t").agg(sum(col("n") * col("mc")).as("cnt"))
      val total = freq.agg(sum("cnt").as("total"))
      val scored = tokCounts.join(freq, "t").join(broadcast(total))
        .groupBy("h")
        .agg(round(sum(col("n") * -log(col("cnt") / col("total")))
          / sum(col("n")), 4).as("nll"))
      members.join(scored, "h").select("doc_id", "nll")
    }),

    // Bigram-LM perplexity proxy (round 11) — text_ppl_proxy's unigram
    // scorer upgraded to the conditional model the CCNet-style filter
    // actually approximates: per doc, mean −log2 p(w_t | w_{t−1})
    // under add-1 smoothing (p = (c(w1,w2)+1)/(c(w1)+|V|)). Scrambled
    // or stitched text scores high here even when its unigram mix is
    // normal — word ORDER is what a bigram model sees and a unigram
    // model cannot. Shapes: bigrams come from array zips on the
    // distinct-text rep (no window, no shuffle before the count agg —
    // §3a′); corpus counts are two chained hash aggs (c2 → c1 margin);
    // |V| is a 1-row broadcast; every log term is floor-quantized to
    // integer 1e-12 units BEFORE the cross-row sum (q_entropy's
    // idiom) and multiplied by its exact integer count after, so the
    // per-doc sum is partition-order-independent. Docs without a
    // bigram (< 2 tokens) drop out (inner join) — a one-word doc has
    // no conditional to score.
    "text_ppl_bigram" -> ((s, d) => {
      val hashed = graft.operators.Dedup.withTextHash(
        Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
      val members = hashed.select("doc_id", "h")
      val mc = members.groupBy("h").agg(count(lit(1)).as("mc"))
      val reps = hashed.dropDuplicates("h")
        .select(col("h"), words(col("text")).as("ws"))
      val n1 = greatest(size(col("ws")) - 1, lit(0))
      val bgc = reps.select(col("h"),
          explode(zip_with(
            slice(col("ws"), lit(1), n1), slice(col("ws"), lit(2), n1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
        .select(col("h"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("h", "w1", "w2").agg(count(lit(1)).as("n"))
      val c2 = bgc.join(mc, "h")
        .groupBy("w1", "w2").agg(sum(col("n") * col("mc")).as("c2"))
      val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
      val vocab = reps.select(explode(col("ws")).as("w")).distinct()
        .agg(count(lit(1)).as("v"))
      val scored = bgc.join(c2, Seq("w1", "w2")).join(c1, "w1")
        .crossJoin(broadcast(vocab))
        .withColumn("lq",
          floor(log2((col("c1") + col("v")).cast("double")
            / (col("c2") + lit(1L)).cast("double")) * 1e12).cast("long"))
        .groupBy("h")
        .agg(sum(col("lq") * col("n")).as("nllq"), sum("n").as("nb"))
      members.join(scored, "h")
        .select(col("doc_id"), col("nb").as("n_bigrams"),
          round((col("nllq").cast("double") / lit(1e12)) / col("nb"), 4)
            .as("nll_bits"))
    }),

    // Per-doc language-mixture detection — the curation twin of lang_id
    // (which classifies): docs whose tokens hit SEVERAL language
    // profiles strongly are code-switched or concatenation artifacts,
    // and pipelines route them separately or drop them. All signals are
    // INTEGER profile hit counts (native VocabHitCount probes — one
    // scan, no shuffle before the output), so the mixture decision
    // (second-language share ≥ 25%) is exact integer arithmetic with
    // no cross-engine float boundary at all. Argmax ties break to the
    // alphabetically first language, predictedLang's convention.
    "text_langmix" -> ((s, d) => {
      val profs = langProfiles
      val entries = array(profs.map { case (l, prof) =>
        struct((-hitCount(col("w"), prof)).cast("long").as("nh"), lit(l).as("pl"))
      }: _*)
      val total = profs.map { case (_, prof) =>
        hitCount(col("w"), prof).cast("long")
      }.reduce(_ + _)
      docs(s, d)
        .withColumn("sorted", array_sort(entries))
        .withColumn("total_hits", total)
        .select(
          col("doc_id"), col("lang"),
          col("sorted").getItem(0).getField("pl").as("top_lang"),
          (-col("sorted").getItem(0).getField("nh")).as("top_hits"),
          (-col("sorted").getItem(1).getField("nh")).as("second_hits"),
          col("total_hits"),
          ((-col("sorted").getItem(1).getField("nh")) * 4 >= col("total_hits")
            && col("total_hits") > 0).as("is_mixed"))
    }),

    // Curriculum binning: global quality QUARTILE cuts assign every doc
    // a difficulty/quality bin — the ordering key for curriculum
    // training schedules (and the audit table for "what does each
    // quality band look like"). Scale shape: the cuts are ONE
    // percentile aggregate reduced to a single row and broadcast back
    // (never a global sort/ntile over the corpus — rank-based ntile
    // would shuffle every row into one ordered partition); binning is
    // then a scan-side comparison, and the output agg is 4 rows. At
    // 100 TB swap the exact percentile for approx_percentile, same
    // shape.
    "text_quality_bins" -> ((s, d) => {
      val scored = docs(s, d).select(col("doc_id"), qualityScore.as("q"))
      val cuts = scored.agg(
        round(expr("percentile(q, 0.25)"), 6).as("c1"),
        round(expr("percentile(q, 0.5)"), 6).as("c2"),
        round(expr("percentile(q, 0.75)"), 6).as("c3"))
      scored.join(broadcast(cuts))
        .withColumn("bin",
          when(col("q") <= col("c1"), 0L).when(col("q") <= col("c2"), 1L)
            .when(col("q") <= col("c3"), 2L).otherwise(3L))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("q"), 6).as("avg_q"),
          min("q").as("min_q"), max("q").as("max_q"))
    }),

    // Quality-weighted mixture sampling — the full curation composite:
    // text_filter_adaptive's per-source bottom-decile quality cut
    // first, then q_mixture's deterministic stratified draw over the
    // SURVIVORS (every lang downsampled to the smallest surviving
    // stratum, members selected by md5-hash rank). Scale shape is the
    // two parents': the quality pass is a scan + per-source percentile
    // window; the draw never sorts a full stratum — the hash-prefix
    // prefilter cuts window input to ~2×target rows with a raise_error
    // underflow guard. The survivor subtree is referenced twice
    // (stratum counts + the draw) — the count branch reduces to k
    // (lang, cnt) rows before its exchange, and the shared window
    // subtree is exchange-reuse territory; at 100 TB persist the
    // survivor set once if the double scan ever dominates.
    "q_mixture_quality" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Sampling
      val q = qualityScore
      val surv = docs(s, d)
        .select(col("doc_id"), col("lang"), col("source"), q.as("q"))
        .withColumn("qcut",
          round(expr("percentile(q, 0.1)").over(Window.partitionBy("source")), 6))
        .filter(col("q") > col("qcut"))
        .select("doc_id", "lang", "source")
      val counts = surv.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val strata = counts
        .withColumn("target", min("cnt").over(Window.partitionBy()))
        .select(col("lang"), col("target"),
          Sampling.prefixCut(col("target"), col("cnt")).as("cut"))
      Sampling.stratifiedHashDraw(surv, "lang", "doc_id", strata,
        "q_mixture_quality")
    }),

    // Token-budget sampling — fill a fixed per-stream token budget
    // (512 tokens per (lang, shard) stream) with docs in deterministic
    // md5-hash order: a doc is kept iff the stream's running total
    // BEFORE it is under budget (the doc that crosses the line is
    // kept, split-on-boundary like text_pack). The shard key is the
    // scale-out: budget filling is inherently sequential, so
    // production fans out over many streams and each window cumsum
    // stays bounded — never a global hash sort. Output is the
    // per-stream funnel.
    "text_token_budget" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 512
      val win = Window.partitionBy("lang", "shard")
        .orderBy(col("md5h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .select(col("doc_id"), col("lang"),
          pmod(col("doc_id"), lit(8)).as("shard"),
          size(col("w")).cast("long").as("n_tokens"),
          md5(col("doc_id").cast("string").cast("binary")).as("md5h"))
        .withColumn("cum", sum("n_tokens").over(win))
        .groupBy("lang", "shard")
        .agg(count(lit(1)).as("n_seen"),
          sum("n_tokens").as("tokens_seen"),
          sum(when(col("cum") - col("n_tokens") < budget, 1L).otherwise(0L))
            .as("n_kept"),
          sum(when(col("cum") - col("n_tokens") < budget, col("n_tokens"))
            .otherwise(0L)).as("tokens_kept"))
    }),

    // The per-source token-budget mixture as ONE declarative plan —
    // the sampler composite a curation team actually runs per
    // snapshot: adaptive quality cut (each source drops its own
    // bottom decile — text_filter_adaptive's stage) → per-source doc
    // cap in deterministic md5-hash order (text_source_cap's stage) →
    // per-source token budget over the capped stream, split-on-
    // boundary (text_token_budget's stage). Output is the per-source
    // funnel through all three stages plus final token mass.
    // Scale shape: the percentile, the cap rank, and the budget
    // cumsum are all windows over the SOURCE partitioning — one
    // logical partitioning reused by three stages (cap rank and
    // budget cumsum even share one window spec, so Catalyst plans
    // them in a single Window exec), and the cap bounds the budget
    // window at `cap` rows per source, so no stream's sort exceeds
    // the cap regardless of corpus size. At 100 TB add the shard key
    // to the budget stream like text_token_budget if per-source
    // budgets exceed driver-meaningful row counts.
    "text_mixture_budget" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 15L
      val budget = 512L
      val base = docs(s, d).select(col("doc_id"), col("source"),
        size(col("w")).cast("long").as("n_tokens"), qualityScore.as("q"),
        md5(col("doc_id").cast("string").cast("binary")).as("md5h"))
      val survivors = base.withColumn("cut",
          round(expr("percentile(q, 0.1)").over(Window.partitionBy("source")), 6))
        .filter(col("q") > col("cut"))
      val drawOrder = Window.partitionBy("source")
        .orderBy(col("md5h"), col("doc_id"))
      val budgeted = survivors
        .withColumn("rk", row_number().over(drawOrder))
        .filter(col("rk") <= cap)
        .withColumn("cum", sum("n_tokens").over(
          drawOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("kept", col("cum") - col("n_tokens") < budget)
      base.groupBy("source").agg(count(lit(1)).as("n_input"))
        .join(survivors.groupBy("source")
          .agg(count(lit(1)).as("n_quality")), Seq("source"), "left")
        .join(budgeted.groupBy("source").agg(
          count(lit(1)).as("n_capped"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_final"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_final")),
          Seq("source"), "left")
        .select(col("source"), col("n_input"),
          coalesce(col("n_quality"), lit(0L)).as("n_quality"),
          coalesce(col("n_capped"), lit(0L)).as("n_capped"),
          coalesce(col("n_final"), lit(0L)).as("n_final"),
          coalesce(col("tokens_final"), lit(0L)).as("tokens_final"))
    }),

    // Exact heavy hitters (words above 0.5% of all tokens) in two
    // passes: a Misra-Gries sketch pass (k=400 counters per partition,
    // merged associatively — the exchange carries O(k) rows per
    // partition, never the distinct-word long tail), then an exact
    // re-count restricted to the <=400 candidates. MG with k counters
    // guarantees every word with count > n/k = n/400 survives the
    // sketch, a superset of the n/200 support threshold, so the final
    // answer is exact and deterministic regardless of partitioning or
    // merge order — the sketch only prunes. The candidate+total row
    // broadcasts; the membership join is a deliberate 1-row nested
    // loop (array_contains residual).
    "text_heavy_hitters" -> ((s, d) => {
      import graft.functions.FrequencyAggregate.misraGries
      val toks = docs(s, d).select(explode(col("w")).as("word"))
      val stats = broadcast(toks.agg(
        misraGries(col("word"), 400).as("cand"),
        count(lit(1)).cast("double").as("n_tokens")))
      toks.join(stats, array_contains(col("cand"), col("word")))
        .groupBy("word", "n_tokens").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > col("n_tokens") * 0.005)
        .select(col("word"), col("cnt"),
          round(col("cnt") / col("n_tokens"), 6).as("share"))
    }),

    // Sequence packing accounting — the step that packs documents into
    // fixed token-budget training sequences (budget 2048, whitespace
    // tokens). Docs are packed FIFO by doc_id within (lang, shard)
    // streams; a doc starts in the sequence its running token count
    // opens, and long docs spill across boundaries (split-on-boundary
    // packing, the standard pretraining layout). The shard key is what
    // makes this scale: packing is inherently sequential per stream, so
    // production fans out over many (lang, shard) streams and each
    // window sort stays bounded — one window pass + one small agg here,
    // never a global order-by.
    "text_pack" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 2048
      val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .select(col("doc_id"), col("lang"),
          pmod(col("doc_id"), lit(8)).as("shard"),
          size(col("w")).cast("long").as("n_tokens"))
        .withColumn("cum", sum("n_tokens").over(w))
        .withColumn("seq_id",
          floor((col("cum") - col("n_tokens")) / budget))
        .groupBy("lang", "shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          min("doc_id").as("first_doc"),
          round(sum("n_tokens") / lit(budget.toDouble), 4).as("fill"))
    }),

    // End-to-end C4/Gopher-style cleaning pass: per-doc rule evaluation
    // (too short, digit-heavy, stopword-sparse English, single-word
    // repetition) → keep/drop → per-(source, lang) funnel accounting.
    // The funnel is what a pipeline operator reports at 100 TB: how many
    // docs and chars survived, and which rule dropped the rest. Rules
    // compare ROUNDED metrics (6/6/4 decimals, the pack's conventions)
    // so both engines agree at the decision boundaries. Text-pure
    // metrics are computed once per DISTINCT text and expanded to
    // member docs by text hash (§3a'); the lang-conditional stopword
    // rule applies per member row. One scan; shuffles are the collapse,
    // the per-text word agg, and the final small funnel agg.
    "text_filter_pipeline" -> ((s, d) => {
      // the collapse exchange ships text ONLY — words re-split after
      // (shipping the pre-split array would double the shuffle bytes)
      val hashed = graft.operators.Dedup.withTextHash(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          col("source"), col("n_chars"), col("text")), "text")
      // digit_ratio lives on the MEMBER branch's scan projection: it's
      // evaluated once per doc row, codegen'd, shuffle-free. Putting a
      // char-level scalar next to an explode is a trap — Catalyst
      // collapses the projection BELOW the Generate's output, and the
      // regex then re-evaluates once per TOKEN row (measured 5 s vs
      // 1 s on sf0.1 for exactly that plan).
      val members = hashed.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("h"),
        round(charClassCount(col("text"), "0-9") / length(col("text")), 6)
          .as("digit_ratio"))
      // token metrics all derive from the narrow (h, t) count agg —
      // text_repetition's proven shape: n_words = sum n, stop hits =
      // sum n over the profile words, repetition = max n / sum n
      val en = langProfiles.toMap.apply("en")
      val repMetrics = hashed.dropDuplicates("h")
        .select(col("h"), explode(words(col("text"))).as("t"))
        .groupBy("h", "t")
        .agg(count(lit(1)).as("n"))
        .groupBy("h")
        .agg(sum("n").as("n_words"),
          round(sum(when(col("t").isin(en: _*), col("n")).otherwise(lit(0L)))
            / sum("n"), 6).as("stop_ratio"),
          round(max("n") / sum("n"), 4).as("top_word_frac"))
      val rShort = col("n_words") < 15
      val rDigit = col("digit_ratio") > 0.2
      val rStop = col("lang") === "en" && col("stop_ratio") < 0.05
      val rRep = col("top_word_frac") > 0.2
      members.join(repMetrics, "h")
        .withColumn("keep", !(rShort || rDigit || rStop || rRep))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("keep").cast("long")).as("n_kept"),
          sum(when(col("keep"), col("n_chars"))).as("chars_kept"),
          sum(rShort.cast("long")).as("drop_short"),
          sum(rDigit.cast("long")).as("drop_digit"),
          sum(rStop.cast("long")).as("drop_stop"),
          sum(rRep.cast("long")).as("drop_rep"))
    }),

    // PII detection/redaction accounting — the compliance scrub a
    // training corpus goes through before use. Patterns avoid
    // lookarounds/backrefs so Java (Spark) and RE2 (DuckDB) agree.
    "text_pii" -> ((s, d) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
      val phone = "\\+[0-9][0-9]+"
      val t = col("text")
      Tables.documents(s, d)
        .select(col("lang"),
          (length(t) - length(regexp_replace(t, email, ""))).as("email_chars"),
          (length(t) - length(regexp_replace(t, phone, ""))).as("phone_chars"),
          length(regexp_replace(regexp_replace(t, email, "<EMAIL>"),
            phone, "<PHONE>")).as("redacted_len"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("email_chars") > 0).cast("long")).as("docs_with_email"),
          sum((col("phone_chars") > 0).cast("long")).as("docs_with_phone"),
          sum("redacted_len").as("total_redacted_len"))
    }),

    // BPE-ish subword token accounting: a GPT-2-style pretokenizer
    // regex (letter runs / digit runs / punctuation runs, each with an
    // optional leading space) — the standard first stage of byte-pair
    // tokenization. Codegen'd regexp_extract_all; the alternatives'
    // character classes are disjoint, so Java and RE2 agree exactly.
    "text_bpe" -> ((s, d) => {
      val toks = expr(
        "regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+', 0)")
      Tables.documents(s, d)
        .select(col("lang"), size(toks).as("n_bpe"),
          size(words(col("text"))).as("n_words"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bpe").as("total_bpe"),
          round(avg("n_bpe"), 4).as("avg_bpe"),
          round(sum("n_bpe") / sum("n_words"), 4).as("bpe_per_word"))
    }),

    // BPE merge TRAINING (Sennrich et al., ACL 2016) — the tokenizer-
    // training op beside text_bpe's tokenize pass: learn the first 16
    // merge rules from corpus word frequencies. Scale shape: the
    // corpus is scanned ONCE (word-frequency hash agg, map-side
    // combined); every merge round then operates on the VOCAB table
    // (distinct words × counts — corpus-size-independent), exactly how
    // production trainers work (a word-freq dict, never the raw text).
    // Per round: one vocab-sized adjacent-pair agg, a 1-ROW driver
    // argmax (the kmeans-centroid k-row-driver-state contract), and a
    // DELTA-INDEXED rewrite (round 11): only rows whose seq CONTAINS
    // the merged pair run the regexp; untouched rows union back as-is
    // — at production merge counts most of the vocab is untouched per
    // round, so the rewrite cost tracks the pair's support, not |V|.
    // Merge semantics: every token is space-delimited and replace()
    // runs left-to-right non-overlapping IN BOTH ENGINES, so they
    // agree exactly — but note the shared-delimiter deviation from
    // canonical Sennrich BPE: the match consumes its trailing space,
    // so immediately adjacent repeats ("a b a b") merge only
    // alternately within one round (the next round catches the rest).
    // Determinism: integer pair counts, ties on the pair string asc.
    "text_bpe_train" -> ((s, d) => bpeTrain(s, d)),

    // TF-IDF with per-doc top-3 terms: corpus DF via distinct-count,
    // per-doc ranking via the bounded-heap TopKStructs aggregate.
    // Ranking on the ROUNDED score: ln() may differ in the last ulp
    // between engines, and mathematically-equal scores from different
    // (tf, df) pairs must tie identically on both sides.
    "text_tfidf" -> ((s, d) => {
      import graft.functions.TopKAggregate.topk
      // token explode + scoring run once per DISTINCT text; document
      // frequency weights each representative by its member count
      // (identical texts contain identical words, so df is exact), and
      // the per-doc result expands by text hash at the end. Scores are
      // a pure function of text content + global df, so members of a
      // rep share their top-3 verbatim.
      val hashed = graft.operators.Dedup.withTextHash(
        docs(s, d).select(col("doc_id"), col("text"), col("w")), "text").drop("text")
      // corpus size stays IN-PLAN (broadcast single-row aggregate joined
      // below, q_mixture's pattern) — no Spark action at plan-build time,
      // no extra eager corpus scan for callers composing plans
      val ntot = broadcast(hashed.agg(count(lit(1)).cast("double").as("n_corpus")))
      val members = hashed.select("doc_id", "h")
      val mcount = members.groupBy("h").agg(count(lit(1)).as("mc"))
      val wexp = hashed.dropDuplicates("h")
        .select(col("h"), explode(col("w")).as("word"))
      val tf = wexp.groupBy("h", "word").agg(count(lit(1)).as("tf"))
      // separate distinct lineage for df: measured faster than both a
      // dfreq-from-tf self-join (recomputes the tf aggregation) and a
      // window count over tf (sort-shuffles the full (doc, word) set)
      val dfreq = wexp.distinct().join(mcount, "h")
        .groupBy("word").agg(sum("mc").as("df"))
      val scored = tf.join(dfreq, "word").join(ntot)
        .select(col("h"), col("word"),
          round(col("tf") * log(col("n_corpus") / col("df")), 4).as("score"))
      scored.groupBy("h")
        .agg(topk(struct((-col("score")).as("negs"), col("word").as("wd")), 3).as("top"))
        .select(col("h"), posexplode(col("top")).as(Seq("i", "t")))
        .join(members, "h")
        .select(col("doc_id"), (col("i") + 1).cast("int").as("rk"),
          col("t.wd").as("word"), (-col("t.negs")).as("score"))
    }),

    // Quality-WEIGHTED sampling without replacement (round 8) — the
    // probabilistic mixing primitive between q_sample's uniform draw
    // and text_filter_adaptive's hard cut: each doc's selection
    // probability scales with its quality score, via the A-ES
    // weighted-reservoir key ln(u)/w (Efraimidis & Spirakis 2006)
    // with u from the shared md5 draw (32-bit here — key granularity)
    // — seedless, engine-replayable, stable under repartitioning.
    // Top 50 keys per lang through the bounded-heap TopKStructs
    // aggregate (q_topk_agg's shape): only 50 candidates per partition
    // per stratum reach the shuffle — a rank window would sort-shuffle
    // every scored doc. (-key, doc_id) ascending = key desc, id tie.
    "text_weighted_sample" -> ((s, d) => {
      import graft.functions.TopKAggregate.topk
      val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 8), 16, 10).cast("long")
      val u = (h + lit(1.0)) / lit(4294967296.0)
      val key = log(u) / (qualityScore + lit(0.01))
      docs(s, d)
        .select(col("doc_id"), col("lang"), key.as("key"))
        .groupBy("lang")
        .agg(topk(struct((-col("key")).as("negk"), col("doc_id").as("id")), 50)
          .as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("t.id").as("doc_id"), col("lang"),
          (col("i") + 1).cast("long").as("rk"))
    }),

    // PMI collocations (round 8) — corpus-level co-occurrence mining:
    // adjacent word pairs scored by pointwise mutual information
    // log(p(x,y) / (p(x)·p(y))), the collocation detector behind
    // phrase induction and tokenizer-merge candidates. Scale shape:
    // bigrams come from an in-array transform (no self-join), unigram
    // and bigram counts are hash aggs shuffling words not documents,
    // the count-vector join keys on the word, and the two corpus
    // totals ride the whitelisted 1-row broadcast. Support floor 20
    // keeps the output collocation-sized.
    "text_cooc" -> ((s, d) => {
      val base = docs(s, d).select(words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
      val big = base.select(explode(expr(
        "transform(sequence(1, size(ws)-1), " +
          "i -> struct(element_at(ws, i) AS x, element_at(ws, i+1) AS y))"))
        .as("b"))
        .select(col("b.x").as("x"), col("b.y").as("y"))
      val uni = base.select(explode(col("ws")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
      val pair = big.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 20)
      val tot = pair.agg(sum("c_xy").as("n2"))
        .crossJoin(broadcast(uni.agg(sum("c").as("n1"))))
      pair
        .join(uni.select(col("t").as("x"), col("c").as("c_x")), "x")
        .join(uni.select(col("t").as("y"), col("c").as("c_y")), "y")
        .crossJoin(broadcast(tot))
        .select(col("x"), col("y"), col("c_xy"),
          round(log((col("c_xy") / col("n2")) /
            ((col("c_x") / col("n1")) * (col("c_y") / col("n1")))), 4)
            .as("pmi"))
    }),

    // RAKE keyword extraction (Rose et al. 2010, round 11) — the
    // multi-word keyword readout beside text_cooc's PMI collocations:
    // candidate phrases are the maximal stopword-free token runs
    // (stopword set = the engine's own "en" function-word profile, so
    // phrase boundaries and lang_id share one vocabulary); each word
    // scores deg(w)/freq(w) (deg = Σ phrase length over its
    // occurrences — favors words living in long phrases), a phrase
    // scores the sum of its member-word scores. Determinism: the
    // word ratio is quantized ONCE in the vocab-sized word table as
    // ⌊2²⁰·deg/freq⌋ — computed in DECIMAL(38,0) (deg·2²⁰ overflows a
    // BIGINT once deg > 8.8e12) with the truncating integral divide
    // identical in both engines — and every reduction after that is
    // exact integer addition; identical phrase texts provably carry
    // identical scores (the score depends only on member words), so
    // the phrase-level min() is a no-op aggregator, not a choice.
    // Scale shape: one posexplode scan; phrase-run ids via a per-doc
    // cumulative-sum window (doc-partitioned, never global); word
    // stats a vocab-sized hash agg; top-20 via sort+limit then a
    // 20-row rank window.
    "text_rake" -> ((s, d) => rakeFrom(docs(s, d))),
    "text_textrank" -> ((s, d) => textrankFrom(docs(s, d))),
    "text_feature_hash" -> ((s, d) => featureHashFrom(docs(s, d))),

    "ann_hashed_recall" -> ((s, d) => hashedAnnRecallFrom(docs(s, d))),

    "text_dsir" -> ((s, d) => dsirFrom(docs(s, d))),

    // Zipf rank-frequency slope audit (Zipf 1949; the log-log OLS fit
    // is the standard corpus-health check beside text_vocab_growth's
    // Heaps law, round 11): fit ln(freq) = slope·ln(rank) + b over the
    // top-100 tokens — natural text reads slope ≈ −1; a synthetic or
    // template-heavy corpus bends away from it, and r² says how well
    // the power law holds at all. Determinism: ln terms are
    // floor-quantized to 2²⁰ integer units PER ROW (two floats total
    // per row, identical expression both engines), so the OLS moment
    // sums are exact integers in any partition order and slope/
    // intercept/r² are single float expressions over six exact sums.
    // Scale shape: corpus scan → vocab-sized freq agg → top-100 via
    // sort+limit (never a global rank window) → 100-row window + 1-row
    // agg.
    "text_zipf" -> ((s, d) =>
      zipfFrom(docs(s, d).select(explode(col("w")).as("tok"))))
  )

  /** The RAKE pipeline over any (doc_id, w[]) frame — public to the
    * test JVM for the hand-document gate. */
  /** Feature-hashing output dimensionality (2^6 buckets). */
  val FeatureHashDim = 64L

  /** Feature hashing / the hashing trick (Weinberger et al., ICML
    * 2009) — the MODEL-FREE featurizer bridging raw text into the
    * vector operators: every token hashes to one of
    * [[FeatureHashDim]] buckets with a ±1 sign from an independent
    * hash, and a document's vector is the signed occurrence count per
    * bucket. The sign is what makes collisions cancel in expectation
    * (E[x·x′] is preserved — the paper's point), so hashed vectors
    * feed cosine/ANN/semdedup machinery without any trained
    * vocabulary, at a FIXED dimensionality no matter how the corpus
    * vocabulary grows. Output: sparse (doc_id, dim, v) rows — only
    * nonzero buckets, ≤ 64/doc. Scale: one explode + one map-side-
    * combined hash agg keyed (doc_id, dim); no vocabulary table
    * exists at all, which is the trick's entire operational appeal.
    * Determinism: both hashes are the portable u32 md5 prefix; counts
    * are exact integers. */
  private[graft] def featureHashFrom(docsW: DataFrame): DataFrame = {
    val hv = conv(substring(md5(concat(lit("fh:"), col("tok"))
      .cast("binary")), 1, 8), 16, 10).cast("long")
    val sv = conv(substring(md5(concat(lit("fhs:"), col("tok"))
      .cast("binary")), 1, 8), 16, 10).cast("long")
    docsW
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .where(col("tok") =!= "")
      .select(col("doc_id"), pmod(hv, lit(FeatureHashDim)).as("dim"),
        when(pmod(sv, lit(2L)) === 0, 1L).otherwise(-1L).as("sgn"))
      .groupBy("doc_id", "dim").agg(sum("sgn").as("v"))
      .where(col("v") =!= 0)
  }

  /** Hashed-bucket vocabulary size for the DSIR importance weights. */
  private[graft] val DsirBuckets = 1024L

  /** The sources declared as the curated TARGET distribution for
    * `text_dsir` (the gate's stand-in for "looks like Wikipedia"). */
  private[graft] val DsirTargetSources =
    Seq("src0", "src1", "src2", "src3", "src4")

  /** Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023 — DSIR) — the model-free, modern data-selection operator: fit
    * hashed-unigram multinomials over the TARGET corpus (p) and the
    * RAW pool (q), score every raw document by its importance
    * log-ratio Σ_tok (ln p̂[b(tok)] − ln q̂[b(tok)]) with add-1
    * smoothing over [[DsirBuckets]] buckets, and select the top
    * quartile — per-source census of docs/selected/rate plus the mean
    * log-ratio and the selection threshold. (The paper resamples via
    * Gumbel noise; the gated variant selects greedily at the P75
    * threshold — a seeded md5 Gumbel swap is one extra column, the
    * q_dp_count replayable-noise pattern.) Determinism: the ONE float
    * ln per bucket floor-quantizes to 2²⁰ integer units IN THE
    * BUCKET TABLE (λ_b over exact integer counts, identical
    * expression both engines — text_zipf's discipline), so every
    * per-doc weight is an exact integer sum; the P75 threshold is the
    * interpolated exact percentile (q_rfm's), and each output float is
    * one division. Scale: NO vocabulary table exists (the hashing
    * trick, text_feature_hash's appeal) — one corpus scan for the
    * 1024-row bucket census, one for the weight pass (map-side
    * combined through a BROADCAST bucket join — the corpus never
    * shuffles), a 1-row threshold broadcast, a source-bounded census
    * agg. Per-bucket products are cast to double BEFORE multiplying:
    * (t_b+1)·(R+B) overflows BIGINT once both factors pass ~10⁹. */
  private[graft] def dsirFrom(docsW: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val isT = col("source").isin(DsirTargetSources: _*)
    val toks = docsW
      .select(col("doc_id"), col("source"), isT.as("is_t"),
        explode(col("w")).as("tok"))
      .where(col("tok") =!= "")
      .select(col("doc_id"), col("source"), col("is_t"),
        pmod(conv(substring(md5(concat(lit("ds:"), col("tok"))
          .cast("binary")), 1, 8), 16, 10).cast("long"),
          lit(DsirBuckets)).as("b"))
    val bc = toks.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tb0"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("rb0"))
    val tot = bc.agg(sum("tb0").as("tall"), sum("rb0").as("rall"))
    val lam = bc.where(col("rb0") > 0).crossJoin(broadcast(tot))
      .select(col("b"),
        floor(log(
          ((col("tb0") + 1).cast("double") *
            (col("rall") + DsirBuckets).cast("double")) /
          ((col("rb0") + 1).cast("double") *
            (col("tall") + DsirBuckets).cast("double"))) * 1048576.0)
          .cast("long").as("lam"))
    val w = toks.where(!col("is_t"))
      .join(broadcast(lam), "b")
      .groupBy("doc_id", "source").agg(sum("lam").as("wq"))
    val thr = w.agg(
      round(expr("percentile(cast(wq as double), 0.75)"), 4).as("thr"))
    w.crossJoin(broadcast(thr))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("wq") >= col("thr"), 1L).otherwise(0L)).as("n_sel"),
        sum(col("wq").cast(dec)).as("swq"),
        max("thr").as("thr0"))
      .select(col("source"), col("n_docs"), col("n_sel"),
        round(col("n_sel").cast("double") / col("n_docs"), 4)
          .as("sel_rate"),
        round(col("swq").cast("double") / col("n_docs") / 1048576.0, 6)
          .as("avg_logratio"),
        round(col("thr0") / 1048576.0, 6).as("thr_logratio"))
  }

  /** Query-set size, top-k, and the bit-width knobs for the hashed-ANN
    * recall audit. MaxPlaneBits sizes the shared hyperplane table (the
    * knobs filter it). */
  private val HashedAnnQueries = 50L
  private val HashedAnnK = 3
  private val HashedAnnKnobs = Seq(4, 8, 12)
  private val HashedAnnBandKnobs = Seq(2, 4)
  private val HashedAnnBandBits = 8
  private val MaxPlaneBits = 32

  /** Hashed-feature ANN recall audit (round 11, closing the round-12
    * candidate list's "recall sweep over the hashed-feature bridge"):
    * the MEASURED answer to "can the model-free [[featureHashFrom]]
    * vectors drive the ANN stack?" — sign-random-projection LSH
    * (Charikar, STOC 2002: bit_j = sign(v·r_j), r_j a ±1 hyperplane
    * from the portable md5 hash) bucketed at 4/8/12 bits, recall@3
    * against EXACT cosine over the same hashed vectors, with the
    * candidate-pair count as the unit cost — the knob/recall/cost
    * frontier in one table, `ann_recall_sweep`'s discipline on the
    * text side. Two families: `lsh_hashed` (ONE table, band width the
    * knob — the AND construction, recall falls as bits sharpen) and
    * `lsh_banded` (L OR-ed 8-bit tables, L the knob — the production
    * construction, recall climbs with tables at linear cost; Indyk &
    * Motwani 1998 / Gionis et al. VLDB 1999 banding, the same scheme
    * `dedup_minhash` runs 32×4). Determinism: everything up to the last arithmetic is
    * exact integers (signed counts, ±1 planes, integer dots and
    * norms); cosine is ONE division + sqrt over exact integers,
    * rounded to 6 for the (cos desc, did) ranking; recall is one
    * integer division rounded to 4. Scale: the truth side is the
    * audit's deliberate cost — query-set × corpus through the sparse
    * dim join (bounded by 64 dims/doc, §3 rule 3 blocking); the LSH
    * side is the production path — signatures are one broadcast-join
    * pass (nnz × bits rows, map-side combined), candidates only
    * within equal-signature buckets. */
  private[graft] def hashedAnnRecallFrom(docsW: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = docsW.sparkSession
    val fh = featureHashFrom(docsW)
      .localCheckpoint(true) // feeds norms, truth dots, and signatures
    val n2 = fh.groupBy("doc_id").agg(sum(col("v") * col("v")).as("n2"))
      .localCheckpoint(true)
    val qf = fh.where(col("doc_id") < HashedAnnQueries)
    val dots = qf.select(col("doc_id").as("qid"), col("dim"), col("v").as("va"))
      .join(fh.select(col("doc_id").as("did"), col("dim"), col("v").as("vb")),
        "dim")
      .where(col("qid") =!= col("did"))
      .groupBy("qid", "did").agg(sum(col("va") * col("vb")).as("dot"))
      .localCheckpoint(true) // feeds truth + every knob's rerank
    def cosTopK(pairs: DataFrame): DataFrame =
      pairs.join(n2.select(col("doc_id").as("qid"), col("n2").as("n2a")), "qid")
        .join(n2.select(col("doc_id").as("did"), col("n2").as("n2b")), "did")
        .withColumn("cos", round(col("dot") /
          sqrt((col("n2a") * col("n2b")).cast("double")), 6))
        .withColumn("rk", row_number().over(Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("did"))))
        .where(col("rk") <= HashedAnnK)
        .select(col("qid"), col("did"))
    val truth = cosTopK(dots).localCheckpoint(true)
    val truthN = truth.agg(count(lit(1)).as("tn"))
    val planes = s.range(MaxPlaneBits).select(col("id").as("j"))
      .crossJoin(s.range(FeatureHashDim).select(col("id").as("dim")))
      .select(col("j"), col("dim"),
        when(conv(substring(md5(concat(lit("hp:"), col("j").cast("string"),
            lit(":"), col("dim").cast("string")).cast("binary")), 1, 8),
          16, 10).cast("long") % 2 === 0, 1L).otherwise(-1L).as("r"))
    // candidate pairs from a per-(table, signature) bucket join; the
    // single-table family is tables=1 with the band width as the knob
    def bucketCands(nbits: Int, bandBits: Int): DataFrame = {
      val sigs = fh.join(broadcast(planes.where(col("j") < nbits)), "dim")
        .withColumn("t", expr(s"j div $bandBits"))
        .withColumn("pw", pow(lit(2.0),
          (col("j") % bandBits).cast("double")).cast("long"))
        .groupBy(col("doc_id"), col("t"), col("pw"))
        .agg(sum(col("v") * col("r")).as("sb"))
        .groupBy("doc_id", "t")
        .agg(sum(when(col("sb") > 0, col("pw")).otherwise(0L)).as("sig"))
      sigs.where(col("doc_id") < HashedAnnQueries)
        .select(col("doc_id").as("qid"), col("t"), col("sig"))
        .join(sigs.select(col("doc_id").as("did"), col("t"), col("sig")),
          Seq("t", "sig"))
        .where(col("qid") =!= col("did"))
        .select("qid", "did").distinct()
    }
    def recallRow(family: String, knob: Int, cands0: DataFrame): DataFrame = {
      val cands = cands0
        .localCheckpoint(true) // feeds the cost count + the rerank
      val nc = cands.agg(count(lit(1)).as("n_cand"))
      val approx = cosTopK(cands.join(dots, Seq("qid", "did")))
      val m = truth.join(approx, Seq("qid", "did"), "left_semi")
        .agg(count(lit(1)).as("m"))
      broadcast(m).crossJoin(broadcast(truthN)).crossJoin(broadcast(nc))
        .select(lit(family).as("family"),
          lit(knob).cast("int").as("knob"), col("n_cand"),
          round(col("m") / col("tn"), 4).as("recall"))
    }
    (HashedAnnKnobs.map(b =>
        recallRow("lsh_hashed", b, bucketCands(b, b))) ++
      HashedAnnBandKnobs.map(l =>
        recallRow("lsh_banded", l,
          bucketCands(l * HashedAnnBandBits, HashedAnnBandBits))))
      .reduce(_ unionByName _)
  }

  /** Fixed TextRank propagation depth — also the oracle's CTE chain
    * length. */
  val TextRankRounds = 3

  /** TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004) — the
    * GRAPH-centrality keyword extractor beside `text_rake`'s
    * degree/frequency heuristic: content words are nodes, adjacent
    * content words co-occurrence-weighted edges, and importance is
    * weighted PageRank — a word matters because it neighbors words
    * that matter, which is what lets TextRank rank a hub word above a
    * merely frequent one. Same stopword set as RAKE (the engine's
    * "en" function-word profile), adjacency AFTER stopword removal
    * (documented simplification of the paper's window-2 over raw
    * text — both engines replay it identically). Determinism: the
    * q_pagerank integer-mass discipline verbatim — 1e9 units,
    * per-edge contribution (pr·w) div s (truncating, identical both
    * engines), damping 150000000 + (85·cin) div 100, THREE fixed
    * rounds replayed as chained MATERIALIZED CTEs. Scale: the graph
    * is vocab-sized (edges = distinct adjacent content pairs); each
    * round one co-keyed join + one hash agg; pr·w nears BIGINT only
    * at ~1e9-count edges (DECIMAL swap documented, embed_dimstats'
    * trade). Output: top-20 tokens by final mass. */
  private[graft] def textrankFrom(docsW: DataFrame,
      rounds: Int = TextRankRounds,
      ckpt: graft.operators.CheckpointStrategy =
        graft.operators.CheckpointStrategy.Local): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stop = langProfiles.toMap.apply("en")
    val content = docsW
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "tok")))
      .where(!col("tok").isInCollection(stop) && col("tok") =!= "")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
    val nxt = content.select(col("doc_id"), (col("rn") - 1).as("rn"),
      col("tok").as("tok2"))
    val und = content.join(nxt, Seq("doc_id", "rn"))
      .where(col("tok") =!= col("tok2"))
      .select(least(col("tok"), col("tok2")).as("u"),
        greatest(col("tok"), col("tok2")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
    val edges = ckpt(und
      .select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionByName(und.select(col("v").as("src"), col("u").as("dst"),
        col("w")))) // reused every round
    val strength = ckpt(edges.groupBy(col("src").as("node"))
      .agg(sum("w").as("s")))
    var pr = ckpt(strength.select(col("node"), col("s"),
      lit(1000000000L).as("pr")))
    for (_ <- 1 to rounds) {
      val cin = edges
        .join(pr.select(col("node").as("src"), col("s"), col("pr")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(pr * w) div s")).as("cin"))
      pr = ckpt(strength.join(cin, "node")
        .select(col("node"), col("s"),
          (lit(150000000L) + expr("(85 * cin) div 100")).as("pr")))
    }
    pr.orderBy(col("pr").desc, col("node")).limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("pr").desc, col("node"))))
      .select(col("rk").cast("int").as("rk"), col("node").as("token"),
        col("pr").as("mass"),
        round(col("pr") / lit(1000000000.0), 6).as("score"))
  }

  private[graft] def rakeFrom(docsW: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stop = langProfiles.toMap.apply("en")
    val toks = docsW
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "tok")))
      .withColumn("stop", col("tok").isInCollection(stop))
    val grp = toks.withColumn("g",
      sum(when(col("stop"), 1L).otherwise(0L))
        .over(Window.partitionBy("doc_id").orderBy("pos")))
    val members = grp.where(!col("stop"))
      .withColumn("len",
        count(lit(1)).over(Window.partitionBy("doc_id", "g")))
      .localCheckpoint(true) // feeds word stats + phrase build + score
    val wordQ = members.groupBy("tok")
      .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
      .select(col("tok"),
        expr("(cast(deg as decimal(38,0)) * 1048576)" +
          " div cast(freq as decimal(38,0))").as("rq"))
    val phrases = members.groupBy("doc_id", "g")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos").as("p"),
          col("tok").as("t")))), x => x.getField("t")), " ").as("phrase"))
    val scoreQ = members.join(wordQ, "tok")
      .groupBy("doc_id", "g").agg(sum("rq").as("sq"))
    val perPhrase = phrases.join(scoreQ, Seq("doc_id", "g"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"), min("sq").as("sq"))
    perPhrase.orderBy(col("sq").desc, col("phrase")).limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("sq").desc, col("phrase"))))
      .select(col("rk").cast("int").as("rk"), col("phrase"),
        col("n_occ"), round(col("sq") / lit(1048576.0), 4).as("score"))
  }

  /** The quantized log-log OLS over any (tok) occurrence frame —
    * public to the test JVM for the driver-side replay gate. */
  private[graft] def zipfFrom(occurrences: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = occurrences
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(100)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("tok"))).cast("long"))
      .select(floor(log(col("rank").cast("double")) * 1048576L)
        .cast("long").as("xq"),
        floor(log(col("freq").cast("double")) * 1048576L)
          .cast("long").as("yq"))
    val sums = top.agg(count(lit(1)).as("n"), sum("xq").as("sx"),
      sum("yq").as("sy"), sum(col("xq") * col("yq")).as("sxy"),
      sum(col("xq") * col("xq")).as("sxx"),
      sum(col("yq") * col("yq")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    sums.select(col("n"),
      round(num.cast("double") / denx, 4).as("slope"),
      round((col("sy") - (num.cast("double") / denx) * col("sx"))
        / col("n") / lit(1048576.0), 4).as("intercept"),
      round(num.cast("double") * num / (denx.cast("double") * deny), 4)
        .as("r2"))
  }

  // --- DuckDB oracles ------------------------------------------------

  private val wSql = "regexp_split_to_array(text, '\\s+')"

  /** The `ann_hashed_recall` oracle: the text_feature_hash vector CTE,
    * exact-cosine truth over the sparse dim join, one shared ±1
    * hyperplane table, then per-knob signature/candidate/rerank/recall
    * CTEs generated for each [[HashedAnnKnobs]] entry. */
  private def hashedAnnRecallSql: String = {
    // (cte suffix, plane count, band width, family, knob)
    val fams =
      HashedAnnKnobs.map(b => (s"s$b", b, b, "lsh_hashed", b)) ++
        HashedAnnBandKnobs.map(l => (s"b$l", l * HashedAnnBandBits,
          HashedAnnBandBits, "lsh_banded", l))
    val knobs = fams.map { case (sfx, nbits, bw, family, knob) =>
      s"""sig$sfx AS MATERIALIZED (SELECT doc_id, t,
         |    CAST(sum(CASE WHEN sb > 0 THEN pw ELSE 0 END) AS BIGINT) AS sig
         |  FROM (SELECT v.doc_id, p.j // $bw AS t,
         |      CAST(power(2, p.j % $bw) AS BIGINT) AS pw,
         |      sum(v.v * p.r) AS sb
         |    FROM vec v JOIN planes p ON p.dim = v.dim AND p.j < $nbits
         |    GROUP BY 1, 2, 3) GROUP BY 1, 2),
         |cand$sfx AS MATERIALIZED (SELECT DISTINCT q.doc_id AS qid,
         |    c.doc_id AS did
         |  FROM sig$sfx q JOIN sig$sfx c USING (t, sig)
         |  WHERE q.doc_id < $HashedAnnQueries AND q.doc_id != c.doc_id),
         |ap$sfx AS (SELECT qid, did FROM (SELECT s.qid, s.did,
         |    row_number() OVER (PARTITION BY s.qid
         |      ORDER BY s.cos DESC, s.did) AS rk
         |  FROM scored s JOIN cand$sfx c ON c.qid = s.qid AND c.did = s.did)
         |  WHERE rk <= $HashedAnnK),
         |row$sfx AS (SELECT '$family' AS family, CAST($knob AS INT) AS knob,
         |    (SELECT count(*) FROM cand$sfx) AS n_cand,
         |    round((SELECT count(*) FROM truth t JOIN ap$sfx a
         |       ON a.qid = t.qid AND a.did = t.did) / tn.tn, 4) AS recall
         |  FROM tn)""".stripMargin
    }.mkString(",\n")
    val out = fams.map { case (sfx, _, _, _, _) => s"SELECT * FROM row$sfx" }
      .mkString("\nUNION ALL\n")
    s"""WITH toks AS (SELECT doc_id, unnest($wSql) AS tok FROM documents),
       |fh AS (SELECT doc_id,
       |    CAST(('0x'||substr(md5('fh:'||tok),1,8)) AS BIGINT)
       |      % $FeatureHashDim AS dim,
       |    CASE WHEN CAST(('0x'||substr(md5('fhs:'||tok),1,8))
       |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
       |  FROM toks WHERE tok != ''),
       |vec AS MATERIALIZED (SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS v
       |  FROM fh GROUP BY 1, 2 HAVING sum(sgn) != 0),
       |n2 AS MATERIALIZED (SELECT doc_id, sum(v * v) AS n2 FROM vec
       |  GROUP BY 1),
       |dots AS MATERIALIZED (SELECT q.doc_id AS qid, c.doc_id AS did,
       |    sum(q.v * c.v) AS dot
       |  FROM vec q JOIN vec c USING (dim)
       |  WHERE q.doc_id < $HashedAnnQueries AND q.doc_id != c.doc_id
       |  GROUP BY 1, 2),
       |scored AS MATERIALIZED (SELECT qid, did,
       |    round(dot / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)), 6) AS cos
       |  FROM dots JOIN n2 a ON a.doc_id = qid JOIN n2 b ON b.doc_id = did),
       |truth AS MATERIALIZED (SELECT qid, did FROM (SELECT qid, did,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, did) AS rk
       |  FROM scored) WHERE rk <= $HashedAnnK),
       |tn AS (SELECT count(*) AS tn FROM truth),
       |planes AS MATERIALIZED (SELECT j.j, d.dim,
       |    CASE WHEN CAST(('0x'||substr(md5('hp:'||CAST(j.j AS VARCHAR)
       |        ||':'||CAST(d.dim AS VARCHAR)),1,8)) AS BIGINT) % 2 = 0
       |      THEN 1 ELSE -1 END AS r,
       |    CAST(power(2, j.j) AS BIGINT) AS pw
       |  FROM range(0, $MaxPlaneBits) j(j)
       |  CROSS JOIN range(0, $FeatureHashDim) d(dim)),
       |$knobs
       |$out""".stripMargin
  }

  private def hitSql(listExpr: String, vocab: Seq[String]): String =
    s"len(list_filter($listExpr, x -> list_contains([${vocab.map("'" + _ + "'").mkString(",")}], x)))"

  private val predictedSql: String = {
    val scores = langProfiles.map { case (lang, prof) => lang -> s"s_$lang" }
    val cases = langProfiles.map { case (lang, _) =>
      val ge = langProfiles.filter(_._1 != lang)
        .map { case (o, _) => s"s_$lang >= s_$o" }.mkString(" AND ")
      s"WHEN $ge THEN '$lang'"
    }.mkString(" ")
    s"CASE $cases ELSE 'zh' END"
  }

  def oracles: Map[String, String] = Map(
    // replay the greedy coverage chain: same tokenizer, same marginal
    // counts via NOT EXISTS against the growing covered set, same
    // (gain desc, doc_id) tie
    "text_coverage_greedy" -> {
      val steps = (2 to CoverageK).map { t =>
        s"""g$t AS (SELECT t.doc_id, count(*) AS gain FROM toks t
           |  WHERE NOT EXISTS (SELECT 1 FROM c${t - 1} c
           |                    WHERE c.tok = t.tok)
           |  GROUP BY 1),
           |p$t AS MATERIALIZED (SELECT doc_id, gain FROM g$t
           |  ORDER BY gain DESC, doc_id LIMIT 1),
           |c$t AS MATERIALIZED (SELECT tok FROM c${t - 1}
           |  UNION SELECT tok FROM toks JOIN p$t USING (doc_id))"""
          .stripMargin
      }.mkString(",\n")
      val rows = (1 to CoverageK).map { t =>
        s"""SELECT $t AS t, p$t.doc_id, p$t.gain,
           |  (SELECT count(*) FROM c$t) AS covered FROM p$t""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH dw AS (SELECT doc_id, $wSql AS ws FROM documents),
         |toks AS MATERIALIZED (SELECT DISTINCT doc_id,
         |    z[1] || ' ' || z[2] AS tok FROM (
         |    SELECT doc_id, unnest(list_zip(ws, ws[2:])) AS z FROM dw)
         |  WHERE z[2] IS NOT NULL),
         |p1 AS MATERIALIZED (SELECT doc_id, count(*) AS gain FROM toks
         |  GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
         |c1 AS MATERIALIZED (SELECT DISTINCT tok FROM toks
         |  JOIN p1 USING (doc_id)),
         |$steps
         |SELECT CAST(t AS INT) AS t, CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(gain AS BIGINT) AS gain, CAST(covered AS BIGINT) AS covered
         |FROM ($rows)""".stripMargin
    },

    "text_filter_adaptive" ->
      s"""WITH t AS (
         |  SELECT source, text, $wSql AS w, CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len($wSql) AS BIGINT) AS n_words
         |  FROM documents),
         |m AS (
         |  SELECT source,
         |    round(0.5*least(1.0, n_words/50.0)
         |      + 0.3*round(${hitSql("w", langProfiles.toMap.apply("en"))}/n_words, 6)
         |      + 0.2*(1.0 - round((n_chars - length(regexp_replace(text,'[^a-zA-Z0-9 ]','','g')))/n_chars, 6)), 6) AS q
         |  FROM t),
         |c AS (
         |  SELECT source, q,
         |    round(quantile_cont(q, 0.1) OVER (PARTITION BY source), 6) AS cut
         |  FROM m)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN q > cut THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN q <= cut THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  min(cut) AS cut
         |FROM c GROUP BY source""".stripMargin,
    "text_mixture_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, text, $wSql AS w,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len($wSql) AS BIGINT) AS n_words
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, source, n_words AS n_tokens,
         |    round(0.5*least(1.0, n_words/50.0)
         |      + 0.3*round(${hitSql("w", langProfiles.toMap.apply("en"))}/n_words, 6)
         |      + 0.2*(1.0 - round((n_chars - length(regexp_replace(text,'[^a-zA-Z0-9 ]','','g')))/n_chars, 6)), 6) AS q
         |  FROM t),
         |c AS (
         |  SELECT doc_id, source, n_tokens, q,
         |    round(quantile_cont(q, 0.1) OVER (PARTITION BY source), 6) AS cut
         |  FROM m),
         |surv AS (SELECT doc_id, source, n_tokens FROM c WHERE q > cut),
         |capped AS (SELECT doc_id, source, n_tokens FROM (
         |  SELECT doc_id, source, n_tokens, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM surv) WHERE rk <= 15),
         |bud AS (
         |  SELECT doc_id, source, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM capped)
         |SELECT i.source, i.n_input,
         |  coalesce(s.n_quality, 0) AS n_quality,
         |  coalesce(b.n_capped, 0) AS n_capped,
         |  coalesce(b.n_final, 0) AS n_final,
         |  coalesce(b.tokens_final, 0) AS tokens_final
         |FROM (SELECT source, count(*) AS n_input FROM t GROUP BY source) i
         |LEFT JOIN (SELECT source, count(*) AS n_quality FROM surv GROUP BY source) s USING (source)
         |LEFT JOIN (SELECT source, count(*) AS n_capped,
         |    CAST(sum(CASE WHEN cum - n_tokens < 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
         |    CAST(sum(CASE WHEN cum - n_tokens < 512 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_final
         |  FROM bud GROUP BY source) b USING (source)""".stripMargin,
    "text_corpus_report" ->
      s"""SELECT count(*) AS n_docs,
         |  CAST(sum(len($wSql)) AS BIGINT) AS n_tokens,
         |  count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT source) AS n_sources,
         |  count(DISTINCT md5(text)) AS n_distinct_texts,
         |  round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 4) AS dup_frac,
         |  round(quantile_cont(len($wSql), 0.5), 2) AS p50_words,
         |  round(quantile_cont(len($wSql), 0.9), 2) AS p90_words
         |FROM documents""".stripMargin,
    "text_curate_pipeline" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang,
         |    CAST(len($wSql) AS BIGINT) AS n_words,
         |    round(length(regexp_replace(text,'[^0-9]','','g'))/length(text), 6) AS digit_ratio,
         |    md5(trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))) AS nh
         |  FROM documents),
         |ruled AS (SELECT * FROM b WHERE n_words >= 15 AND digit_ratio <= 0.2),
         |deduped AS (
         |  SELECT doc_id, lang FROM (
         |    SELECT doc_id, lang, min(doc_id) OVER (PARTITION BY nh) AS keep_id
         |    FROM ruled) WHERE doc_id = keep_id),
         |cnt AS (SELECT lang, count(*) AS cnt FROM deduped GROUP BY lang),
         |tgt AS (SELECT min(cnt) AS target FROM cnt),
         |r AS (
         |  SELECT doc_id, lang, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM deduped),
         |drawn AS (SELECT doc_id, lang FROM r, tgt WHERE rk <= tgt.target)
         |SELECT bi.lang, bi.n_input,
         |  coalesce(ru.n_ruled, 0) AS n_ruled,
         |  coalesce(de.n_deduped, 0) AS n_deduped,
         |  coalesce(dr.n_final, 0) AS n_final
         |FROM (SELECT lang, count(*) AS n_input FROM b GROUP BY lang) bi
         |LEFT JOIN (SELECT lang, count(*) AS n_ruled FROM ruled GROUP BY lang) ru USING (lang)
         |LEFT JOIN (SELECT lang, count(*) AS n_deduped FROM deduped GROUP BY lang) de USING (lang)
         |LEFT JOIN (SELECT lang, count(*) AS n_final FROM drawn GROUP BY lang) dr USING (lang)""".stripMargin,
    "text_ppl_proxy" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h, text FROM documents),
        |mc AS (SELECT h, count(*) AS mc FROM d GROUP BY h),
        |rep AS (SELECT h, arg_min(text, doc_id) AS text FROM d GROUP BY h),
        |rt AS (SELECT h, unnest(regexp_split_to_array(text, '\s+')) AS t FROM rep),
        |tc AS (SELECT h, t, count(*) AS n FROM rt GROUP BY h, t),
        |freq AS (SELECT t, sum(tc.n * mc.mc) AS cnt FROM tc JOIN mc USING (h) GROUP BY t),
        |tot AS (SELECT sum(cnt) AS total FROM freq),
        |sc AS (SELECT tc.h,
        |  round(sum(tc.n * -ln(freq.cnt / tot.total)) / sum(tc.n), 4) AS nll
        |  FROM tc JOIN freq USING (t) CROSS JOIN tot GROUP BY tc.h)
        |SELECT d.doc_id, sc.nll FROM d JOIN sc USING (h)""".stripMargin,

    // bigrams via list_zip on the rep's word array (second operand
    // sliced from position 2; the padded-NULL tail row is filtered),
    // then the same weighted count + quantized-log2 replay as Spark
    "text_ppl_bigram" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h, text FROM documents),
        |mc AS (SELECT h, count(*) AS mc FROM d GROUP BY h),
        |rep AS (SELECT h, arg_min(text, doc_id) AS text FROM d GROUP BY h),
        |rw AS (SELECT h, regexp_split_to_array(text, '\s+') AS ws FROM rep),
        |bgr AS (SELECT h, z[1] AS w1, z[2] AS w2 FROM (
        |    SELECT h, unnest(list_zip(ws, ws[2:])) AS z FROM rw)
        |  WHERE z[2] IS NOT NULL),
        |bgc AS (SELECT h, w1, w2, count(*) AS n FROM bgr GROUP BY 1, 2, 3),
        |c2 AS (SELECT w1, w2, sum(bgc.n * mc.mc) AS c2
        |  FROM bgc JOIN mc USING (h) GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
        |vcb AS (SELECT count(DISTINCT w) AS v FROM (
        |    SELECT unnest(ws) AS w FROM rw)),
        |sc AS (SELECT bgc.h,
        |    sum(CAST(floor(log2(CAST(c1.c1 + vcb.v AS DOUBLE)
        |        / CAST(c2.c2 + 1 AS DOUBLE)) * 1000000000000) AS BIGINT)
        |      * bgc.n) AS nllq,
        |    sum(bgc.n) AS nb
        |  FROM bgc JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |  CROSS JOIN vcb GROUP BY bgc.h)
        |SELECT d.doc_id, CAST(sc.nb AS BIGINT) AS n_bigrams,
        |  round((CAST(sc.nllq AS DOUBLE) / 1000000000000) / sc.nb, 4)
        |    AS nll_bits
        |FROM d JOIN sc USING (h)""".stripMargin,
    "text_langmix" -> {
      val hitCols = langProfiles.map { case (l, prof) =>
        s"${hitSql("w", prof)} AS s_$l"
      }.mkString(",\n    ")
      val unpiv = langProfiles.map { case (l, _) =>
        s"SELECT doc_id, lang, '$l' AS pl, s_$l AS hits FROM h"
      }.mkString("\n  UNION ALL ")
      s"""WITH t AS (SELECT doc_id, lang, $wSql AS w FROM documents),
         |h AS (
         |  SELECT doc_id, lang,
         |    $hitCols
         |  FROM t),
         |u AS (
         |  $unpiv),
         |r AS (
         |  SELECT doc_id, lang, pl, hits,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, pl) AS rk,
         |    sum(hits) OVER (PARTITION BY doc_id) AS total
         |  FROM u)
         |SELECT doc_id, lang,
         |  max(CASE WHEN rk = 1 THEN pl END) AS top_lang,
         |  CAST(max(CASE WHEN rk = 1 THEN hits END) AS BIGINT) AS top_hits,
         |  CAST(max(CASE WHEN rk = 2 THEN hits END) AS BIGINT) AS second_hits,
         |  CAST(max(total) AS BIGINT) AS total_hits,
         |  (max(CASE WHEN rk = 2 THEN hits END) * 4 >= max(total)
         |    AND max(total) > 0) AS is_mixed
         |FROM r GROUP BY doc_id, lang""".stripMargin
    },
    "text_quality_bins" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, $wSql AS w, CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len($wSql) AS BIGINT) AS n_words
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    round(0.5*least(1.0, n_words/50.0)
         |      + 0.3*round(${hitSql("w", langProfiles.toMap.apply("en"))}/n_words, 6)
         |      + 0.2*(1.0 - round((n_chars - length(regexp_replace(text,'[^a-zA-Z0-9 ]','','g')))/n_chars, 6)), 6) AS q
         |  FROM t),
         |c AS (SELECT round(quantile_cont(q, 0.25), 6) AS c1,
         |  round(quantile_cont(q, 0.5), 6) AS c2,
         |  round(quantile_cont(q, 0.75), 6) AS c3 FROM m)
         |SELECT CAST(CASE WHEN q <= c1 THEN 0 WHEN q <= c2 THEN 1
         |    WHEN q <= c3 THEN 2 ELSE 3 END AS BIGINT) AS bin,
         |  count(*) AS n_docs, round(avg(q), 6) AS avg_q,
         |  min(q) AS min_q, max(q) AS max_q
         |FROM m CROSS JOIN c GROUP BY 1""".stripMargin,
    "q_mixture_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, source, text, $wSql AS w,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len($wSql) AS BIGINT) AS n_words
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang, source,
         |    round(0.5*least(1.0, n_words/50.0)
         |      + 0.3*round(${hitSql("w", langProfiles.toMap.apply("en"))}/n_words, 6)
         |      + 0.2*(1.0 - round((n_chars - length(regexp_replace(text,'[^a-zA-Z0-9 ]','','g')))/n_chars, 6)), 6) AS q
         |  FROM t),
         |c AS (
         |  SELECT doc_id, lang, source, q,
         |    round(quantile_cont(q, 0.1) OVER (PARTITION BY source), 6) AS qcut
         |  FROM m),
         |s AS (SELECT doc_id, lang, source FROM c WHERE q > qcut),
         |cnt AS (SELECT lang, count(*) AS n FROM s GROUP BY lang),
         |tgt AS (SELECT min(n) AS target FROM cnt),
         |r AS (
         |  SELECT doc_id, lang, source, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM s)
         |SELECT doc_id, lang, source FROM r, tgt WHERE rk <= tgt.target""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_raw,
        |  CAST(length(n) AS BIGINT) AS n_chars_norm,
        |  n <> text AS changed, md5(n) AS h_norm
        |FROM (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS n
        |  FROM documents)""".stripMargin,
    "text_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, doc_id % 8 AS shard,
         |    CAST(len($wSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT lang, shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang, shard
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT lang, shard, count(*) AS n_seen,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_seen,
         |  CAST(sum(CASE WHEN cum - n_tokens < 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN cum - n_tokens < 512 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
         |FROM c GROUP BY lang, shard""".stripMargin,
    "text_heavy_hitters" ->
      s"""WITH w AS (SELECT unnest($wSql) AS word FROM documents),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_tokens FROM w),
         |c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word)
         |SELECT word, cnt, round(cnt / n_tokens, 6) AS share
         |FROM c CROSS JOIN n WHERE cnt > n_tokens * 0.005""".stripMargin,
    "text_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, doc_id % 8 AS shard,
         |    CAST(len($wSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT lang, shard, CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS seq_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc,
         |  round(sum(n_tokens) / 2048.0, 4) AS fill
         |FROM c GROUP BY 1, 2, 3""".stripMargin,
    "text_filter_pipeline" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, source, n_chars, text, $wSql AS w,
         |    CAST(len($wSql) AS BIGINT) AS n_words
         |  FROM documents),
         |wt AS (
         |  SELECT doc_id, round(max(n) / sum(n), 4) AS top_word_frac FROM (
         |    SELECT doc_id, tok, count(*) AS n
         |    FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok)
         |  GROUP BY doc_id),
         |m AS (
         |  SELECT t.source, t.lang, t.n_chars,
         |    (t.n_words < 15) AS r_short,
         |    (round(length(regexp_replace(t.text,'[^0-9]','','g'))/length(t.text), 6)
         |      > 0.2) AS r_digit,
         |    (t.lang = 'en' AND
         |      round(${hitSql("t.w", langProfiles.toMap.apply("en"))}/t.n_words, 6)
         |      < 0.05) AS r_stop,
         |    (wt.top_word_frac > 0.2) AS r_rep
         |  FROM t JOIN wt USING (doc_id))
         |SELECT source, lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN NOT (r_short OR r_digit OR r_stop OR r_rep)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN NOT (r_short OR r_digit OR r_stop OR r_rep)
         |    THEN n_chars END) AS BIGINT) AS chars_kept,
         |  CAST(sum(CASE WHEN r_short THEN 1 ELSE 0 END) AS BIGINT) AS drop_short,
         |  CAST(sum(CASE WHEN r_digit THEN 1 ELSE 0 END) AS BIGINT) AS drop_digit,
         |  CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS drop_stop,
         |  CAST(sum(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT) AS drop_rep
         |FROM m GROUP BY source, lang""".stripMargin,
    "text_repetition" ->
      s"""WITH base AS (
         |  SELECT doc_id, $wSql AS ws FROM documents WHERE len($wSql) >= 2),
         |wt AS (
         |  SELECT doc_id, round(max(n) / sum(n), 4) AS top_word_frac FROM (
         |    SELECT doc_id, t, count(*) AS n
         |    FROM (SELECT doc_id, unnest(ws) AS t FROM base) GROUP BY doc_id, t)
         |  GROUP BY doc_id),
         |bt AS (
         |  SELECT doc_id, round(max(n) / sum(n), 4) AS top_bigram_frac FROM (
         |    SELECT doc_id, bg, count(*) AS n
         |    FROM (SELECT doc_id,
         |        unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
         |      FROM base) GROUP BY doc_id, bg)
         |  GROUP BY doc_id)
         |SELECT doc_id, top_word_frac, top_bigram_frac
         |FROM wt JOIN bt USING (doc_id)""".stripMargin,
    "token_count" ->
      s"""WITH t AS (SELECT lang, len($wSql) AS n_tokens FROM documents)
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  round(avg(n_tokens),4) AS avg_tokens, max(n_tokens) AS max_tokens
         |FROM t GROUP BY lang""".stripMargin,
    "text_vocab_growth" ->
      s"""WITH dw AS (
         |  SELECT doc_id // 100 AS b, unnest($wSql) AS word FROM documents),
         |dwf AS (SELECT b, word FROM dw WHERE word <> ''),
         |wf AS (SELECT word, min(b) AS fb FROM dwf GROUP BY 1),
         |vh AS (SELECT fb AS b, count(*) AS nv FROM wf GROUP BY 1),
         |tb AS (SELECT b, count(*) AS toks FROM dwf GROUP BY 1),
         |db AS (SELECT doc_id // 100 AS b, count(*) AS nd
         |  FROM documents GROUP BY 1)
         |SELECT CAST(db.b AS BIGINT) AS bucket,
         |  CAST(sum(db.nd) OVER w AS BIGINT) AS n_docs,
         |  CAST(sum(coalesce(tb.toks, 0)) OVER w AS BIGINT) AS cum_tokens,
         |  CAST(sum(coalesce(vh.nv, 0)) OVER w AS BIGINT) AS vocab
         |FROM db LEFT JOIN tb ON db.b = tb.b LEFT JOIN vh ON db.b = vh.b
         |WINDOW w AS (ORDER BY db.b
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "text_weighted_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text, $wSql AS w,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len($wSql) AS BIGINT) AS n_words
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang,
         |    round((n_chars - length(regexp_replace(text,'[^a-zA-Z0-9 ]','','g')))/n_chars, 6) AS punct_ratio,
         |    round(${hitSql("w", langProfiles.toMap.apply("en"))}/n_words, 6) AS stop_ratio,
         |    n_words
         |  FROM t),
         |q AS (
         |  SELECT doc_id, lang,
         |    round(0.5*least(1.0, n_words/50.0) + 0.3*stop_ratio
         |      + 0.2*(1.0-punct_ratio), 6) AS qs
         |  FROM m),
         |k AS (
         |  SELECT doc_id, lang,
         |    ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) + 1.0) / 4294967296.0) / (qs + 0.01) AS key
         |  FROM q)
         |SELECT doc_id, lang, CAST(row_number() OVER (
         |    PARTITION BY lang ORDER BY key DESC, doc_id) AS BIGINT) AS rk
         |FROM k QUALIFY rk <= 50""".stripMargin,
    "text_cooc" ->
      s"""WITH base AS (
         |  SELECT $wSql AS ws FROM documents WHERE len($wSql) >= 2),
         |big AS (
         |  SELECT unnest(list_transform(range(1, len(ws)),
         |    i -> struct_pack(x := ws[i], y := ws[i+1]))) AS b
         |  FROM base),
         |pair AS (
         |  SELECT b.x AS x, b.y AS y, count(*) AS c_xy
         |  FROM big GROUP BY 1, 2 HAVING count(*) >= 20),
         |uni AS (
         |  SELECT t, count(*) AS c
         |  FROM (SELECT unnest(ws) AS t FROM base) GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT CAST(sum(c_xy) AS DOUBLE) FROM pair) AS n2,
         |    (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS n1)
         |SELECT p.x, p.y, p.c_xy,
         |  round(ln((p.c_xy / n2) / ((ux.c / n1) * (uy.c / n1))), 4) AS pmi
         |FROM pair p
         |JOIN uni ux ON ux.t = p.x
         |JOIN uni uy ON uy.t = p.y
         |CROSS JOIN tot""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, $wSql AS w, CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len($wSql) AS BIGINT) AS n_words
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, n_chars, n_words,
         |    round(length(replace(text,' ',''))/n_words, 4) AS avg_word_len,
         |    round(length(regexp_replace(text,'[^0-9]','','g'))/n_chars, 6) AS digit_ratio,
         |    round((n_chars - length(regexp_replace(text,'[^a-zA-Z0-9 ]','','g')))/n_chars, 6) AS punct_ratio,
         |    round(${hitSql("w", langProfiles.toMap.apply("en"))}/n_words, 6) AS stop_ratio
         |  FROM t)
         |SELECT doc_id, n_chars, n_words, avg_word_len, digit_ratio, punct_ratio,
         |  stop_ratio,
         |  round(0.5*least(1.0, n_words/50.0) + 0.3*stop_ratio + 0.2*(1.0-punct_ratio), 6)
         |    AS quality_score
         |FROM m""".stripMargin,
    "lang_id" -> {
      val scoreCols = langProfiles.map { case (lang, prof) =>
        s"${hitSql(wSql, prof)} AS s_$lang"
      }.mkString(",\n  ")
      s"""WITH t AS (SELECT lang, $scoreCols FROM documents)
         |SELECT lang, $predictedSql AS predicted, count(*) AS n
         |FROM t GROUP BY 1, 2""".stripMargin
    },
    "text_bpe_train" -> {
      // one merge round: pair counts over the current vocab seqs, the
      // (count desc, pair asc) argmax, then the boundary-safe rewrite.
      // Every CTE is MATERIALIZED: s$n references $prev twice (pair agg
      // + rewrite), so inlining would expand the 16-round chain to
      // ~2^16 scans of the base corpus (the km_lloyd lesson).
      def bpeRound(prev: String, n: Int): String =
        s"""p$n AS MATERIALIZED (SELECT pair, CAST(sum(cnt) AS BIGINT) AS pc FROM (
           |    SELECT unnest(list_transform(
           |      range(1, len(string_split(trim(seq), ' '))),
           |      i -> string_split(trim(seq), ' ')[i] || ' ' ||
           |           string_split(trim(seq), ' ')[i+1])) AS pair, cnt
           |    FROM $prev) GROUP BY 1),
           |b$n AS MATERIALIZED (SELECT pair, pc FROM p$n ORDER BY pc DESC, pair LIMIT 1),
           |s$n AS MATERIALIZED (SELECT replace(seq, ' ' || b$n.pair || ' ',
           |    ' ' || replace(b$n.pair, ' ', '') || ' ') AS seq, cnt
           |  FROM $prev, b$n)""".stripMargin
      val rounds = (1 to TextPack.BpeTrainRounds)
        .map(n => bpeRound(s"s${n - 1}", n)).mkString(",\n")
      val selects = (1 to TextPack.BpeTrainRounds).map(n =>
        s"SELECT CAST($n AS INT) AS round, pair, " +
          s"replace(pair, ' ', '') AS merged, pc AS cnt FROM b$n")
        .mkString("\nUNION ALL ")
      s"""WITH s0 AS MATERIALIZED (
         |  SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seq,
         |    count(*) AS cnt
         |  FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
         |        FROM documents)
         |  GROUP BY 1),
         |$rounds
         |$selects""".stripMargin
    },
    "text_tfidf" ->
      s"""WITH w AS (SELECT doc_id, unnest($wSql) AS word FROM documents),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
         |dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         |s AS (SELECT doc_id, tf.word, round(tf * ln(n / df), 4) AS score
         |      FROM tf JOIN dfreq ON tf.word = dfreq.word CROSS JOIN n)
         |SELECT doc_id, rk, word, score FROM (
         |  SELECT doc_id, word, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rk
         |  FROM s) WHERE rk <= 3""".stripMargin,
    "text_pii" ->
      """WITH t AS (
        |  SELECT lang,
        |    length(text) - length(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '', 'g')) AS email_chars,
        |    length(text) - length(regexp_replace(text, '\+[0-9][0-9]+', '', 'g')) AS phone_chars,
        |    length(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
        |      '\+[0-9][0-9]+', '<PHONE>', 'g')) AS redacted_len
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN email_chars > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
        |  CAST(sum(CASE WHEN phone_chars > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
        |  CAST(sum(redacted_len) AS BIGINT) AS total_redacted_len
        |FROM t GROUP BY lang""".stripMargin,
    "text_bpe" ->
      """WITH t AS (
        |  SELECT lang,
        |    len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS n_bpe,
        |    len(regexp_split_to_array(text, '\s+')) AS n_words
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_bpe) AS BIGINT) AS total_bpe,
        |  round(avg(n_bpe), 4) AS avg_bpe,
        |  round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_words), 4) AS bpe_per_word
        |FROM t GROUP BY lang""".stripMargin,
    "text_contamination" ->
      s"""WITH d AS (SELECT doc_id, $wSql AS w FROM documents),
         |g AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
         |    i -> md5_number_lower(w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS gs
         |  FROM d WHERE len(w) >= 3),
         |bench AS (
         |  SELECT DISTINCT unnest(gs) AS gh FROM g WHERE doc_id % 20 = 0),
         |tr AS (
         |  SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS gh
         |  FROM g WHERE doc_id % 20 <> 0)
         |SELECT tr.doc_id, CAST(tr.n_grams AS BIGINT) AS n_grams,
         |  CAST(count(bench.gh) AS BIGINT) AS n_contam,
         |  round(count(bench.gh) / tr.n_grams, 4) AS contam_frac
         |FROM tr LEFT JOIN bench ON tr.gh = bench.gh
         |GROUP BY tr.doc_id, tr.n_grams""".stripMargin,
    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $wSql AS w FROM documents),
         |g AS (SELECT doc_id, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
         |      FROM t, UNNEST(range(1, len(w)-1)) AS u(i)
         |      WHERE len(w) >= 3)
         |SELECT doc_id, min(h) AS fp FROM g GROUP BY doc_id""".stripMargin,

    "ann_hashed_recall" -> hashedAnnRecallSql,

    "text_feature_hash" ->
      s"""WITH toks AS (SELECT doc_id, unnest($wSql) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id,
         |    CAST(('0x'||substr(md5('fh:'||tok),1,8)) AS BIGINT)
         |      % $FeatureHashDim AS dim,
         |    CASE WHEN CAST(('0x'||substr(md5('fhs:'||tok),1,8))
         |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM toks WHERE tok != '')
         |SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS v
         |FROM h GROUP BY 1, 2 HAVING sum(sgn) != 0""".stripMargin,

    "text_dsir" -> {
      val targets = DsirTargetSources.map("'" + _ + "'").mkString(", ")
      s"""WITH toks AS (SELECT doc_id, source,
         |    source IN ($targets) AS is_t,
         |    CAST(('0x'||substr(md5('ds:'||tok),1,8)) AS BIGINT)
         |      % $DsirBuckets AS b
         |  FROM (SELECT doc_id, source, unnest($wSql) AS tok
         |    FROM documents) WHERE tok != ''),
         |bc AS (SELECT b,
         |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tb0,
         |    CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS rb0
         |  FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(sum(tb0) AS BIGINT) AS tall,
         |    CAST(sum(rb0) AS BIGINT) AS rall FROM bc),
         |lam AS (SELECT b, CAST(floor(ln(
         |      (CAST(tb0 + 1 AS DOUBLE) * CAST(rall + $DsirBuckets AS DOUBLE))
         |      / (CAST(rb0 + 1 AS DOUBLE) * CAST(tall + $DsirBuckets AS DOUBLE)))
         |      * 1048576.0) AS BIGINT) AS lam
         |  FROM bc CROSS JOIN tot WHERE rb0 > 0),
         |w AS (SELECT t.doc_id, t.source, CAST(sum(l.lam) AS BIGINT) AS wq
         |  FROM toks t JOIN lam l ON t.b = l.b
         |  WHERE NOT t.is_t GROUP BY 1, 2),
         |thr AS (SELECT round(quantile_cont(CAST(wq AS DOUBLE), 0.75), 4)
         |    AS thr FROM w)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN wq >= thr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sel,
         |  round(CAST(sum(CASE WHEN wq >= thr THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 4) AS sel_rate,
         |  round(CAST(sum(CAST(wq AS DECIMAL(38,0))) AS DOUBLE)
         |    / count(*) / 1048576.0, 6) AS avg_logratio,
         |  round(max(thr) / 1048576.0, 6) AS thr_logratio
         |FROM w CROSS JOIN thr GROUP BY 1""".stripMargin
    },

    // the weighted-pagerank replay over the adjacency graph —
    // q_pagerank's prRound discipline (HUGEINT sums pinned back to
    // BIGINT each round) on a word graph
    "text_textrank" -> {
      val stopList = langProfiles.toMap.apply("en")
        .map("'" + _ + "'").mkString(", ")
      val roundsSql = (1 to TextRankRounds).map { r =>
        s"""p$r AS MATERIALIZED (SELECT st.node, st.s,
           |    CAST(150000000 + (85 * c.cin) // 100 AS BIGINT) AS pr
           |  FROM st JOIN (SELECT e.dst AS node,
           |      CAST(sum((p.pr * e.w) // p.s) AS BIGINT) AS cin
           |    FROM p${r - 1} p JOIN edges e ON e.src = p.node
           |    GROUP BY 1) c USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT doc_id, $wSql AS ws FROM documents),
         |toks AS (SELECT doc_id, unnest(ws) AS tok,
         |    unnest(range(0, len(ws))) AS pos FROM d),
         |content AS MATERIALIZED (SELECT doc_id, pos, tok,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
         |  FROM toks WHERE tok NOT IN ($stopList) AND tok != ''),
         |und AS MATERIALIZED (SELECT least(a.tok, b.tok) AS u,
         |    greatest(a.tok, b.tok) AS v, count(*) AS w
         |  FROM content a JOIN content b
         |    ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
         |  WHERE a.tok != b.tok GROUP BY 1, 2),
         |edges AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM und
         |  UNION ALL SELECT v, u, w FROM und),
         |st AS MATERIALIZED (SELECT src AS node, sum(w) AS s
         |  FROM edges GROUP BY 1),
         |p0 AS (SELECT node, s, CAST(1000000000 AS BIGINT) AS pr FROM st),
         |$roundsSql,
         |top AS (SELECT node, pr FROM p$TextRankRounds
         |  ORDER BY pr DESC, node LIMIT 20)
         |SELECT CAST(row_number() OVER (ORDER BY pr DESC, node) AS INT)
         |    AS rk, node AS token, CAST(pr AS BIGINT) AS mass,
         |  round(pr / 1000000000.0, 6) AS score
         |FROM top""".stripMargin
    },

    "text_rake" -> {
      val stopList = langProfiles.toMap.apply("en")
        .map("'" + _ + "'").mkString(", ")
      s"""WITH d AS (SELECT doc_id, $wSql AS ws FROM documents),
         |toks AS (SELECT doc_id, unnest(ws) AS tok,
         |    unnest(range(0, len(ws))) AS pos FROM d),
         |flagged AS (SELECT doc_id, pos, tok,
         |    tok IN ($stopList) AS stop FROM toks),
         |grp AS (SELECT doc_id, pos, tok, stop,
         |    sum(CASE WHEN stop THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS g
         |  FROM flagged),
         |members AS MATERIALIZED (SELECT doc_id, g, pos, tok,
         |    count(*) OVER (PARTITION BY doc_id, g) AS len
         |  FROM grp WHERE NOT stop),
         |wordq AS (SELECT tok, CAST(CAST(sum(len) AS HUGEINT) * 1048576
         |    // count(*) AS BIGINT) AS rq
         |  FROM members GROUP BY 1),
         |phrases AS (SELECT doc_id, g,
         |    string_agg(tok, ' ' ORDER BY pos) AS phrase
         |  FROM members GROUP BY 1, 2),
         |scoreq AS (SELECT m.doc_id, m.g, sum(w.rq) AS sq
         |  FROM members m JOIN wordq w USING (tok) GROUP BY 1, 2),
         |per AS (SELECT phrase, count(*) AS n_occ, min(sq) AS sq
         |  FROM phrases JOIN scoreq USING (doc_id, g) GROUP BY 1),
         |top AS (SELECT phrase, n_occ, sq FROM per
         |  ORDER BY sq DESC, phrase LIMIT 20)
         |SELECT CAST(row_number() OVER (ORDER BY sq DESC, phrase) AS INT)
         |    AS rk, phrase, n_occ,
         |  round(CAST(sq AS BIGINT) / 1048576.0, 4) AS score
         |FROM top""".stripMargin
    },

    "text_zipf" ->
      s"""WITH tf AS (SELECT tok, count(*) AS freq FROM (
         |    SELECT unnest($wSql) AS tok FROM documents) GROUP BY 1),
         |top AS (SELECT freq, CAST(row_number()
         |      OVER (ORDER BY freq DESC, tok) AS BIGINT) AS rank
         |  FROM (SELECT * FROM tf ORDER BY freq DESC, tok LIMIT 100)),
         |q AS (SELECT
         |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1048576) AS BIGINT) AS xq,
         |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1048576) AS BIGINT) AS yq
         |  FROM top),
         |s AS (SELECT count(*) AS n, sum(xq) AS sx, sum(yq) AS sy,
         |    sum(xq * yq) AS sxy, sum(xq * xq) AS sxx, sum(yq * yq) AS syy
         |  FROM q)
         |SELECT CAST(n AS BIGINT) AS n,
         |  round(CAST(n * sxy - sx * sy AS DOUBLE)
         |    / (n * sxx - sx * sx), 4) AS slope,
         |  round((sy - (CAST(n * sxy - sx * sy AS DOUBLE)
         |      / (n * sxx - sx * sx)) * sx) / n / 1048576.0, 4)
         |    AS intercept,
         |  round(CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)
         |    / (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 4)
         |    AS r2
         |FROM s""".stripMargin
  )
}
