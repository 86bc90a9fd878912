package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Embedding similarity query pack over `embeddings` (SURVEY.md §2).
  * The DuckDB oracles compute cosine as dot/(|a||b|) over DOUBLE[]
  * lists — the same sequential double accumulation as the native
  * CosineSimilarity expression. */
object SimilarityPack extends QueryPack {

  private val NumQueries = 10

  /** Johnson–Lindenstrauss target dimensionality: 64 → 16. √16 = 4 is
    * exactly representable, so the 1/√t projection scale never
    * introduces a cross-engine rounding seam. */
  private val JlDim = 16

  /** ±1 sign for projection cell (i, j): parity of the pack's portable
    * u32 md5 hash, computed in the JVM — bit-identical to the Spark
    * `conv(substring(md5(…),1,8),16,10)` and DuckDB
    * `CAST('0x'||substr(md5(…),1,8) AS BIGINT)` forms of the same
    * hash, which the oracle recomputes as the cross-check. */
  private def jlSign(i: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"jl:$i:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0) 1L else -1L
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.topK(emb, emb.filter(col("vec_id") < NumQueries), k = 5)
    }),

    // Johnson–Lindenstrauss random-projection distortion audit
    // (round 11) — measure what a 64→16 sign projection (Achlioptas
    // 2003: ±1 entries are as good as Gaussians and stay integer)
    // does to pairwise L2 distances BEFORE committing the cheap index
    // to it: per consecutive-id pair, ratio = ‖y_a−y_b‖²/‖x_a−x_b‖²
    // (expectation 1 by the JL lemma), reported as a ratio histogram
    // + the mean. The sign matrix s_ij = parity of the portable u32
    // md5 hash of (i, j) — seedless, reproducible anywhere — is only
    // 64×16, so it's inlined as a LITERAL array and the projection is
    // pure per-row column math (km_assign's broadcast-literal fold
    // discipline): vectors never explode and never shuffle; the only
    // exchange is the consecutive-id pair join. The ORACLE recomputes
    // every sign from the md5 hash itself, so the gate also proves the
    // inlined literals match the portable hash. Exactness: x quantized
    // to integer 1e-6 units; projected coords y = Σ ±q and both
    // squared distances are exact BIGINT sums (order-free) whose
    // quantization scales CANCEL in the ratio — one float division
    // per pair (+ the 1e-6-quantized mean, q_entropy's idiom). First
    // measured as a posexplode × t-explode plan: 9.4 s at the 10×
    // probe; this per-row shape cut the 51M-row expansion entirely.
    // At 100 TB the mean sum moves to DECIMAL(38) (embed_dimstats'
    // rule) — noted, not needed at 2^53/1e6 pairs.
    "embed_jl" -> ((s, d) => {
      val t = JlDim
      val signLit = array((0 until 64).map(i =>
        array((0 until t).map(j => lit(jlSign(i, j))): _*)): _*)
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x =>
            floor(x.cast("double") * lit(1e6)).cast("long")).as("qa"))
        .withColumn("ya", transform(sequence(lit(0), lit(t - 1)), j =>
          aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, i) =>
            acc + element_at(element_at(signLit, i + 1), j + 1)
              * element_at(col("qa"), i + 1))))
      val a = base.filter(pmod(col("vec_id"), lit(2L)) === 0)
        .select(col("vec_id").as("pid"), col("qa"), col("ya"))
      val b = base.filter(pmod(col("vec_id"), lit(2L)) === 1)
        .select((col("vec_id") - 1).as("pid"), col("qa").as("qb"),
          col("ya").as("yb"))
      def sq2(u: Column, v: Column): Column =
        aggregate(zip_with(u, v, (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, e) => acc + e)
      val ratio = a.join(b, Seq("pid"))
        .select(col("pid"), sq2(col("qa"), col("qb")).as("do2"),
          sq2(col("ya"), col("yb")).as("dp2"))
        .filter(col("do2") > 0)
        .select(col("pid"),
          (col("dp2").cast("double") / (lit(t.toDouble) * col("do2")))
            .as("r"))
      val summary = ratio.agg(
        count(lit(1)).as("n_pairs_total"),
        round(sum(floor(col("r") * lit(1e6)).cast("long")).cast("double")
          / count(lit(1)) / lit(1e6), 4).as("mean_ratio"))
      ratio.groupBy(floor(col("r") * 10).cast("int").as("ratio_bin"))
        .agg(count(lit(1)).as("n_pairs"))
        .crossJoin(broadcast(summary))
    }),

    "embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), "label", 0.35)),

    // Per-dimension embedding health profile (round 10) — the dead/
    // collapsed/saturated-dimension detector a vector pipeline runs
    // before trusting its index: mean, spread, range, and near-zero
    // share per dimension (a dimension whose std→0 or dead_frac→1 is
    // the embedding-space twin of q_entropy's collapsed column).
    // Values quantized to integer 1e-6 units so every cross-row sum
    // is exact and partition-order-independent; the squared sums
    // accumulate in DECIMAL(38) (a BIGINT sum of q² overflows around
    // 1e6 quantized units × ~1e6 rows/dim × 100-TB row counts —
    // DuckDB's HUGEINT sum never overflows, so the decimal keeps the
    // engines aligned instead of ANSI-failing at scale). Float math
    // happens once per DIM row from identical integers. One
    // posexplode + one 64-group hash agg (map-side combined) —
    // vectors never shuffle.
    // Dominant-direction audit via power iteration (round 11) — the
    // embedding-anisotropy readout: the top principal direction of the
    // uncentered second-moment matrix and its explained-energy share.
    // A healthy embedding space spreads energy across dimensions; a
    // dominant common direction (share ≫ 1/64) is the anisotropy
    // pathology all-but-the-top post-processing removes (Mu &
    // Viswanath 2018) and a cheap upstream red flag for collapsed
    // encoders. THREE von-Mises power iterations, fully DECLARATIVE —
    // no collect anywhere: each iteration is one corpus scan (per-row
    // dot s = x·v via zip_with against the 1-row broadcast direction,
    // then a posexplode to a 64-group map-side-combined agg for
    // u = Σ s·x), and the normalize step is 64-row column math. The
    // Gram matrix is never materialized (G·v = Xᵀ(Xv) — two narrow
    // passes fused into one scan), which is what makes this the
    // 100 TB plan: nothing wider than 64 rows ever shuffles.
    // Exactness: x quantized to integer 1e-6 units; per-row dots are
    // exact BIGINTs, cross-row u/norm/trace sums accumulate in
    // DECIMAL(38) (HUGEINT oracle-side); each normalize re-quantizes
    // via floor((du·1e6)/sqrt(n2)) on identical doubles, so every
    // iteration's direction is the SAME integer vector in both
    // engines and the trajectory replays as chained CTEs. λ and the
    // share are exact-integer ratios evaluated in one fixed double
    // expression. v0 = uniform 1/8 (exactly dyadic).
    "embed_power_iter" -> ((s, d) =>
      Similarity.dominantDirection(
        Tables.embeddings(s, d).select(col("embedding")))),

    // Top-2 spectrum audit (round 11): dominantDirection + one
    // DEFLATED iteration chain — both directions, both energy shares,
    // and the measured |cos(v1,v2)| self-audit (≈0 or the deflation
    // failed). share1+share2 vs 2/64 reads how much of the space's
    // energy lives in a PLANE — the step past "is there a dominant
    // direction" toward the spectrum profile whitening needs.
    "embed_spectrum" -> ((s, d) =>
      Similarity.spectrum(
        Tables.embeddings(s, d).select(col("embedding")))),

    // All-but-the-top whitening audit (Mu & Viswanath ICLR 2018,
    // round 11) — the REPAIR for the anisotropy embed_power_iter
    // detects: remove the common mean + the top direction of the
    // CENTERED second moment; report the removed μ/v1, the residual's
    // new top direction, both centered-energy shares, the deflation
    // orthogonality audit, and iso_gain = share1/share2 (≈1: the
    // space was already isotropic; ≫1: a common direction was eating
    // it). Centering is a zip_with projection against the 1-row
    // broadcast integer mean — never a materialized corpus copy; the
    // per-dim mean is a truncating integer division so the centered
    // vectors are exact integers and the whole two-chain trajectory
    // replays as chained CTEs, spectrum's discipline.
    "embed_whiten" -> ((s, d) =>
      Similarity.whiten(
        Tables.embeddings(s, d).select(col("embedding")))),

    "embed_dimstats" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .select((col("pos") + 1).cast("long").as("dim"),
          floor(col("x").cast("double") * 1000000).cast("long").as("q"))
      val n = count(lit(1))
      val s1 = sum(col("q").cast("decimal(38,0)")).cast("double")
      val s2 = sum((col("q") * col("q")).cast("decimal(38,0)")).cast("double")
      val mean = s1 / lit(1000000.0) / n
      val ex2 = s2 / lit(1000000000000.0) / n
      e.groupBy("dim").agg(
        n.as("n"),
        round(mean, 6).as("mean"),
        round(sqrt(greatest(lit(0.0), ex2 - mean * mean)), 6).as("std"),
        round(min("q").cast("double") / lit(1000000.0), 6).as("mn"),
        round(max("q").cast("double") / lit(1000000.0), 6).as("mx"),
        round(sum(when(abs(col("q")) < 1000, 1L).otherwise(0L)).cast("double") / n, 6)
          .as("dead_frac"))
    }),

    // Embedding drift (round 8) — the vector twin of q_drift: per
    // label, the cosine between the mean vectors of the two snapshot
    // halves (vec_id parity — deterministic, data-derived). Semantics
    // spec'd on constructed halves in SimilaritySpec (identical → 1,
    // orthogonal → 0); scale shape documented on the shared operator.
    "embed_drift" -> ((s, d) =>
      Similarity.meanVectorDrift(
        Tables.embeddings(s, d)
          .select(col("label"), pmod(col("vec_id"), lit(2)).as("half"),
            col("embedding")),
        "label")),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup in
    // embedding space. Coarse k-means cells block the pairwise search
    // (deterministic first-k seed so the oracle replays the layout;
    // production trains cells with KMeansND.fit and sizes k ~ sqrt(N)
    // so per-cell pair counts stay bounded at 100 TB). Within a cell a
    // vector is dropped when a lower-id vector sits within cosine tau;
    // identical vectors collapse by content hash first, so the
    // pairwise stage runs over distinct vectors only. Output is the
    // per-cell funnel (vectors seen / kept / dropped).
    "embed_semdedup" -> ((s, d) => {
      import graft.operators.KMeansND
      val emb = Tables.embeddings(s, d)
      Similarity.semDedup(emb,
        KMeansND.seed(emb.select(col("vec_id").as("id"),
          col("embedding").as("vec")), SemCells), SemTau)
    }),

    // SemDeDup applied — the kept-id set (embed_semdedup reports the
    // funnel; this materializes the survivors a pipeline joins against
    // the corpus). Same cells, same tau, same blocked pairwise shape.
    "embed_semdedup_apply" -> ((s, d) => {
      import graft.operators.KMeansND
      val emb = Tables.embeddings(s, d)
      Similarity.semDedupApply(emb,
        KMeansND.seed(emb.select(col("vec_id").as("id"),
          col("embedding").as("vec")), SemCells), SemTau)
    }),

    // Embedding-space outlier detection — the curation step that drops
    // mislabeled/garbage vectors before training: per coarse cell,
    // flag vectors whose centroid distance exceeds mean + 1.5 sigma
    // (the synthetic corpus has a bounded tail; real corpora tune the z
    // cut per source).
    // One assignment scan (broadcast-literal centroid fold), one k-row
    // stats agg broadcast back — no pairwise work at any scale.
    // Distances are quantized to integer 1e-6 units before the
    // mean/stddev sums (round 10, the §4 rule: float sums over
    // unordered groups are association-dependent across engines —
    // avg/stddev_pop over raw doubles was the class the r9 ADVICE
    // flagged on q_entropy); the moments derive from exact DECIMAL(38)
    // integer sums, then round to 6 before the z-score so both engines
    // agree at the decision boundary.
    "embed_outliers" -> ((s, d) => {
      import graft.operators.KMeansND
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val assigned = KMeansND.assign(emb, KMeansND.seed(emb, SemCells))
        .select(col("id"), col("cid"), col("dist"),
          floor(col("dist") * 1000000).cast("long").as("qd"))
      val n = count(lit(1))
      val s1 = sum(col("qd").cast("decimal(38,0)")).cast("double")
      val s2 = sum((col("qd") * col("qd")).cast("decimal(38,0)")).cast("double")
      val mu = s1 / lit(1000000.0) / n
      val ex2 = s2 / lit(1000000000000.0) / n
      val stats = assigned.groupBy("cid").agg(
        round(mu, 6).as("mu"),
        round(sqrt(greatest(lit(0.0), ex2 - mu * mu)), 6).as("sigma"))
      assigned.join(broadcast(stats), "cid")
        .withColumn("z", round((col("dist") - col("mu")) / col("sigma"), 4))
        .filter(col("z") > 1.5)
        .select(col("id").as("vec_id"), col("cid"),
          round(col("dist"), 4).as("dist"), col("z"))
    }),

    // SQ8 scalar-quantization ANN (round 11) — the 4× compression
    // point on the memory/recall frontier between raw floats (1×) and
    // PQ (32×): every dimension quantizes independently to a byte
    // against trained per-dim [lo, hi] ranges, so the corpus ranking
    // scans 64-byte codes with near-exact fidelity (FAISS SQ8 / the
    // int8-embedding layout). Training is ONE corpus min/max pass (64
    // bounded rows collected); the (lo, scale) artifact is baked into
    // both plans as exact double literals via the trained-codebook
    // stash. Distance is the (|q|²−2q·v̂)+|v̂|² identity with
    // sequential dots — bit-identical to the oracle's
    // list_dot_product. Constant dims guard scale=1 (code 0, exact
    // decode bias lo+0.5·1 — consistent in both engines).
    "ann_sq8" -> ((s, d) => {
      import graft.functions.SQExpressions.{sq8AdcDist, sq8Encode}
      import graft.functions.TopKAggregate.topk
      val emb = Tables.embeddings(s, d)
      val st = emb
        .select(posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("i"), col("v").cast("double").as("v"))
        .groupBy("i").agg(min("v").as("lo"), max("v").as("hi"))
        .collect().sortBy(_.getInt(0))
      val lo = st.map(_.getDouble(1)).toSeq
      val sc = st.map(r => {
        val w = r.getDouble(2) - r.getDouble(1)
        if (w > 0) w / 255.0 else 1.0
      }).toSeq
      sqParams = Some((lo, sc))
      val codes = emb.select(col("vec_id"),
        sq8Encode(col("embedding"), lo, sc).as("codes"))
      val q = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      codes.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          sq8AdcDist(col("qemb"), col("codes"), lo, sc).as("ad"))
        .groupBy("qid")
        .agg(topk(struct(col("ad"), col("vid").as("v")), 3).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
          col("t.v").as("vid"), round(col("t.ad"), 4).as("ad"))
    }),

    "ann_lsh_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < NumQueries), k = 3)
    }),

    // Multi-probe LSH (Lv et al. VLDB 2007; round 15): each query also
    // probes the 2 buckets behind its two NEAREST hyperplanes — recall
    // rises without more hash tables, the corpus stays one bucketed
    // scan, and the spec measures the recall gain over ann_lsh_topk.
    "ann_lsh_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshMultiProbeTopK(emb,
        emb.filter(col("vec_id") < NumQueries), k = 3)
    }),

    // PQ ANN: 8 subspaces × 16 codewords (deterministic first-k
    // codebook; production trains per-subspace codebooks with
    // KMeansND.fit). The corpus ranking touches 8-code arrays only —
    // the 100 TB memory-compression path (32x here, 256 B → 8 B with
    // byte codes in production). Exact-arithmetic twin of the oracle.
    "ann_pq" -> ((s, d) => {
      import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
      import graft.functions.TopKAggregate.topk
      val emb = Tables.embeddings(s, d)
      val cb: Seq[Seq[Double]] = emb.filter(col("vec_id") < NumCodes)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
      val codes = emb.select(col("vec_id"), pqEncode(col("embedding"), cb, NumSub).as("codes"))
      val q = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      val cand = codes.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          pqAdcDist(col("qemb"), col("codes"), cb, NumSub).as("ad"))
      cand.groupBy("qid")
        .agg(topk(struct(col("ad"), col("vid").as("v")), 3).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
          col("t.v").as("vid"), round(col("t.ad"), 4).as("ad"))
    }),

    // ANN evaluation: per-query recall@3 of the LSH path against exact
    // cosine — the measurement a pipeline runs before trusting an
    // approximate index. Both constituent paths are oracle-gated, so
    // the composite is too.
    "ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < NumQueries)
      val exact = Similarity.topK(emb, q, k = 3).select(col("qid"), col("vid"))
      val approx = Similarity.lshTopK(emb, q, k = 3)
        .select(col("qid").as("aqid"), col("vid").as("avid"))
      exact.join(broadcast(approx),
          col("qid") === col("aqid") && col("vid") === col("avid"), "left")
        .groupBy("qid")
        .agg(round(count(col("avid")) / lit(3.0), 4).as("recall"))
    }),

    // IVF ANN: 16 coarse cells (deterministic first-k seed so the
    // oracle reproduces the layout; production trains via KMeansND.fit),
    // nprobe=2, exact cosine within probed cells.
    "ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = graft.operators.KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), NumCells)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < NumQueries),
        cents, k = 3, nprobe = 2)
    }),

    // Incremental IVF maintenance (round 18): yesterday's index
    // (vec_id % 10 ≠ 7) + today's arrival batch (% 10 = 7) through
    // ivfInsert — assignment to the EXISTING cells only, the batch
    // scan is the whole cost. The ORACLE REBUILDS FROM SCRATCH: the
    // hash gate IS the insert-then-probe ≡ rebuild-then-probe
    // equivalence, at gate scale, every round.
    "ann_ivf_insert" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = graft.operators.KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), NumCells)
      val index = Similarity.ivfIndex(
        emb.filter(col("vec_id") % 10 =!= 7), cents)
      val updated = Similarity.ivfInsert(index,
        emb.filter(col("vec_id") % 10 === 7), cents)
      Similarity.ivfTopKIndexed(updated,
        emb.filter(col("vec_id") < NumQueries), cents, k = 3, nprobe = 2)
    }),

    // IVF + PQ composed — the billion-vector index layout: coarse cells
    // prune the probe set, ADC over byte-packed codes ranks inside
    // probed cells, raw embeddings never leave the query side. Same
    // cell geometry as ann_ivf and the same encode/ADC arithmetic as
    // ann_pq, so the composed oracle replays both stages exactly.
    "ann_ivfpq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = graft.operators.KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), NumCells)
      val cb: Seq[Seq[Double]] = emb.filter(col("vec_id") < NumCodes)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < NumQueries),
        cents, cb, NumSub, k = 3, nprobe = 2)
    }),

    // Incremental IVF+PQ maintenance (round 18) — ann_ivf_insert's
    // contract on the COMPRESSED index: yesterday's (vec_id, cell,
    // codes) rows + today's batch assigned/encoded against the SAME
    // artifacts; the oracle rebuilds from scratch, so the hash gate
    // IS insert ≡ rebuild for the code rows too.
    "ann_ivfpq_insert" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = graft.operators.KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), NumCells)
      val cb: Seq[Seq[Double]] = emb.filter(col("vec_id") < NumCodes)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
      val index = Similarity.ivfPqIndex(
        emb.filter(col("vec_id") % 10 =!= 7), cents, cb, NumSub)
      val updated = Similarity.ivfPqInsert(index,
        emb.filter(col("vec_id") % 10 === 7), cents, cb, NumSub)
      Similarity.ivfPqTopKIndexed(updated,
        emb.filter(col("vec_id") < NumQueries), cents, cb, NumSub,
        k = 3, nprobe = 2)
    }),

    // PQ with exact re-ranking — the standard recall repair: the cheap
    // ADC pass shortlists 10 candidates per query from codes alone,
    // then the exact cosine runs ONLY on the shortlist (10 vector
    // fetches per query, not a corpus scan) and re-ranks to top-3.
    // This is how production PQ serves high recall at code-scan cost;
    // both stages reuse gated arithmetic (ann_pq's ADC, ann_topk's
    // cosine), so the composite is oracle-replayable.
    "ann_pq_rerank" -> ((s, d) => {
      import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
      import graft.functions.TopKAggregate.topk
      import graft.functions.VectorFunctions.cosineSim
      val emb = Tables.embeddings(s, d)
      val cb: Seq[Seq[Double]] = emb.filter(col("vec_id") < NumCodes)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
      val codes = emb.select(col("vec_id"),
        pqEncode(col("embedding"), cb, NumSub).as("codes"))
      val q = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      val shortlist = codes.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          pqAdcDist(col("qemb"), col("codes"), cb, NumSub).as("ad"))
        .groupBy("qid")
        .agg(topk(struct(col("ad"), col("vid").as("v")), 10).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.v").as("vid"))
      val rer = shortlist
        .join(emb.select(col("vec_id").as("vid"), col("embedding").as("vemb")), "vid")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("vid"),
          cosineSim(col("qemb"), col("vemb")).as("cos"))
      rer.groupBy("qid")
        .agg(topk(struct((-col("cos")).as("negcos"), col("vid").as("v")), 3).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
          col("t.v").as("vid"), round(-col("t.negcos"), 4).as("cos"))
    }),

    // Recall-vs-cost sweep — the tuning table an ANN deployment reads
    // before picking its operating point: recall@3 against exact cosine
    // for the two production knobs at two settings each (PQ-rerank
    // shortlist 10/32, IVF+PQ nprobe 2/4). The knob IS the unit cost —
    // shortlist = exact-vector fetches per query, nprobe = cells
    // scanned per query — so the four rows are the recall/cost
    // frontier directly. Recall is one exact count over all queries
    // (matches / 3·|Q| — no per-query float averaging, so the value is
    // order-independent and oracle-replayable). A tuning query: it
    // re-encodes the toy corpus per family; at 100 TB the codes/cells
    // are the persisted index, not recomputed.
    "ann_recall_sweep" -> ((s, d) => {
      import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
      import graft.functions.TopKAggregate.topk
      import graft.functions.VectorFunctions.cosineSim
      import graft.operators.KMeansND
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < NumQueries)
      val truth = Similarity.topK(emb, q, k = 3).select(col("qid"), col("vid"))
      val cb: Seq[Seq[Double]] = emb.filter(col("vec_id") < NumCodes)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
      val codes = emb.select(col("vec_id"),
        pqEncode(col("embedding"), cb, NumSub).as("codes"))
      val qs = q.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      val adc = codes.join(broadcast(qs), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          pqAdcDist(col("qemb"), col("codes"), cb, NumSub).as("ad"))
      def rerankTop3(shortN: Int): DataFrame = {
        val shortlist = adc.groupBy("qid")
          .agg(topk(struct(col("ad"), col("vid").as("v")), shortN).as("top"))
          .select(col("qid"), explode(col("top")).as("t"))
          .select(col("qid"), col("t.v").as("vid"))
        shortlist
          .join(emb.select(col("vec_id").as("vid"), col("embedding").as("vemb")), "vid")
          .join(broadcast(qs), "qid")
          .select(col("qid"), col("vid"),
            cosineSim(col("qemb"), col("vemb")).as("cos"))
          .groupBy("qid")
          .agg(topk(struct((-col("cos")).as("negcos"), col("vid").as("v")), 3).as("top"))
          .select(col("qid"), explode(col("top")).as("t"))
          .select(col("qid"), col("t.v").as("vid"))
      }
      val cents = KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), NumCells)
      def ivfpqTop3(np: Int): DataFrame =
        Similarity.ivfPqTopK(emb, q, cents, cb, NumSub, k = 3, nprobe = np)
          .select(col("qid"), col("vid"))
      def recallRow(approx: DataFrame, family: String, knob: Int): DataFrame =
        truth.as("x").join(broadcast(approx.as("a")),
            col("x.qid") === col("a.qid") && col("x.vid") === col("a.vid"), "left")
          .agg(round(count(col("a.vid")) / lit(3.0 * NumQueries), 4).as("recall"))
          .select(lit(family).as("family"), lit(knob).cast("int").as("knob"),
            col("recall"))
      recallRow(rerankTop3(10), "pq_rerank", 10)
        .unionByName(recallRow(rerankTop3(32), "pq_rerank", 32))
        .unionByName(recallRow(ivfpqTop3(2), "ivfpq", 2))
        .unionByName(recallRow(ivfpqTop3(4), "ivfpq", 4))
    }),

    // Production-recipe recall, oracle-gated (round 9): ann_recall_sweep
    // publishes the SEEDED-codebook frontier; this key runs the
    // production recipe itself — Lloyd-TRAINED codebook
    // (Similarity.trainedPqCodebook, distributed fit per subspace),
    // shortlist-32 exact rerank — and gates its recall@3 against
    // DuckDB. The trained codewords are Spark-fitted state the oracle
    // cannot re-fit (SQL has no session), so the plan bakes them in as
    // literals and the oracle inlines the SAME doubles via the stash
    // below (Double.toString → DuckDB parse is bit-exact; Verify dumps
    // oracle_sql.json AFTER the queries run) — exactly how a
    // production index consumes a codebook: train once, replay the
    // artifact everywhere.
    "ann_trained_recall" -> ((s, d) => {
      import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
      import graft.functions.TopKAggregate.topk
      import graft.functions.VectorFunctions.cosineSim
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < NumQueries)
      val cb = Similarity.trainedPqCodebook(emb, NumCodes, NumSub)
      trainedCb = Some(cb)
      val truth = Similarity.topK(emb, q, k = 3).select(col("qid"), col("vid"))
      val codes = emb.select(col("vec_id"),
        pqEncode(col("embedding"), cb, NumSub).as("codes"))
      val qs = q.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      val adc = codes.join(broadcast(qs), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("vid"),
          pqAdcDist(col("qemb"), col("codes"), cb, NumSub).as("ad"))
      val shortlist = adc.groupBy("qid")
        .agg(topk(struct(col("ad"), col("vid").as("v")), 32).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.v").as("vid"))
      val approx = shortlist
        .join(emb.select(col("vec_id").as("vid"), col("embedding").as("vemb")), "vid")
        .join(broadcast(qs), "qid")
        .select(col("qid"), col("vid"),
          cosineSim(col("qemb"), col("vemb")).as("cos"))
        .groupBy("qid")
        .agg(topk(struct((-col("cos")).as("negcos"), col("vid").as("v")), 3).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.v").as("vid"))
      truth.as("x").join(broadcast(approx.as("a")),
          col("x.qid") === col("a.qid") && col("x.vid") === col("a.vid"), "left")
        .agg(round(count(col("a.vid")) / lit(3.0 * NumQueries), 4).as("recall"))
        .select(lit("pq_rerank_trained").as("family"),
          lit(32).cast("int").as("knob"), col("recall"))
    }),

    // Graph ANN (round 11) — the NSW/HNSW family completing the index
    // taxonomy beside IVF/PQ/LSH: partition-local navigable-small-world
    // graphs (Malkov & Yashunin 2016), sharded-serving fan-out, bounded
    // top-k merge. Build is zero-shuffle (each partition indexes its
    // own vectors); search cost per query per shard is the beam walk
    // (efSearch candidates), not the shard scan. Rows-only gate: the
    // graph walk is imperative; SimilaritySpec pins recall@3 >= the
    // ann_recall_sweep IVF+PQ nprobe=2 point at equal probe cost and
    // >= 0.8 absolute.
    "ann_hnsw" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.nswTopK(emb, emb.filter(col("vec_id") < NumQueries), k = 3)
    }),

    // Residual-encoding IVF+PQ (the FAISS IVFPQ layout): codes quantize
    // v − centroid(cell) — residuals concentrate near the origin, so a
    // shared codebook covers every cell. The deterministic codebook is
    // the residuals of the first-k vectors (assignment computed through
    // the SAME plan arithmetic as the index side, so the oracle replays
    // it); exact double subtraction end to end, no float round-trips.
    "ann_ivfpq_residual" -> ((s, d) => {
      import graft.operators.KMeansND
      val emb = Tables.embeddings(s, d)
      val cents = KMeansND.seed(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")), NumCells)
      val centMap = cents.toMap
      val cb: Seq[Seq[Double]] = KMeansND.assign(
          emb.filter(col("vec_id") < NumCodes)
            .select(col("vec_id").as("id"), col("embedding").as("vec")), cents)
        .select(col("id"), col("vec"), col("cid")).collect()
        .sortBy(_.getLong(0))
        .map { r =>
          val v = r.getSeq[Float](1).map(_.toDouble)
          val cv = centMap(r.getInt(2))
          v.zip(cv).map { case (a, b) => a - b }.toSeq
        }.toSeq
      Similarity.ivfPqResidualTopK(emb, emb.filter(col("vec_id") < NumQueries),
        cents, cb, NumSub, k = 3, nprobe = 2)
    })
  )

  private val NumCells = 16
  private val NumCodes = 16 // PQ codewords per subspace
  private val NumSub = 8 // PQ subspaces (64-d → 8 dims each)
  private val SemCells = 8 // SemDeDup coarse cells (production: ~sqrt(N))
  private val SemTau = 0.3 // SemDeDup cosine threshold

  private val cosSql =
    """(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |   (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |    sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))))""".stripMargin

  // Trained-codebook stash: ann_trained_recall bakes Lloyd-fitted
  // codewords into its plan at run time; the oracle def below reads
  // them back so the SQL replays the EXACT artifact. Safe because
  // Verify emits oracle_sql.json after every query has run; if the
  // query never ran in this process the fallback marker row keeps the
  // compare honest instead of vacuously passing.
  @volatile private var trainedCb: Option[Seq[Seq[Double]]] = None

  // ann_sq8's trained (lo, scale) artifact, stashed at query run time
  // like trainedCb; the oracle inlines the exact doubles.
  @volatile private var sqParams: Option[(Seq[Double], Seq[Double])] = None

  // the exact hyperplane doubles the Spark plan bakes in, inlined as
  // round-trip literals (Double.toString → DuckDB parse is bit-exact)
  private def planesSql: String =
    graft.operators.Similarity.planes(6, 64).zipWithIndex.map { case (pv, p) =>
      s"($p, [${pv.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n  ")

  // one SQL slice expression per PQ subspace (1-based, inclusive bounds)
  private def sl(t: String, m: Int): String = {
    val sub = 64 / NumSub
    s"$t.v[${m * sub + 1}:${(m + 1) * sub}]"
  }

  // PQ SQL fragments shared by ann_pq and ann_ivfpq. encode: per
  // (doc, subspace) argmin codeword under the (|x|²−2x·c)+|c|²
  // identity; ADC: one cb join per code-list position and a
  // statically-unrolled ascending-m sum (bit-equal to the native
  // expression's accumulation order). The query alias is `q` with
  // DOUBLE[] column `v` in both call sites.
  private def pqEncDistSql: String = {
    val sub = 64 / NumSub
    s"""(list_dot_product(e.v[(m.m*$sub+1):(m.m*$sub+$sub)], e.v[(m.m*$sub+1):(m.m*$sub+$sub)])
       | - 2*list_dot_product(e.v[(m.m*$sub+1):(m.m*$sub+$sub)], c.v[(m.m*$sub+1):(m.m*$sub+$sub)]))
       | + list_dot_product(c.v[(m.m*$sub+1):(m.m*$sub+$sub)], c.v[(m.m*$sub+1):(m.m*$sub+$sub)])""".stripMargin
  }
  private def pqCbJoinsSql(cbName: String = "cb"): String = (0 until NumSub)
    .map(m => s"JOIN $cbName c$m ON c$m.code = d.cs[${m + 1}]").mkString("\n  ")
  private def pqAdcTermsSql: String = (0 until NumSub).map { m =>
    s"""((list_dot_product(${sl("q", m)}, ${sl("q", m)})
       |  - 2*list_dot_product(${sl("q", m)}, ${sl(s"c$m", m)}))
       |  + list_dot_product(${sl(s"c$m", m)}, ${sl(s"c$m", m)}))""".stripMargin
  }.mkString("\n + ")

  // ann_sq8's oracle: decode every corpus vector from its per-dim byte
  // code using the STASHED (lo, scale) literals (encode and midpoint
  // decode fused into one indexed list_transform), then the same
  // (|q|²−2q·v̂)+|v̂|² ADC identity with sequential dots.
  private def sq8Sql: String = sqParams match {
    case None =>
      // query never ran in this process: impossible row → loud failure
      "SELECT CAST(0 AS BIGINT) AS qid, CAST(0 AS INT) AS rk, " +
        "CAST(0 AS BIGINT) AS vid, 0.0 AS ad WHERE 1 = 0"
    case Some((lo, sc)) =>
      s"""WITH parms AS (SELECT CAST([${lo.mkString(", ")}] AS DOUBLE[]) AS lo,
         |    CAST([${sc.mkString(", ")}] AS DOUBLE[]) AS sc),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |dec AS (SELECT vec_id,
         |    list_transform(v, (x, i) -> lo[i] +
         |      (least(255.0, greatest(0.0, floor((x - lo[i]) / sc[i]))) + 0.5)
         |        * sc[i]) AS vh
         |  FROM emb CROSS JOIN parms),
         |adc AS (SELECT q.vec_id AS qid, d.vec_id AS vid,
         |    (list_dot_product(q.v, q.v) - 2 * list_dot_product(q.v, d.vh))
         |      + list_dot_product(d.vh, d.vh) AS ad
         |  FROM emb q CROSS JOIN dec d
         |  WHERE q.vec_id < $NumQueries AND d.vec_id <> q.vec_id)
         |SELECT qid, rk, vid, round(ad, 4) AS ad FROM (
         |  SELECT qid, vid, ad,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS INT)
         |      AS rk
         |  FROM adc) WHERE rk <= 3""".stripMargin
  }

  // ann_trained_recall's oracle: the sweep's pq_rerank@32 pipeline with
  // the codebook CTE replaced by the stashed TRAINED codewords as
  // inline VALUES literals — both engines replay the same artifact
  private def trainedRecallSql: String = trainedCb match {
    case None =>
      // query never ran in this process: an impossible row, so a stale
      // pairing fails the compare loudly instead of silently passing
      "SELECT 'pq_rerank_trained' AS family, 32 AS knob, 0.0 AS recall WHERE 1 = 0"
    case Some(cb) =>
      val cbRows = cb.zipWithIndex.map { case (v, j) =>
        s"($j, [${v.mkString(", ")}]::DOUBLE[])"
      }.mkString(",\n  ")
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cb(code, v) AS (VALUES
         |  $cbRows),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT e.vec_id, m.m, c.code,
         |      row_number() OVER (PARTITION BY e.vec_id, m.m
         |        ORDER BY $pqEncDistSql, c.code) AS rn
         |    FROM emb e CROSS JOIN range(0, $NumSub) m(m) CROSS JOIN cb c)
         |  WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM enc GROUP BY vec_id),
         |adc AS (
         |  SELECT q.vec_id AS qid, d.vec_id AS vid,
         |    $pqAdcTermsSql AS ad
         |  FROM emb q CROSS JOIN codes d
         |  ${pqCbJoinsSql()}
         |  WHERE q.vec_id < $NumQueries AND d.vec_id <> q.vec_id),
         |ranked AS (SELECT qid, vid,
         |  row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS srk FROM adc),
         |rer AS (
         |  SELECT s.qid, s.vid,
         |    (list_dot_product(q.v, c.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))) AS cos
         |  FROM ranked s
         |  JOIN emb q ON q.vec_id = s.qid
         |  JOIN emb c ON c.vec_id = s.vid
         |  WHERE s.srk <= 32),
         |ap AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM rer) WHERE rk <= 3),
         |excand AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vid, $cosSql AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < $NumQueries
         |    AND b.vec_id <> a.vec_id),
         |ex AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM excand) WHERE rk <= 3)
         |SELECT 'pq_rerank_trained' AS family, 32 AS knob,
         |  round(count(a.vid)/(3.0*$NumQueries), 4) AS recall
         |FROM ex LEFT JOIN ap a ON a.qid = ex.qid AND a.vid = ex.vid""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "ann_trained_recall" -> trainedRecallSql,
    "ann_sq8" -> sq8Sql,

    // replay the quantized JL projection: same u32-parity signs, same
    // exact-integer distances, one float division per pair
    "embed_jl" ->
      s"""WITH qt AS MATERIALIZED (SELECT vec_id, i,
         |    CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS q
         |  FROM (SELECT vec_id, unnest(embedding) AS x,
         |      unnest(range(0, len(embedding))) AS i FROM embeddings)),
         |proj AS (SELECT vec_id, j,
         |    sum(CASE WHEN CAST(('0x'||substr(md5('jl:'||CAST(i AS VARCHAR)
         |        ||':'||CAST(j AS VARCHAR)),1,8)) AS BIGINT) % 2 = 0
         |      THEN q ELSE -q END) AS y
         |  FROM qt, range(0, $JlDim) t(j) GROUP BY 1, 2),
         |do2 AS (SELECT a.vec_id AS pid, sum((a.q - b.q) * (a.q - b.q)) AS d
         |  FROM qt a JOIN qt b
         |    ON b.vec_id = a.vec_id + 1 AND b.i = a.i AND a.vec_id % 2 = 0
         |  GROUP BY 1),
         |dp2 AS (SELECT a.vec_id AS pid, sum((a.y - b.y) * (a.y - b.y)) AS d
         |  FROM proj a JOIN proj b
         |    ON b.vec_id = a.vec_id + 1 AND b.j = a.j AND a.vec_id % 2 = 0
         |  GROUP BY 1),
         |ratio AS MATERIALIZED (SELECT do2.pid,
         |    CAST(dp2.d AS DOUBLE) / ($JlDim.0 * do2.d) AS r
         |  FROM do2 JOIN dp2 USING (pid) WHERE do2.d > 0),
         |summary AS (SELECT count(*) AS n_pairs_total,
         |    round(CAST(sum(CAST(floor(r * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000.0, 4) AS mean_ratio
         |  FROM ratio)
         |SELECT CAST(floor(r * 10) AS INT) AS ratio_bin,
         |  count(*) AS n_pairs, n_pairs_total, mean_ratio
         |FROM ratio CROSS JOIN summary GROUP BY 1, 3, 4""".stripMargin,
    // replay the quantized power-iteration trajectory: each round is
    // (per-id dot) → (per-dim HUGEINT u) → (du = u // 1e12, trunc
    // toward zero = Spark div) → floor-requantized unit direction;
    // every cross-row sum is exact, the only floats are the per-round
    // sqrt/divide on identical inputs
    "embed_power_iter" -> {
      def round(i: Int, prevV: String): String =
        s"""s$i AS (SELECT id, sum(q * $prevV) AS s
           |  FROM qx ${if (i == 1) "" else s"JOIN v${i - 1} USING (dim)"}
           |  GROUP BY id),
           |u$i AS (SELECT dim, sum(CAST(q AS HUGEINT) * s$i.s) AS u
           |  FROM qx JOIN s$i USING (id) GROUP BY dim),
           |d$i AS (SELECT dim, CAST(u // 1000000000000 AS BIGINT) AS du FROM u$i),
           |n$i AS (SELECT sum(CAST(du AS HUGEINT) * du) AS n2 FROM d$i),
           |v$i AS (SELECT dim, CAST(floor(CAST(du * 1000000 AS DOUBLE)
           |    / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS qv FROM d$i, n$i)"""
          .stripMargin
      s"""WITH qx AS (SELECT id, i + 1 AS dim,
         |    CAST(floor(v * 1000000) AS BIGINT) AS q
         |  FROM (SELECT vec_id AS id,
         |      unnest(CAST(embedding AS DOUBLE[])) AS v,
         |      unnest(range(0, 64)) AS i
         |    FROM embeddings)),
         |${round(1, "125000")},
         |${round(2, "qv")},
         |${round(3, "qv")},
         |s4 AS (SELECT id, sum(q * qv) AS s
         |  FROM qx JOIN v3 USING (dim) GROUP BY id),
         |sn AS (SELECT sum(CAST(s AS HUGEINT) * s) AS sn, count(*) AS n
         |  FROM s4),
         |nq AS (SELECT sum(CAST(qv AS HUGEINT) * qv) AS nv FROM v3),
         |tr AS (SELECT sum(CAST(q AS HUGEINT) * q) AS t FROM qx)
         |SELECT dim, round(CAST(qv AS DOUBLE) / 1000000.0, 6) AS v,
         |  round(CAST(sn AS DOUBLE)
         |      / (CAST(nv AS DOUBLE) * 1000000000000.0 * n), 6)
         |    AS lambda,
         |  round(CAST(sn AS DOUBLE) / (CAST(nv AS DOUBLE) * CAST(t AS DOUBLE)), 6)
         |    AS share
         |FROM v3, sn, nq, tr""".stripMargin
    },

    // the two-direction replay: the v-chain is embed_power_iter's,
    // the w-chain adds the exact-integer projection off v3 per round
    // (p = v3ᵀdu, q = v3ᵀv3, du′ = du − (qv·p) // q — truncating
    // division = Spark div)
    "embed_spectrum" -> {
      def vround(i: Int, prevV: String): String =
        s"""s$i AS (SELECT id, sum(q * $prevV) AS s
           |  FROM qx ${if (i == 1) "" else s"JOIN v${i - 1} USING (dim)"}
           |  GROUP BY id),
           |u$i AS (SELECT dim, sum(CAST(q AS HUGEINT) * s$i.s) AS u
           |  FROM qx JOIN s$i USING (id) GROUP BY dim),
           |d$i AS (SELECT dim, CAST(u // 1000000000000 AS BIGINT) AS du FROM u$i),
           |n$i AS (SELECT sum(CAST(du AS HUGEINT) * du) AS n2 FROM d$i),
           |v$i AS MATERIALIZED (SELECT dim, CAST(floor(CAST(du * 1000000 AS DOUBLE)
           |    / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS qv FROM d$i, n$i)"""
          .stripMargin
      def wround(i: Int, prevW: String): String =
        s"""ws$i AS (SELECT id, sum(q * $prevW) AS s
           |  FROM qx ${if (i == 1) "" else s"JOIN w${i - 1} USING (dim)"}
           |  GROUP BY id),
           |wu$i AS (SELECT dim, sum(CAST(q AS HUGEINT) * ws$i.s) AS u
           |  FROM qx JOIN ws$i USING (id) GROUP BY dim),
           |wd$i AS MATERIALIZED (SELECT dim,
           |    CAST(u // 1000000000000 AS BIGINT) AS du FROM wu$i),
           |wpq$i AS (SELECT sum(CAST(v3.qv AS HUGEINT) * wd$i.du) AS p,
           |    sum(CAST(v3.qv AS HUGEINT) * v3.qv) AS q
           |  FROM wd$i JOIN v3 USING (dim)),
           |wp$i AS MATERIALIZED (SELECT wd$i.dim,
           |    wd$i.du - CAST((CAST(v3.qv AS HUGEINT) * wpq$i.p)
           |      // wpq$i.q AS BIGINT) AS du
           |  FROM wd$i JOIN v3 USING (dim), wpq$i),
           |wn$i AS (SELECT sum(CAST(du AS HUGEINT) * du) AS n2 FROM wp$i),
           |w$i AS MATERIALIZED (SELECT dim, CAST(floor(CAST(du * 1000000 AS DOUBLE)
           |    / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS qv FROM wp$i, wn$i)"""
          .stripMargin
      val w0 = "(CASE WHEN dim % 2 = 1 THEN 125000 ELSE -125000 END)"
      s"""WITH qx AS (SELECT id, i + 1 AS dim,
         |    CAST(floor(v * 1000000) AS BIGINT) AS q
         |  FROM (SELECT vec_id AS id,
         |      unnest(CAST(embedding AS DOUBLE[])) AS v,
         |      unnest(range(0, 64)) AS i
         |    FROM embeddings)),
         |${vround(1, "125000")},
         |${vround(2, "qv")},
         |${vround(3, "qv")},
         |${wround(1, w0)},
         |${wround(2, "qv")},
         |${wround(3, "qv")},
         |sa AS (SELECT id, sum(q * qv) AS s FROM qx JOIN v3 USING (dim)
         |  GROUP BY id),
         |fn1 AS (SELECT sum(CAST(s AS HUGEINT) * s) AS sn1 FROM sa),
         |sb AS (SELECT id, sum(q * qv) AS s FROM qx JOIN w3 USING (dim)
         |  GROUP BY id),
         |fn2 AS (SELECT sum(CAST(s AS HUGEINT) * s) AS sn2 FROM sb),
         |nrm AS (SELECT sum(CAST(v3.qv AS HUGEINT) * v3.qv) AS nv1,
         |    sum(CAST(w3.qv AS HUGEINT) * w3.qv) AS nv2,
         |    sum(CAST(v3.qv AS HUGEINT) * w3.qv) AS dot12
         |  FROM v3 JOIN w3 USING (dim)),
         |tr AS (SELECT sum(CAST(q AS HUGEINT) * q) AS t FROM qx)
         |SELECT v3.dim,
         |  round(CAST(v3.qv AS DOUBLE) / 1000000.0, 6) AS v1,
         |  round(CAST(w3.qv AS DOUBLE) / 1000000.0, 6) AS v2,
         |  round(CAST(sn1 AS DOUBLE)
         |    / (CAST(nv1 AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS share1,
         |  round(CAST(sn2 AS DOUBLE)
         |    / (CAST(nv2 AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS share2,
         |  round(abs(CAST(dot12 AS DOUBLE))
         |    / (sqrt(CAST(nv1 AS DOUBLE)) * sqrt(CAST(nv2 AS DOUBLE))), 6)
         |    AS abs_cos12
         |FROM v3 JOIN w3 USING (dim), fn1, fn2, nrm, tr""".stripMargin
    },

    // embed_spectrum's two-chain replay run over the CENTERED integer
    // table cx (q − per-dim truncating-div mean), plus the μ column
    // and the iso_gain ratio — the all-but-the-top surgery audit.
    "embed_whiten" -> {
      def vround(i: Int, prevV: String): String =
        s"""s$i AS (SELECT id, sum(q * $prevV) AS s
           |  FROM cx ${if (i == 1) "" else s"JOIN v${i - 1} USING (dim)"}
           |  GROUP BY id),
           |u$i AS (SELECT dim, sum(CAST(q AS HUGEINT) * s$i.s) AS u
           |  FROM cx JOIN s$i USING (id) GROUP BY dim),
           |d$i AS (SELECT dim, CAST(u // 1000000000000 AS BIGINT) AS du FROM u$i),
           |n$i AS (SELECT sum(CAST(du AS HUGEINT) * du) AS n2 FROM d$i),
           |v$i AS MATERIALIZED (SELECT dim, CAST(floor(CAST(du * 1000000 AS DOUBLE)
           |    / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS qv FROM d$i, n$i)"""
          .stripMargin
      def wround(i: Int, prevW: String): String =
        s"""ws$i AS (SELECT id, sum(q * $prevW) AS s
           |  FROM cx ${if (i == 1) "" else s"JOIN w${i - 1} USING (dim)"}
           |  GROUP BY id),
           |wu$i AS (SELECT dim, sum(CAST(q AS HUGEINT) * ws$i.s) AS u
           |  FROM cx JOIN ws$i USING (id) GROUP BY dim),
           |wd$i AS MATERIALIZED (SELECT dim,
           |    CAST(u // 1000000000000 AS BIGINT) AS du FROM wu$i),
           |wpq$i AS (SELECT sum(CAST(v3.qv AS HUGEINT) * wd$i.du) AS p,
           |    sum(CAST(v3.qv AS HUGEINT) * v3.qv) AS q
           |  FROM wd$i JOIN v3 USING (dim)),
           |wp$i AS MATERIALIZED (SELECT wd$i.dim,
           |    wd$i.du - CAST((CAST(v3.qv AS HUGEINT) * wpq$i.p)
           |      // wpq$i.q AS BIGINT) AS du
           |  FROM wd$i JOIN v3 USING (dim), wpq$i),
           |wn$i AS (SELECT sum(CAST(du AS HUGEINT) * du) AS n2 FROM wp$i),
           |w$i AS MATERIALIZED (SELECT dim, CAST(floor(CAST(du * 1000000 AS DOUBLE)
           |    / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS qv FROM wp$i, wn$i)"""
          .stripMargin
      val w0 = "(CASE WHEN dim % 2 = 1 THEN 125000 ELSE -125000 END)"
      s"""WITH qx AS (SELECT id, i + 1 AS dim,
         |    CAST(floor(v * 1000000) AS BIGINT) AS q
         |  FROM (SELECT vec_id AS id,
         |      unnest(CAST(embedding AS DOUBLE[])) AS v,
         |      unnest(range(0, 64)) AS i
         |    FROM embeddings)),
         |mu AS MATERIALIZED (SELECT dim,
         |    CAST(sum(CAST(q AS HUGEINT)) // count(*) AS BIGINT) AS mq
         |  FROM qx GROUP BY dim),
         |cx AS MATERIALIZED (SELECT id, qx.dim, q - mq AS q
         |  FROM qx JOIN mu USING (dim)),
         |${vround(1, "125000")},
         |${vround(2, "qv")},
         |${vround(3, "qv")},
         |${wround(1, w0)},
         |${wround(2, "qv")},
         |${wround(3, "qv")},
         |sa AS (SELECT id, sum(q * qv) AS s FROM cx JOIN v3 USING (dim)
         |  GROUP BY id),
         |fn1 AS (SELECT sum(CAST(s AS HUGEINT) * s) AS sn1 FROM sa),
         |sb AS (SELECT id, sum(q * qv) AS s FROM cx JOIN w3 USING (dim)
         |  GROUP BY id),
         |fn2 AS (SELECT sum(CAST(s AS HUGEINT) * s) AS sn2 FROM sb),
         |nrm AS (SELECT sum(CAST(v3.qv AS HUGEINT) * v3.qv) AS nv1,
         |    sum(CAST(w3.qv AS HUGEINT) * w3.qv) AS nv2,
         |    sum(CAST(v3.qv AS HUGEINT) * w3.qv) AS dot12
         |  FROM v3 JOIN w3 USING (dim)),
         |tr AS (SELECT sum(CAST(q AS HUGEINT) * q) AS t FROM cx)
         |SELECT v3.dim,
         |  round(CAST(mq AS DOUBLE) / 1000000.0, 6) AS mu,
         |  round(CAST(v3.qv AS DOUBLE) / 1000000.0, 6) AS v1,
         |  round(CAST(w3.qv AS DOUBLE) / 1000000.0, 6) AS v2,
         |  round(CAST(sn1 AS DOUBLE)
         |    / (CAST(nv1 AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS share1,
         |  round(CAST(sn2 AS DOUBLE)
         |    / (CAST(nv2 AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS share2,
         |  round(abs(CAST(dot12 AS DOUBLE))
         |    / (sqrt(CAST(nv1 AS DOUBLE)) * sqrt(CAST(nv2 AS DOUBLE))), 6)
         |    AS abs_cos12,
         |  CASE WHEN sn2 = 0 THEN NULL
         |    ELSE round((CAST(sn1 AS DOUBLE) * CAST(nv2 AS DOUBLE))
         |      / (CAST(sn2 AS DOUBLE) * CAST(nv1 AS DOUBLE)), 4) END
         |    AS iso_gain
         |FROM v3 JOIN w3 USING (dim) JOIN mu USING (dim),
         |  fn1, fn2, nrm, tr""".stripMargin
    },

    "embed_dimstats" ->
      """WITH e AS (
        |  SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
        |    unnest(range(0, 64)) AS i
        |  FROM embeddings),
        |qv AS (SELECT i + 1 AS dim, CAST(floor(v * 1000000) AS BIGINT) AS q FROM e),
        |a AS (SELECT dim, count(*) AS n,
        |    CAST(sum(q) AS DOUBLE) AS s1, CAST(sum(q*q) AS DOUBLE) AS s2,
        |    CAST(min(q) AS DOUBLE) AS mnq, CAST(max(q) AS DOUBLE) AS mxq,
        |    CAST(sum(CASE WHEN abs(q) < 1000 THEN 1 ELSE 0 END) AS DOUBLE) AS nd
        |  FROM qv GROUP BY 1),
        |m AS (SELECT dim, n, s1/1000000.0/n AS mean,
        |    s2/1000000000000.0/n AS ex2, mnq, mxq, nd FROM a)
        |SELECT dim, n, round(mean, 6) AS mean,
        |  round(sqrt(greatest(0.0, ex2 - mean*mean)), 6) AS std,
        |  round(mnq/1000000.0, 6) AS mn, round(mxq/1000000.0, 6) AS mx,
        |  round(nd/n, 6) AS dead_frac
        |FROM m""".stripMargin,

    "embed_drift" ->
      """WITH e AS (
        |  SELECT label, vec_id % 2 AS half,
        |    unnest(CAST(embedding AS DOUBLE[])) AS v,
        |    unnest(range(0, 64)) AS i
        |  FROM embeddings),
        |m AS (
        |  SELECT label, half, i,
        |    CAST(floor((CAST(sum(CAST(floor(v * 1000000) AS BIGINT)) AS DOUBLE)
        |      / 1000000.0 / count(*)) * 1000000000.0) AS BIGINT) AS mq
        |  FROM e GROUP BY 1, 2, 3)
        |SELECT r.label,
        |  round(CAST(sum(CAST(r.mq AS HUGEINT) * c.mq) AS DOUBLE) /
        |    (sqrt(CAST(sum(CAST(r.mq AS HUGEINT) * r.mq) AS DOUBLE)) *
        |     sqrt(CAST(sum(CAST(c.mq AS HUGEINT) * c.mq) AS DOUBLE))), 6)
        |    AS cos_ref_cur,
        |  count(*) AS n_dims
        |FROM m r JOIN m c ON r.label = c.label AND r.i = c.i
        |  AND r.half = 0 AND c.half = 1
        |GROUP BY 1""".stripMargin,
    "embed_outliers" ->
      s"""WITH pts AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(id AS INT) AS cid, v AS cv FROM pts WHERE id < $SemCells),
         |a AS (SELECT id, cid, dist FROM (
         |  SELECT p.id, c.cid,
         |    (list_dot_product(p.v,p.v) - 2*list_dot_product(p.v,c.cv))
         |      + list_dot_product(c.cv,c.cv) AS dist,
         |    row_number() OVER (PARTITION BY p.id ORDER BY
         |      (list_dot_product(p.v,p.v) - 2*list_dot_product(p.v,c.cv))
         |        + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM pts p CROSS JOIN cent c) WHERE rn = 1),
         |qa AS (SELECT id, cid, dist,
         |  CAST(floor(dist * 1000000) AS BIGINT) AS qd FROM a),
         |ag AS (SELECT cid, count(*) AS n, CAST(sum(qd) AS DOUBLE) AS s1,
         |  CAST(sum(qd*qd) AS DOUBLE) AS s2 FROM qa GROUP BY 1),
         |st AS (SELECT cid, round(s1/1000000.0/n, 6) AS mu,
         |  round(sqrt(greatest(0.0, s2/1000000000000.0/n
         |    - (s1/1000000.0/n)*(s1/1000000.0/n))), 6) AS sigma FROM ag)
         |SELECT a.id AS vec_id, a.cid, round(a.dist, 4) AS dist,
         |  round((a.dist - st.mu) / st.sigma, 4) AS z
         |FROM a JOIN st USING (cid)
         |WHERE round((a.dist - st.mu) / st.sigma, 4) > 1.5""".stripMargin,
    "embed_semdedup" ->
      s"""WITH pts AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(id AS INT) AS cid, v AS cv FROM pts WHERE id < $SemCells),
         |a AS (SELECT id, cid, v FROM (
         |  SELECT p.id, c.cid, p.v,
         |    row_number() OVER (PARTITION BY p.id ORDER BY
         |      (list_dot_product(p.v,p.v) - 2*list_dot_product(p.v,c.cv))
         |        + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM pts p CROSS JOIN cent c) WHERE rn = 1),
         |g AS (SELECT cid, v, min(id) AS rid, count(*) AS c FROM a GROUP BY cid, v),
         |f AS (SELECT DISTINCT b.cid, b.rid
         |  FROM g x JOIN g b ON x.cid = b.cid AND x.rid < b.rid
         |    AND round(list_dot_product(x.v,b.v) /
         |      (sqrt(list_dot_product(x.v,x.v)) * sqrt(list_dot_product(b.v,b.v))), 4)
         |      >= $SemTau)
         |SELECT g.cid, CAST(sum(g.c) AS BIGINT) AS n_vecs,
         |  CAST(count(*) - count(f.rid) AS BIGINT) AS n_kept,
         |  CAST(sum(g.c) - (count(*) - count(f.rid)) AS BIGINT) AS n_dropped
         |FROM g LEFT JOIN f ON g.cid = f.cid AND g.rid = f.rid
         |GROUP BY g.cid""".stripMargin,
    "embed_semdedup_apply" ->
      s"""WITH pts AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(id AS INT) AS cid, v AS cv FROM pts WHERE id < $SemCells),
         |a AS (SELECT id, cid, v FROM (
         |  SELECT p.id, c.cid, p.v,
         |    row_number() OVER (PARTITION BY p.id ORDER BY
         |      (list_dot_product(p.v,p.v) - 2*list_dot_product(p.v,c.cv))
         |        + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM pts p CROSS JOIN cent c) WHERE rn = 1),
         |g AS (SELECT cid, v, min(id) AS rid FROM a GROUP BY cid, v),
         |f AS (SELECT DISTINCT b.cid, b.rid
         |  FROM g x JOIN g b ON x.cid = b.cid AND x.rid < b.rid
         |    AND round(list_dot_product(x.v,b.v) /
         |      (sqrt(list_dot_product(x.v,x.v)) * sqrt(list_dot_product(b.v,b.v))), 4)
         |      >= $SemTau)
         |SELECT g.rid AS vec_id, g.cid FROM g
         |LEFT JOIN f ON g.cid = f.cid AND g.rid = f.rid
         |WHERE f.rid IS NULL""".stripMargin,
    "ann_pq" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cb AS (SELECT CAST(vec_id AS INT) AS code, v FROM emb WHERE vec_id < $NumCodes),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT e.vec_id, m.m, c.code,
         |      row_number() OVER (PARTITION BY e.vec_id, m.m
         |        ORDER BY $pqEncDistSql, c.code) AS rn
         |    FROM emb e CROSS JOIN range(0, $NumSub) m(m) CROSS JOIN cb c)
         |  WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM enc GROUP BY vec_id),
         |adc AS (
         |  SELECT q.vec_id AS qid, d.vec_id AS vid,
         |    $pqAdcTermsSql AS ad
         |  FROM emb q CROSS JOIN codes d
         |  ${pqCbJoinsSql()}
         |  WHERE q.vec_id < $NumQueries AND d.vec_id <> q.vec_id)
         |SELECT qid, rk, vid, round(ad, 4) AS ad FROM (
         |  SELECT qid, vid, ad,
         |    row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS rk
         |  FROM adc) WHERE rk <= 3""".stripMargin,
    // shared verbatim by ann_ivfpq_insert: insert into existing
    // cells/codebook ≡ rebuild from scratch (per-vector artifacts)
    "ann_ivfpq_insert" -> ivfPqRebuildSql,
    "ann_ivfpq" -> ivfPqRebuildSql
  ) ++ oraclesTail

  private lazy val ivfPqRebuildSql =
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM emb WHERE vec_id < $NumCells),
         |cb AS (SELECT CAST(vec_id AS INT) AS code, v FROM emb WHERE vec_id < $NumCodes),
         |cells AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY (list_dot_product(e.v,e.v) - 2*list_dot_product(e.v,c.cv))
         |      + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM emb e CROSS JOIN cent c) WHERE rn = 1),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT e.vec_id, m.m, c.code,
         |      row_number() OVER (PARTITION BY e.vec_id, m.m
         |        ORDER BY $pqEncDistSql, c.code) AS rn
         |    FROM emb e CROSS JOIN range(0, $NumSub) m(m) CROSS JOIN cb c)
         |  WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM enc GROUP BY vec_id),
         |probe AS (SELECT qid, v, cid AS cell FROM (
         |  SELECT q.vec_id AS qid, q.v, c.cid, row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY (list_dot_product(q.v,q.v) - 2*list_dot_product(q.v,c.cv))
         |      + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM emb q CROSS JOIN cent c WHERE q.vec_id < $NumQueries) WHERE rn <= 2),
         |adc AS (
         |  SELECT q.qid, s.vec_id AS vid,
         |    $pqAdcTermsSql AS ad
         |  FROM probe q
         |  JOIN cells s ON s.cell = q.cell AND s.vec_id <> q.qid
         |  JOIN codes d ON d.vec_id = s.vec_id
         |  ${pqCbJoinsSql()})
         |SELECT qid, rk, vid, round(ad, 4) AS ad FROM (
         |  SELECT qid, vid, ad,
         |    row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS rk
         |  FROM adc) WHERE rk <= 3""".stripMargin

  private lazy val oraclesTail: Map[String, String] = Map(
    "ann_pq_rerank" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cb AS (SELECT CAST(vec_id AS INT) AS code, v FROM emb WHERE vec_id < $NumCodes),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT e.vec_id, m.m, c.code,
         |      row_number() OVER (PARTITION BY e.vec_id, m.m
         |        ORDER BY $pqEncDistSql, c.code) AS rn
         |    FROM emb e CROSS JOIN range(0, $NumSub) m(m) CROSS JOIN cb c)
         |  WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM enc GROUP BY vec_id),
         |adc AS (
         |  SELECT q.vec_id AS qid, d.vec_id AS vid,
         |    $pqAdcTermsSql AS ad
         |  FROM emb q CROSS JOIN codes d
         |  ${pqCbJoinsSql()}
         |  WHERE q.vec_id < $NumQueries AND d.vec_id <> q.vec_id),
         |short AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS rk
         |  FROM adc) WHERE rk <= 10),
         |rer AS (
         |  SELECT s.qid, s.vid,
         |    (list_dot_product(q.v, c.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))) AS cos
         |  FROM short s
         |  JOIN emb q ON q.vec_id = s.qid
         |  JOIN emb c ON c.vec_id = s.vid)
         |SELECT qid, rk, vid, round(cos, 4) AS cos FROM (
         |  SELECT qid, vid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM rer) WHERE rk <= 3""".stripMargin,
    "ann_recall_sweep" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cb AS (SELECT CAST(vec_id AS INT) AS code, v FROM emb WHERE vec_id < $NumCodes),
         |cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM emb WHERE vec_id < $NumCells),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT e.vec_id, m.m, c.code,
         |      row_number() OVER (PARTITION BY e.vec_id, m.m
         |        ORDER BY $pqEncDistSql, c.code) AS rn
         |    FROM emb e CROSS JOIN range(0, $NumSub) m(m) CROSS JOIN cb c)
         |  WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM enc GROUP BY vec_id),
         |adc AS (
         |  SELECT q.vec_id AS qid, d.vec_id AS vid,
         |    $pqAdcTermsSql AS ad
         |  FROM emb q CROSS JOIN codes d
         |  ${pqCbJoinsSql()}
         |  WHERE q.vec_id < $NumQueries AND d.vec_id <> q.vec_id),
         |ranked AS (SELECT qid, vid,
         |  row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS srk FROM adc),
         |rer AS (
         |  SELECT s.qid, s.vid, s.srk,
         |    (list_dot_product(q.v, c.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))) AS cos
         |  FROM ranked s
         |  JOIN emb q ON q.vec_id = s.qid
         |  JOIN emb c ON c.vec_id = s.vid
         |  WHERE s.srk <= 32),
         |rer10 AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM rer WHERE srk <= 10) WHERE rk <= 3),
         |rer32 AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM rer) WHERE rk <= 3),
         |cells AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY (list_dot_product(e.v,e.v) - 2*list_dot_product(e.v,c.cv))
         |      + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM emb e CROSS JOIN cent c) WHERE rn = 1),
         |probe AS (SELECT qid, v, cid AS cell, rn FROM (
         |  SELECT q.vec_id AS qid, q.v, c.cid, row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY (list_dot_product(q.v,q.v) - 2*list_dot_product(q.v,c.cv))
         |      + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM emb q CROSS JOIN cent c WHERE q.vec_id < $NumQueries) WHERE rn <= 4),
         |adc2 AS (
         |  SELECT q.qid, s.vec_id AS vid,
         |    $pqAdcTermsSql AS ad
         |  FROM (SELECT qid, v, cell FROM probe WHERE rn <= 2) q
         |  JOIN cells s ON s.cell = q.cell AND s.vec_id <> q.qid
         |  JOIN codes d ON d.vec_id = s.vec_id
         |  ${pqCbJoinsSql()}),
         |top2 AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS rk
         |  FROM adc2) WHERE rk <= 3),
         |adc4 AS (
         |  SELECT q.qid, s.vec_id AS vid,
         |    $pqAdcTermsSql AS ad
         |  FROM (SELECT qid, v, cell FROM probe) q
         |  JOIN cells s ON s.cell = q.cell AND s.vec_id <> q.qid
         |  JOIN codes d ON d.vec_id = s.vec_id
         |  ${pqCbJoinsSql()}),
         |top4 AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS rk
         |  FROM adc4) WHERE rk <= 3),
         |excand AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vid, $cosSql AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < $NumQueries
         |    AND b.vec_id <> a.vec_id),
         |ex AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM excand) WHERE rk <= 3)
         |SELECT 'pq_rerank' AS family, 10 AS knob,
         |  round(count(ap.vid)/(3.0*$NumQueries), 4) AS recall
         |FROM ex LEFT JOIN rer10 ap ON ap.qid = ex.qid AND ap.vid = ex.vid
         |UNION ALL
         |SELECT 'pq_rerank', 32, round(count(ap.vid)/(3.0*$NumQueries), 4)
         |FROM ex LEFT JOIN rer32 ap ON ap.qid = ex.qid AND ap.vid = ex.vid
         |UNION ALL
         |SELECT 'ivfpq', 2, round(count(ap.vid)/(3.0*$NumQueries), 4)
         |FROM ex LEFT JOIN top2 ap ON ap.qid = ex.qid AND ap.vid = ex.vid
         |UNION ALL
         |SELECT 'ivfpq', 4, round(count(ap.vid)/(3.0*$NumQueries), 4)
         |FROM ex LEFT JOIN top4 ap ON ap.qid = ex.qid AND ap.vid = ex.vid""".stripMargin,
    "ann_ivfpq_residual" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM emb WHERE vec_id < $NumCells),
         |cells AS (SELECT vec_id, v, cid AS cell FROM (
         |  SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY (list_dot_product(e.v,e.v) - 2*list_dot_product(e.v,c.cv))
         |      + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM emb e CROSS JOIN cent c) WHERE rn = 1),
         |res AS (
         |  SELECT s.vec_id, s.cell,
         |    list_transform(range(1, 65), i -> s.v[i] - c.cv[i]) AS v
         |  FROM cells s JOIN cent c ON c.cid = s.cell),
         |rcb AS (SELECT CAST(vec_id AS INT) AS code, v FROM res WHERE vec_id < $NumCodes),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT e.vec_id, m.m, c.code,
         |      row_number() OVER (PARTITION BY e.vec_id, m.m
         |        ORDER BY $pqEncDistSql, c.code) AS rn
         |    FROM res e CROSS JOIN range(0, $NumSub) m(m) CROSS JOIN rcb c)
         |  WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM enc GROUP BY vec_id),
         |probe AS (SELECT qid, v, cid AS cell FROM (
         |  SELECT q.vec_id AS qid, q.v, c.cid, row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY (list_dot_product(q.v,q.v) - 2*list_dot_product(q.v,c.cv))
         |      + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM emb q CROSS JOIN cent c WHERE q.vec_id < $NumQueries) WHERE rn <= 2),
         |pres AS (
         |  SELECT p.qid, p.cell,
         |    list_transform(range(1, 65), i -> p.v[i] - c.cv[i]) AS v
         |  FROM probe p JOIN cent c ON c.cid = p.cell),
         |adc AS (
         |  SELECT q.qid, s.vec_id AS vid,
         |    $pqAdcTermsSql AS ad
         |  FROM pres q
         |  JOIN cells s ON s.cell = q.cell AND s.vec_id <> q.qid
         |  JOIN codes d ON d.vec_id = s.vec_id
         |  ${pqCbJoinsSql("rcb")})
         |SELECT qid, rk, vid, round(ad, 4) AS ad FROM (
         |  SELECT qid, vid, ad,
         |    row_number() OVER (PARTITION BY qid ORDER BY ad, vid) AS rk
         |  FROM adc) WHERE rk <= 3""".stripMargin,
    "ann_recall" ->
      s"""WITH planes(p, pv) AS (VALUES
         |  $planesSql),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |bkt AS (
         |  SELECT e.vec_id,
         |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.pv) >= 0
         |      THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM emb e CROSS JOIN planes pl GROUP BY e.vec_id),
         |lshcand AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vid,
         |    (list_dot_product(q.v, c.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))) AS cos
         |  FROM emb q
         |  JOIN bkt bq ON bq.vec_id = q.vec_id AND q.vec_id < $NumQueries
         |  JOIN bkt bc ON bc.bucket = bq.bucket
         |  JOIN emb c ON c.vec_id = bc.vec_id AND c.vec_id <> q.vec_id),
         |ap AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM lshcand) WHERE rk <= 3),
         |excand AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vid, $cosSql AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < $NumQueries
         |    AND b.vec_id <> a.vec_id),
         |ex AS (SELECT qid, vid FROM (
         |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM excand) WHERE rk <= 3)
         |SELECT ex.qid, round(count(ap.vid) / 3.0, 4) AS recall
         |FROM ex LEFT JOIN ap ON ap.qid = ex.qid AND ap.vid = ex.vid
         |GROUP BY ex.qid""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH planes(p, pv) AS (VALUES
         |  $planesSql),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |bkt AS (
         |  SELECT e.vec_id,
         |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.pv) >= 0
         |      THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM emb e CROSS JOIN planes pl GROUP BY e.vec_id),
         |cand AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vid,
         |    (list_dot_product(q.v, c.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))) AS cos
         |  FROM emb q
         |  JOIN bkt bq ON bq.vec_id = q.vec_id AND q.vec_id < $NumQueries
         |  JOIN bkt bc ON bc.bucket = bq.bucket
         |  JOIN emb c ON c.vec_id = bc.vec_id AND c.vec_id <> q.vec_id)
         |SELECT qid, rk, vid, round(cos, 4) AS cos FROM (
         |  SELECT qid, vid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM cand) WHERE rk <= 3""".stripMargin,
    // the multi-probe replay: same planes/buckets, flip ranking by
    // (abs dot asc, plane asc) on the identical doubles, base ∪ two
    // xor-flip probes per query
    "ann_lsh_multiprobe" ->
      s"""WITH planes(p, pv) AS (VALUES
         |  $planesSql),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |bkt AS (
         |  SELECT e.vec_id,
         |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.pv) >= 0
         |      THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM emb e CROSS JOIN planes pl GROUP BY e.vec_id),
         |qd AS (
         |  SELECT e.vec_id, pl.p, abs(list_dot_product(e.v, pl.pv)) AS ad
         |  FROM emb e CROSS JOIN planes pl WHERE e.vec_id < $NumQueries),
         |flips AS (SELECT vec_id, p FROM (
         |  SELECT vec_id, p,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY ad, p) AS rn
         |  FROM qd) WHERE rn <= 2),
         |probes AS (
         |  SELECT vec_id, bucket AS pbucket FROM bkt
         |  WHERE vec_id < $NumQueries
         |  UNION ALL
         |  SELECT f.vec_id, xor(b.bucket, CAST(1::BIGINT << f.p AS BIGINT))
         |  FROM flips f JOIN bkt b ON b.vec_id = f.vec_id),
         |cand AS (
         |  SELECT pr.vec_id AS qid, c.vec_id AS vid,
         |    (list_dot_product(q.v, c.v) /
         |      (sqrt(list_dot_product(q.v, q.v))
         |        * sqrt(list_dot_product(c.v, c.v)))) AS cos
         |  FROM probes pr
         |  JOIN emb q ON q.vec_id = pr.vec_id
         |  JOIN bkt bc ON bc.bucket = pr.pbucket
         |  JOIN emb c ON c.vec_id = bc.vec_id AND c.vec_id <> pr.vec_id)
         |SELECT qid, rk, vid, round(cos, 4) AS cos FROM (
         |  SELECT qid, vid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM cand) WHERE rk <= 3""".stripMargin,
    "ann_topk" ->
      s"""WITH c AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vid, $cosSql AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < $NumQueries
         |    AND b.vec_id <> a.vec_id),
         |r AS (SELECT qid, vid, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM c)
         |SELECT qid, rk, vid, round(cos, 4) AS cos FROM r WHERE rk <= 5""".stripMargin,
    "embed_neardup" ->
      s"""WITH p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cosSql, 4) AS cos
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.35""".stripMargin,
    // ann_ivf_insert shares ann_ivf's REBUILD oracle verbatim: the
    // gate is exactly "insert into existing cells ≡ rebuild from
    // scratch" (Voronoi assignment is per-vector)
    "ann_ivf_insert" -> ivfRebuildSql,
    "ann_ivf" -> ivfRebuildSql
  )

  private lazy val ivfRebuildSql =
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM emb WHERE vec_id < $NumCells),
         |cells AS (SELECT vec_id, v, cid AS cell FROM (
         |  SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY (list_dot_product(e.v,e.v) - 2*list_dot_product(e.v,c.cv))
         |      + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM emb e CROSS JOIN cent c) WHERE rn = 1),
         |probe AS (SELECT qid, qv, cid AS cell FROM (
         |  SELECT q.vec_id AS qid, q.v AS qv, c.cid, row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY (list_dot_product(q.v,q.v) - 2*list_dot_product(q.v,c.cv))
         |      + list_dot_product(c.cv,c.cv), c.cid) AS rn
         |  FROM emb q CROSS JOIN cent c WHERE q.vec_id < $NumQueries) WHERE rn <= 2),
         |cand AS (SELECT p.qid, s.vec_id AS vid,
         |    (list_dot_product(p.qv, s.v) /
         |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.v, s.v)))) AS cos
         |  FROM probe p JOIN cells s ON s.cell = p.cell AND s.vec_id <> p.qid)
         |SELECT qid, rk, vid, round(cos, 4) AS cos FROM (
         |  SELECT qid, vid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |  FROM cand) WHERE rk <= 3""".stripMargin
}
