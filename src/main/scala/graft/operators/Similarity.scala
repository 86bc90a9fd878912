package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosineSim

/** Embedding similarity search (SURVEY.md §2).
  *
  * Exact paths are *blocked* (broadcast query set / label blocks) so the
  * candidate count, not the corpus size, drives cost. The LSH path is
  * the 100 TB shape: random-hyperplane bucketing turns top-k into a
  * bucket-local problem — linear scan + small per-bucket brute force.
  */
object Similarity {

  /** Dominant-direction audit via power iteration (round 11) — the
    * embedding-anisotropy readout: the top principal direction of the
    * uncentered second-moment matrix and its explained-energy share.
    * A healthy embedding space spreads energy across dimensions; a
    * dominant common direction (share ≫ 1/dims) is the anisotropy
    * pathology all-but-the-top post-processing removes (Mu &
    * Viswanath 2018) and a cheap upstream red flag for collapsed
    * encoders.
    *
    * `iters` von-Mises power iterations, fully DECLARATIVE — no
    * collect anywhere: each iteration is one corpus scan (per-row dot
    * s = x·v via zip_with against the 1-row broadcast direction, then
    * a posexplode to a dims-group map-side-combined agg for
    * u = Σ s·x), and the normalize step is dims-row column math. The
    * Gram matrix is never materialized (G·v = Xᵀ(Xv) — two narrow
    * passes fused into one scan), which is what makes this the
    * 100 TB plan: nothing wider than `dims` rows ever shuffles.
    *
    * Exactness (§4): x quantized to integer 1e-6 units; per-row dots
    * are exact BIGINTs, cross-row u/norm/trace sums accumulate in
    * DECIMAL(38) (HUGEINT oracle-side); each normalize re-quantizes
    * via floor((du·1e6)/sqrt(n2)) on identical doubles, so every
    * iteration's direction is the SAME integer vector in both
    * engines and the trajectory replays as chained CTEs. λ and the
    * share are exact-integer ratios evaluated in one fixed double
    * expression. v0 = uniform 1/8 (exactly dyadic for dims=64).
    * Output: (dim, v, lambda, share) — `dims` rows. */
  def dominantDirection(emb: DataFrame, dims: Int = 64,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"need at least one power iteration, got $iters")
    // exactly-representable uniform start for power-of-two dims;
    // any fixed integer vector works for others
    val seed = math.floor(1000000.0 / math.sqrt(dims.toDouble)).toLong
    var v = normalizeDir(rawU(emb.withColumn("vq",
      typedlit(Seq.fill(dims)(seed)))))
    for (_ <- 2 to iters) v =
      normalizeDir(rawU(emb.crossJoin(broadcast(vArr(v)))))
    // Rayleigh quotient under the FINAL direction + energy share
    val s4 = rayleigh(emb, v)
    val nqv = v.agg(sum(col("qv").cast("decimal(38,0)") * col("qv")).as("nv"))
    v.crossJoin(broadcast(s4)).crossJoin(broadcast(nqv))
      .crossJoin(broadcast(trace(emb)))
      .select(col("dim"),
        round(col("qv").cast("double") / lit(1000000.0), 6).as("v"),
        round(col("sn").cast("double")
          / (col("nv").cast("double") * lit(1000000000000.0) * col("n")), 6)
          .as("lambda"),
        round(col("sn").cast("double")
          / (col("nv").cast("double") * col("t").cast("double")), 6).as("share"))
  }

  private def q6(x: Column): Column =
    floor(x.cast("double") * lit(1000000.0)).cast("long")

  /** One un-normalized power iterate: the quantized G·v integers
    * (dim, du), computed as Xᵀ(Xv) in a single scan. */
  private def rawU(withV: DataFrame): DataFrame = {
    val dot = aggregate(
      zip_with(col("embedding"), col("vq"), (x, qv) => q6(x) * qv),
      lit(0L), (a, t) => a + t)
    withV.select(col("embedding"), dot.as("s"))
      .select(posexplode(col("embedding")).as(Seq("pos", "x")), col("s"))
      .select((col("pos") + 1).cast("long").as("dim"),
        // q·s alone can pass Long.Max (q ≤ 6e6 × s ≤ 4e14), so split
        // the wide factor (round 18, rawUc's discipline): q·sHi and
        // q·sLo are exact Long products (≤ 2⁴⁸ each), decimal only in
        // the agg buffer, reconstruction exact — hash-neutral
        (q6(col("x")) * expr("s div 16777216")).as("suHi"),
        (q6(col("x")) * (col("s")
          - expr("s div 16777216") * lit(16777216L))).as("suLo"))
      .groupBy("dim").agg(
        sum(col("suHi").cast("decimal(38,0)")).as("uHi"),
        sum(col("suLo").cast("decimal(38,0)")).as("uLo"))
      // dims-row table: single-task reduce (§3 rule 14 — map-side
      // partials stay corpus-parallel; every downstream stage of the
      // direction pipeline is dims-sized)
      .coalesce(1)
      .select(col("dim"),
        expr("CAST((uHi * 16777216 + uLo) div 1000000000000 AS BIGINT)")
          .as("du"))
  }

  /** Floor-requantize (dim, du) to the 1e6 unit sphere. */
  private def normalizeDir(du: DataFrame): DataFrame = {
    val n2 = du.agg(sum(col("du").cast("decimal(38,0)") * col("du")).as("n2"))
    du.crossJoin(broadcast(n2))
      .select(col("dim"),
        floor((col("du") * lit(1000000L)).cast("double")
          / sqrt(col("n2").cast("double"))).cast("long").as("qv"))
  }

  /** (dim, qv) table → 1-row array in dim order (array_sort over
    * structs — collect_list order is shuffle-dependent, §4). */
  private def vArr(v: DataFrame): DataFrame =
    v.agg(transform(array_sort(collect_list(struct(col("dim"), col("qv")))),
      t => t.getField("qv")).as("vq"))

  /** 1-row (sn = Σ(x·v)² in q-units, n) under direction `v`. */
  private def rayleigh(emb: DataFrame, v: DataFrame): DataFrame =
    emb.crossJoin(broadcast(vArr(v)))
      .select(aggregate(
        zip_with(col("embedding"), col("vq"), (x, qv) => q6(x) * qv),
        lit(0L), (a, t) => a + t).as("s"))
      .agg(sum(col("s").cast("decimal(38,0)") * col("s")).as("sn"),
        count(lit(1)).as("n"))

  /** 1-row total second moment Σ q² (q-units). */
  private def trace(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(q6(col("x")).as("q"))
      .agg(sum(col("q").cast("decimal(38,0)") * col("q")).as("t"))

  /** Top-2 spectrum audit (round 11) — `dominantDirection` extended
    * by one DEFLATED power iteration: after v1 converges, a second
    * direction iterates under the orthogonal-complement operator
    * (each iterate G·w is projected off v1 in EXACT integers:
    * du′ = du − (qv1·p) div q with p = qv1ᵀdu, q = qv1ᵀqv1 — the
    * truncating division is identical in both engines, so the whole
    * two-direction trajectory still replays as chained CTEs). Output
    * per dim: both directions, both energy shares, and the measured
    * |cos(v1, v2)| as a self-audit (≈0 by construction — a large
    * value means the deflation failed). share1+share2 vs 2/64 is the
    * two-direction anisotropy readout: how much of the space's energy
    * lives in a plane. Same scan/shuffle shape as dominantDirection —
    * 2×iters+2 corpus scans, nothing wider than 64 rows ever
    * shuffles, no driver state. On a NEAR-DEGENERATE spectrum
    * (λ1 ≈ λ2, e.g. isotropic noise) the share ORDERING between the
    * two reported directions is not meaningful — `iters` rounds
    * cannot separate nearly-equal eigenvalues (power-iteration
    * convergence ∝ (λ2/λ1)^iters); the orthogonality audit and the
    * plane share share1+share2 remain valid regardless. */
  def spectrum(emb0: DataFrame, dims: Int = 64, iters: Int = 3): DataFrame =
   SessionScope.withAqeOffQuarterNp(emb0.sparkSession) { scoped =>
    // quarter-np AQE-off clone (the graph loops' task-floor lever,
    // round 17): 8+ dims-sized shuffles at np=32 were pure task floor
    val emb = org.apache.spark.sql.graftbridge.SessionBridge
      .rebind(emb0, scoped)
    require(iters >= 1, s"need at least one power iteration, got $iters")
    // quantize ONCE (embed_whiten's round-17 discipline): the 8+
    // downstream scans read materialized longs instead of re-decoding
    // the float arrays and re-flooring per scan — values untouched
    val qe = emb.select(transform(col("embedding"), x => q6(x)).as("cq"))
      .localCheckpoint(true)
    // wide-factor split as in whiten's rawUc (round 18): q·sHi and
    // q·sLo are exact Long products, decimal only in the agg buffer,
    // u reconstructs exactly — hash-neutral, no per-element decimal
    // multiply in the six power scans
    def rawUq(withV: DataFrame): DataFrame = {
      val dot = aggregate(
        zip_with(col("cq"), col("vq"), (q, qv) => q * qv),
        lit(0L), (a, t) => a + t)
      withV.select(col("cq"), dot.as("s"))
        .select(posexplode(col("cq")).as(Seq("pos", "q")), col("s"))
        .select((col("pos") + 1).cast("long").as("dim"),
          (col("q") * expr("s div 16777216")).as("suHi"),
          (col("q") * (col("s")
            - expr("s div 16777216") * lit(16777216L))).as("suLo"))
        .groupBy("dim").agg(
          sum(col("suHi").cast("decimal(38,0)")).as("uHi"),
          sum(col("suLo").cast("decimal(38,0)")).as("uLo"))
        .coalesce(1)
        .select(col("dim"),
          expr("CAST((uHi * 16777216 + uLo) div 1000000000000 AS BIGINT)")
            .as("du"))
    }
    val seed = math.floor(1000000.0 / math.sqrt(dims.toDouble)).toLong
    var v1 = normalizeDir(rawUq(qe.withColumn("vq",
      typedlit(Seq.fill(dims)(seed)))))
    for (_ <- 2 to iters) v1 =
      normalizeDir(rawUq(qe.crossJoin(broadcast(vArr(v1)))))
    val v1t = v1.withColumnRenamed("qv", "qv1").localCheckpoint(true)
    def deflate(du: DataFrame): DataFrame = {
      val j = du.join(broadcast(v1t), "dim")
      val pq = j.agg(
        sum(col("qv1").cast("decimal(38,0)") * col("du")).as("p"),
        sum(col("qv1").cast("decimal(38,0)") * col("qv1")).as("q"))
      j.crossJoin(broadcast(pq))
        .select(col("dim"),
          (col("du") - expr(
            "CAST((CAST(qv1 AS DECIMAL(38,0)) * p) div q AS BIGINT)"))
            .as("du"))
    }
    // alternating-sign start: fixed, not parallel to the uniform seed
    val w0 = Seq.tabulate(dims)(i => if (i % 2 == 0) seed else -seed)
    var v2 = normalizeDir(deflate(rawUq(
      qe.withColumn("vq", typedlit(w0)))))
    for (_ <- 2 to iters) v2 =
      normalizeDir(deflate(rawUq(qe.crossJoin(broadcast(vArr(v2))))))
    val v2t = v2.withColumnRenamed("qv", "qv2")
    // FUSED readout: both Rayleigh quotients + the trace in ONE scan
    // (embed_whiten's round-17 fusion — per-row dots exact Long,
    // cross-row sums DECIMAL(38,0), value-identical to the three
    // separate scans)
    val reads = qe
      .crossJoin(broadcast(vArr(v1t.withColumnRenamed("qv1", "qv"))
        .select(col("vq").as("vq1"))))
      .crossJoin(broadcast(vArr(v2t.withColumnRenamed("qv2", "qv"))
        .select(col("vq").as("vq2"))))
      .select(
        aggregate(zip_with(col("cq"), col("vq1"), (q, qv) => q * qv),
          lit(0L), (a, t) => a + t).as("s1r"),
        aggregate(zip_with(col("cq"), col("vq2"), (q, qv) => q * qv),
          lit(0L), (a, t) => a + t).as("s2r"),
        aggregate(col("cq"), lit(0L), (a, q) => a + q * q).as("qq"))
      .agg(sum(col("s1r").cast("decimal(38,0)") * col("s1r")).as("sn1"),
        sum(col("s2r").cast("decimal(38,0)") * col("s2r")).as("sn2"),
        sum(col("qq").cast("decimal(38,0)")).as("t"))
      .localCheckpoint(true) // 1 row
    val s1 = reads.select("sn1")
    val s2 = reads.select("sn2")
    val joined = v1t.join(v2t, "dim").localCheckpoint(true)
    val norms = joined.agg(
      sum(col("qv1").cast("decimal(38,0)") * col("qv1")).as("nv1"),
      sum(col("qv2").cast("decimal(38,0)") * col("qv2")).as("nv2"),
      sum(col("qv1").cast("decimal(38,0)") * col("qv2")).as("dot12"))
    joined.crossJoin(broadcast(s1)).crossJoin(broadcast(s2))
      .crossJoin(broadcast(norms)).crossJoin(broadcast(reads.select("t")))
      .select(col("dim"),
        round(col("qv1").cast("double") / lit(1000000.0), 6).as("v1"),
        round(col("qv2").cast("double") / lit(1000000.0), 6).as("v2"),
        round(col("sn1").cast("double")
          / (col("nv1").cast("double") * col("t").cast("double")), 6)
          .as("share1"),
        round(col("sn2").cast("double")
          / (col("nv2").cast("double") * col("t").cast("double")), 6)
          .as("share2"),
        round(abs(col("dot12").cast("double"))
          / (sqrt(col("nv1").cast("double"))
            * sqrt(col("nv2").cast("double"))), 6).as("abs_cos12"))
   }

  /** All-but-the-top whitening audit (Mu & Viswanath, ICLR 2018) —
    * the REPAIR step for the anisotropy `dominantDirection` detects:
    * center the corpus (remove the common mean) and project off the
    * top principal direction of the CENTERED second moment; report
    * what the surgery achieves. Output per dim: the removed mean μ,
    * the removed direction v1, the residual's new top direction v2,
    * their centered-energy shares, the |cos(v1,v2)| deflation audit,
    * and `iso_gain` = share1/share2 — how much flatter the spectrum
    * got (≈1 means the space was already isotropic and the surgery
    * buys nothing; ≫1 means a common direction was eating the space).
    *
    * Exactness: coordinates quantize to 1e-6 integers ONCE; the
    * per-dim mean is a truncating integer division (identical `div`),
    * so the CENTERED vectors are exact integers and both power chains
    * (v1, then the v1-deflated v2 — spectrum's exact-integer
    * projection) replay as chained CTEs; shares and iso_gain are
    * single fixed double expressions over exact HUGEINT sums.
    * Scale: centering is a PROJECTION (zip_with against the 1-row
    * broadcast mean), never a materialized copy of the corpus; each
    * iteration is one corpus scan; nothing wider than `dims` rows
    * shuffles. */
  def whiten(emb0: DataFrame, dims: Int = 64, iters: Int = 3): DataFrame =
   SessionScope.withAqeOffQuarterNp(emb0.sparkSession) { scoped =>
    // quarter-np AQE-off clone (the graph loops' task-floor lever,
    // round 17): the 9 dims-sized shuffles at np=32 were task floor
    val emb = org.apache.spark.sql.graftbridge.SessionBridge
      .rebind(emb0, scoped)
    require(iters >= 1, s"need at least one power iteration, got $iters")
    val qemb = emb.select(transform(col("embedding"), x => q6(x)).as("qe"))
    val mu = qemb.select(posexplode(col("qe")).as(Seq("pos", "q")))
      .groupBy((col("pos") + 1).cast("long").as("dim"))
      .agg(expr("CAST(sum(CAST(q AS DECIMAL(38,0))) div count(1) AS BIGINT)")
        .as("mq"))
      .coalesce(1).localCheckpoint(true) // dims rows
    val muArr = mu.agg(transform(
      array_sort(collect_list(struct(col("dim"), col("mq")))),
      t => t.getField("mq")).as("mv"))
    // materialize the centered integer corpus ONCE: every downstream
    // power/readout pass (8+) scans these longs instead of re-running
    // quantize + center per scan — measured 14.5 → single-digit s at
    // sf0.1, values untouched
    val cent = qemb.crossJoin(broadcast(muArr))
      .select(zip_with(col("qe"), col("mv"), (q, m) => q - m).as("cq"))
      .localCheckpoint(true)
    // one un-normalized centered power iterate: (dim, du) = Cᵀ(Cv).
    // The per-element product c·s needs ~2⁶⁹ bits (|c| ≤ 2²¹,
    // |s| < 2⁴⁸), but a DECIMAL multiply per element dominated the
    // six power scans (§7 round-18 candidate) — so SPLIT the wide
    // factor: s = sHi·2²⁴ + sLo with |sLo| < 2²⁴, making both terms
    // c·sHi and c·sLo exact LONG products (≤ 2⁴⁵ each — plain codegen
    // multiplies); only the agg buffer is decimal (term-wise long →
    // decimal at the sum input, exact), and u = 2²⁴·ΣHi + ΣLo
    // reconstructs Σc·s exactly — value-identical, hash-neutral.
    def rawUc(withV: DataFrame): DataFrame = {
      val dot = aggregate(
        zip_with(col("cq"), col("vq"), (c, v) => c * v),
        lit(0L), (a, t) => a + t)
      withV.select(col("cq"), dot.as("s"))
        .select(posexplode(col("cq")).as(Seq("pos", "c")), col("s"))
        .select((col("pos") + 1).cast("long").as("dim"),
          (col("c") * expr("s div 16777216")).as("suHi"),
          (col("c") * (col("s")
            - expr("s div 16777216") * lit(16777216L))).as("suLo"))
        .groupBy("dim").agg(
          sum(col("suHi").cast("decimal(38,0)")).as("uHi"),
          sum(col("suLo").cast("decimal(38,0)")).as("uLo"))
        .coalesce(1)
        .select(col("dim"),
          expr("CAST((uHi * 16777216 + uLo) div 1000000000000 AS BIGINT)")
            .as("du"))
    }
    val seed = math.floor(1000000.0 / math.sqrt(dims.toDouble)).toLong
    var v1 = normalizeDir(rawUc(cent.withColumn("vq",
      typedlit(Seq.fill(dims)(seed)))))
    for (_ <- 2 to iters) v1 =
      normalizeDir(rawUc(cent.crossJoin(broadcast(vArr(v1)))))
    val v1t = v1.withColumnRenamed("qv", "qv1").localCheckpoint(true)
    def deflate(du: DataFrame): DataFrame = {
      val j = du.join(broadcast(v1t), "dim")
      val pq = j.agg(
        sum(col("qv1").cast("decimal(38,0)") * col("du")).as("p"),
        sum(col("qv1").cast("decimal(38,0)") * col("qv1")).as("q"))
      j.crossJoin(broadcast(pq))
        .select(col("dim"),
          (col("du") - expr(
            "CAST((CAST(qv1 AS DECIMAL(38,0)) * p) div q AS BIGINT)"))
            .as("du"))
    }
    val w0 = Seq.tabulate(dims)(i => if (i % 2 == 0) seed else -seed)
    var v2 = normalizeDir(deflate(rawUc(cent.withColumn("vq",
      typedlit(w0)))))
    for (_ <- 2 to iters) v2 =
      normalizeDir(deflate(rawUc(cent.crossJoin(broadcast(vArr(v2))))))
    val v2t = v2.withColumnRenamed("qv", "qv2")
    // FUSED readout: both Rayleigh quotients and the centered trace in
    // ONE corpus scan (they were three) — per-row dots stay exact Long
    // (|c| ≤ 2²¹ × |qv| ≤ 2²⁰ × 64 dims < 2⁴⁸; c² likewise), the
    // cross-row sums stay DECIMAL(38,0): value-identical to the three
    // separate scans, integer addition being associative
    val reads = cent
      .crossJoin(broadcast(vArr(v1t.withColumnRenamed("qv1", "qv"))
        .select(col("vq").as("vq1"))))
      .crossJoin(broadcast(vArr(v2t.withColumnRenamed("qv2", "qv"))
        .select(col("vq").as("vq2"))))
      .select(
        aggregate(zip_with(col("cq"), col("vq1"), (c, qv) => c * qv),
          lit(0L), (a, t) => a + t).as("s1r"),
        aggregate(zip_with(col("cq"), col("vq2"), (c, qv) => c * qv),
          lit(0L), (a, t) => a + t).as("s2r"),
        aggregate(col("cq"), lit(0L), (a, c) => a + c * c).as("cc"))
      .agg(sum(col("s1r").cast("decimal(38,0)") * col("s1r")).as("sn1"),
        sum(col("s2r").cast("decimal(38,0)") * col("s2r")).as("sn2"),
        sum(col("cc").cast("decimal(38,0)")).as("t"))
      .localCheckpoint(true) // 1 row
    val s1 = reads.select("sn1")
    val s2 = reads.select("sn2")
    val tc = reads.select("t")
    val joined = mu.join(v1t, "dim").join(v2t, "dim").localCheckpoint(true)
    val norms = joined.agg(
      sum(col("qv1").cast("decimal(38,0)") * col("qv1")).as("nv1"),
      sum(col("qv2").cast("decimal(38,0)") * col("qv2")).as("nv2"),
      sum(col("qv1").cast("decimal(38,0)") * col("qv2")).as("dot12"))
    joined.crossJoin(broadcast(s1)).crossJoin(broadcast(s2))
      .crossJoin(broadcast(norms)).crossJoin(broadcast(tc))
      .select(col("dim"),
        round(col("mq").cast("double") / lit(1000000.0), 6).as("mu"),
        round(col("qv1").cast("double") / lit(1000000.0), 6).as("v1"),
        round(col("qv2").cast("double") / lit(1000000.0), 6).as("v2"),
        round(col("sn1").cast("double")
          / (col("nv1").cast("double") * col("t").cast("double")), 6)
          .as("share1"),
        round(col("sn2").cast("double")
          / (col("nv2").cast("double") * col("t").cast("double")), 6)
          .as("share2"),
        round(abs(col("dot12").cast("double"))
          / (sqrt(col("nv1").cast("double"))
            * sqrt(col("nv2").cast("double"))), 6).as("abs_cos12"),
        when(col("sn2") === 0, lit(null).cast("double"))
          .otherwise(round((col("sn1").cast("double")
              * col("nv2").cast("double"))
            / (col("sn2").cast("double") * col("nv1").cast("double")), 4))
          .as("iso_gain"))
   }

  /** Mean-vector drift between two halves of an embedding corpus: per
    * group, the cosine between the mean vectors of the `half` = 0 and
    * `half` = 1 rows — the vector twin of the scalar PSI monitor (a
    * shifted embedding space reads cos < 1 before any downstream model
    * notices). Expects (groupCol, half, embedding); one posexplode →
    * map-side-combined hash agg down to groups×2×dim partials → a
    * group-keyed join over those partials. No whole vector crosses the
    * wire after the explode.
    *
    * Determinism (round 10, §4): components quantize to integer 1e-6
    * units before the per-dim mean sums, and the mean itself
    * quantizes to 1e-9 before the cross-dim cosine sums — every
    * cross-row accumulation is an exact DECIMAL integer sum, never a
    * float sum over an unordered group (avg(double) was the
    * association-boundary class the r9 ADVICE flagged); the identical
    * 1e18 scale in numerator and denominator cancels in the ratio. */
  def meanVectorDrift(emb: DataFrame, groupCol: String): DataFrame = {
    val e = emb.select(col(groupCol), col("half"),
      posexplode(col("embedding")).as(Seq("i", "v")))
    val mv = sum(floor(col("v").cast("double") * 1000000).cast("long")
        .cast("decimal(38,0)")).cast("double") / lit(1000000.0) / count(lit(1))
    val m = e.groupBy(groupCol, "half", "i")
      .agg(floor(mv * lit(1000000000.0)).cast("long").as("mq"))
    val r = m.filter(col("half") === 0)
      .select(col(groupCol), col("i"), col("mq").as("p"))
    val c = m.filter(col("half") === 1)
      .select(col(groupCol), col("i"), col("mq").as("q"))
    def dd(a: Column, b: Column) =
      sum((a.cast("decimal(38,0)") * b.cast("decimal(38,0)"))).cast("double")
    r.join(c, Seq(groupCol, "i"))
      .groupBy(groupCol)
      .agg(round(dd(col("p"), col("q")) /
        (sqrt(dd(col("p"), col("p"))) * sqrt(dd(col("q"), col("q")))), 6)
        .as("cos_ref_cur"),
        count(lit(1)).as("n_dims"))
  }

  /** Exact cosine top-k: broadcast the (small) query set against the
    * corpus, then the bounded-heap TopKStructs aggregate per query —
    * only k candidates per query per partition reach the shuffle (a
    * ranking window would sort-shuffle all nQueries×corpus rows). */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import graft.functions.TopKAggregate.topk
    val cand = corpus.as("c")
      .join(broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("vid"),
        cosineSim(col("q.embedding"), col("c.embedding")).as("cos"))
    cand.groupBy("qid")
      .agg(topk(struct((-col("cos")).as("negcos"), col("vid").as("v")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
        col("t.v").as("vid"), round(-col("t.negcos"), 4).as("cos"))
  }

  /** 16-byte content hash of a float-array column (Float.toString
    * round-trips exactly, so equal hashes ⟺ equal vectors modulo md5
    * collision) — the vector twin of `Dedup.withTextHash`. Collapse /
    * expand joins key on this instead of the raw 64-float array:
    * the shuffled join keys are ~16× smaller and hash-comparable. */
  def vecHash(vec: Column): Column = md5(vec.cast("string").cast("binary"))

  /** Exact near-duplicate pairs within blocks (co-partitioned self-join
    * on the block key; never all-pairs). Identical (block, vector) rows
    * are collapsed to one representative before the join — replicated
    * vectors would otherwise pay c² join rows per identical group —
    * and member pairs are expanded afterwards (identical vectors have
    * cosine exactly 1 at the rounded precision; cross pairs inherit the
    * representative cosine, which is bit-equal for equal inputs).
    * All collapse/expand joins key on `vecHash`, never the raw array;
    * the member side ships (vec_id, blk, vh) only — no embeddings. */
  def nearDupPairs(corpus: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val base = corpus.select(col("vec_id"), col(blockCol).as("blk"), col("embedding"))
      .withColumn("vh", vecHash(col("embedding")))
    val reps = base.dropDuplicates("blk", "vh")
    val members = base.select("vec_id", "blk", "vh")
    val within = members.as("x")
      .join(members.as("y"),
        col("x.blk") === col("y.blk")
          && col("x.vh") === col("y.vh")
          && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        lit(1.0).as("cos"))
    // canonical pair order via the hash (distinct per rep within a
    // block): each unordered rep pair appears exactly once, and the
    // output ids are re-canonicalized with least/greatest below
    val repPairs = reps.as("a")
      .join(reps.as("b"),
        col("a.blk") === col("b.blk") && col("a.vh") < col("b.vh"))
      .select(col("a.blk").as("pblk"), col("a.vh").as("ha"), col("b.vh").as("hb"),
        round(cosineSim(col("a.embedding"), col("b.embedding")), 4).as("cos"))
      .filter(col("cos") >= threshold)
    val across = repPairs
      .join(members.as("ma"), col("pblk") === col("ma.blk")
        && col("ha") === col("ma.vh"))
      .join(members.as("mb"), col("pblk") === col("mb.blk")
        && col("hb") === col("mb.vh"))
      .select(least(col("ma.vec_id"), col("mb.vec_id")).as("id_a"),
        greatest(col("ma.vec_id"), col("mb.vec_id")).as("id_b"), col("cos"))
    within.unionByName(across)
  }

  /** Deterministic hyperplanes baked in as plan literals (seeded LCG on
    * the driver) — no per-row hashing, no shared RNG state. Exposed to
    * the query pack so the oracle SQL can inline the exact same doubles
    * (Double.toString round-trips bit-exactly through DuckDB's parser). */
  private[graft] def planes(numPlanes: Int, dim: Int): Seq[Array[Double]] = {
    var s = 0x51AFE7B70C0FFEEL
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 2000L).toDouble / 1000.0 - 1.0
    }
    Seq.fill(numPlanes)(Array.fill(dim)(next()))
  }

  /** Sign-of-projection LSH bucket id over `numPlanes` hyperplanes. */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int = 64): Column =
    planes(numPlanes, dim).zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.toIndexedSeq.map(lit): _*)
      val dot = aggregate(
        zip_with(vec, planeCol, (v, r) => v.cast("double") * r),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style ANN — the other scale path for similarity search: the
    * corpus is partitioned once into coarse Voronoi cells (native
    * argmin expression over broadcast centroids — a scan, no shuffle),
    * each query probes only its `nprobe` nearest cells, and brute force
    * runs inside probed cells only. Cost per query is corpus/nCells ×
    * nprobe instead of the full corpus; recall grows with nprobe.
    * Production fits the coarse centroids with `KMeansND.fit`; they are
    * a parameter so the cell layout is deterministic for the oracle.
    * Distances use the |a|²−2a·b+|b|² sequential-double identity that
    * DuckDB's list_dot_product reproduces exactly. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], k: Int, nprobe: Int = 2): DataFrame =
    ivfTopKIndexed(ivfIndex(corpus, centroids), queries, centroids, k,
      nprobe)

  /** The IVF INDEX ROW layout: (corpus columns, cell) — the argmin
    * cell assignment materialized, i.e. what a production deployment
    * PERSISTS (train centroids offline, assign once at ingest, store;
    * probes then read only the probed cells' rows). One scan with
    * broadcast-literal centroids, no shuffle. */
  def ivfIndex(corpus: DataFrame,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    import graft.operators.KMeansND
    corpus.withColumn("cell",
      KMeansND.nearest(col("embedding"), centroids).getField("cid"))
  }

  /** Incremental IVF index maintenance (round 18 — the r15 verdict's
    * missing #3): assign a NEW-VECTOR batch to a persisted index's
    * EXISTING cells, no rebuild — the daily-update face of the
    * similarity family (louvainIncrSeeded's nightly-fit/daily-update
    * contract applied to ANN). Because cell assignment is per-vector
    * Voronoi argmin over the FIXED centroid set, insert-then-probe is
    * ROW-IDENTICAL to rebuild-then-probe at the same centroids
    * (spec-proven, and the `ann_ivf_insert` gate hashes the insert
    * path against the full-rebuild oracle); recall drifts only as the
    * data distribution leaves the trained centroids behind, which is
    * when the scheduled offline refit runs. Cost: one scan of the
    * BATCH (broadcast-literal centroids), never of the index. */
  def ivfInsert(index: DataFrame, batch: DataFrame,
      centroids: Seq[(Int, Array[Double])]): DataFrame =
    index.unionByName(ivfIndex(batch, centroids))

  /** [[ivfTopK]] over a PREBUILT index table ((vec_id, embedding,
    * cell) — from [[ivfIndex]]/[[ivfInsert]] or a parquet round trip
    * of either): the probe pays only the candidate join, the
    * assignment scan is the index's sunk cost. */
  def ivfTopKIndexed(cells: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], k: Int, nprobe: Int = 2): DataFrame =
    ivfTopKProbed(cells, probeCells(queries, centroids, nprobe), k)

  /** [[ivfTopKIndexed]] over an ALREADY-RANKED probe table (qid,
    * qemb, pcell) — so a caller that needs the probed cell set for
    * file pruning evaluates [[probeCells]] once, not twice. */
  private[graft] def ivfTopKProbed(cells: DataFrame, probed: DataFrame,
      k: Int): DataFrame = {
    import graft.functions.TopKAggregate.topk
    val cand = cells.as("c")
      .join(broadcast(probed.as("q")),
        col("q.pcell") === col("c.cell") && col("q.qid") =!= col("c.vec_id"))
      .select(col("q.qid").as("qid"), col("c.vec_id").as("vid"),
        cosineSim(col("q.qemb"), col("c.embedding")).as("cos"))
    cand.groupBy("qid")
      .agg(topk(struct((-col("cos")).as("negcos"), col("vid").as("v")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
        col("t.v").as("vid"), round(-col("t.negcos"), 4).as("cos"))
  }

  /** Query-side cell probing shared by the IVF paths: each query ranks
    * the (broadcast-literal) coarse centroids and keeps its `nprobe`
    * nearest cells. nQueries × nCells rows (tiny); interpreted
    * higher-order folds are fine here and accumulate sequentially in
    * double, so the oracle ranks cells identically. Returns
    * (qid, qemb, pcell). */
  private[graft] def probeCells(queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], nprobe: Int): DataFrame = {
    import graft.operators.KMeansND
    val sorted = centroids.sortBy(_._1)
    val centArr = array(sorted.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.toIndexedSeq.map(lit): _*).as("cv"),
        lit(KMeansND.norm2(cv)).as("cn"))
    }: _*)
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val qd = transform(col("embedding"), x => x.cast("double"))
    queries
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"), qd.as("qv"))
      .withColumn("c", explode(centArr))
      .withColumn("dist",
        (dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), col("c.cv"))) + col("c.cn"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist"), col("c.cid"))))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qemb"), col("c.cid").as("pcell"))
  }

  /** IVF + PQ — the composed 100 TB ANN index: coarse Voronoi cells
    * prune the search to `nprobe` cells per query AND the corpus inside
    * cells is ranked by asymmetric-distance (ADC) over byte-packed PQ
    * codes, never raw embeddings. The stored index row is
    * (vec_id, cell, codes) ≈ tens of bytes — the layout that lets a
    * billion-vector corpus sit in executor memory. Ranking cost per
    * query is (corpus/nCells)×nprobe code-array ADC evaluations; raw
    * vectors appear only query-side (broadcast). Same argmin/ADC
    * arithmetic as `ann_pq`, same cell geometry as `ann_ivf`, so the
    * composed oracle reproduces both stages exactly. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], codebook: Seq[Seq[Double]],
      numSub: Int, k: Int, nprobe: Int = 2): DataFrame =
    ivfPqTopKIndexed(ivfPqIndex(corpus, centroids, codebook, numSub),
      queries, centroids, codebook, numSub, k, nprobe)

  /** The persisted IVF+PQ index row: (vec_id, cell, codes) — tens of
    * bytes per vector, embeddings dropped; the layout that lets a
    * billion-vector corpus sit in executor memory. Assignment +
    * encoding in one scan over broadcast-literal artifacts. */
  def ivfPqIndex(corpus: DataFrame, centroids: Seq[(Int, Array[Double])],
      codebook: Seq[Seq[Double]], numSub: Int): DataFrame = {
    import graft.functions.PQExpressions.pqEncode
    import graft.operators.KMeansND
    corpus
      .withColumn("cell",
        KMeansND.nearest(col("embedding"), centroids).getField("cid"))
      .select(col("vec_id"), col("cell"),
        pqEncode(col("embedding"), codebook, numSub).as("codes"))
  }

  /** Incremental IVF+PQ maintenance — [[ivfInsert]]'s contract on the
    * COMPRESSED index: a new-vector batch assigns to the existing
    * cells and encodes against the existing codebook in one batch
    * scan; the stored code rows are never touched, and insert-then-
    * probe ≡ rebuild-then-probe exactly (both assignment and encoding
    * are per-vector against fixed artifacts — `ann_ivfpq_insert`
    * hash-gates it against the full-rebuild oracle). Recall drifts
    * only as the data leaves the trained centroids/codebook behind —
    * the scheduled offline refit's job. */
  def ivfPqInsert(index: DataFrame, batch: DataFrame,
      centroids: Seq[(Int, Array[Double])], codebook: Seq[Seq[Double]],
      numSub: Int): DataFrame =
    index.unionByName(ivfPqIndex(batch, centroids, codebook, numSub))

  /** [[ivfPqTopK]] over a PREBUILT (vec_id, cell, codes) index. */
  def ivfPqTopKIndexed(index: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], codebook: Seq[Seq[Double]],
      numSub: Int, k: Int, nprobe: Int = 2): DataFrame = {
    import graft.functions.PQExpressions.pqAdcDist
    import graft.functions.TopKAggregate.topk
    val probed = probeCells(queries, centroids, nprobe)
    val cand = index.as("c")
      .join(broadcast(probed.as("q")),
        col("q.pcell") === col("c.cell") && col("q.qid") =!= col("c.vec_id"))
      .select(col("q.qid").as("qid"), col("c.vec_id").as("vid"),
        pqAdcDist(col("q.qemb"), col("c.codes"), codebook, numSub).as("ad"))
    cand.groupBy("qid")
      .agg(topk(struct(col("ad"), col("vid").as("v")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
        col("t.v").as("vid"), round(col("t.ad"), 4).as("ad"))
  }

  /** Residual-encoding IVF+PQ — the FAISS-style IVFPQ layout: PQ codes
    * quantize the RESIDUAL v − centroid(cell) instead of the raw
    * vector. Residuals concentrate near the origin, so one shared
    * codebook covers every cell far better than raw-space codes (the
    * raw-space [[ivfPqTopK]] needs its codebook to span the whole
    * corpus). Query side mirrors it: each probed cell gets its own
    * query residual, and ADC runs residual-vs-residual-codeword. The
    * stored row is still (vec_id, cell, codes-bytes); arithmetic stays
    * in doubles end to end (exact IEEE subtraction — no float
    * round-trip for the oracle to chase). `codebook` lives in residual
    * space; centroid cids must be contiguous from 0. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], codebook: Seq[Seq[Double]],
      numSub: Int, k: Int, nprobe: Int = 2): DataFrame = {
    import graft.functions.PQExpressions.{pqAdcDist, pqEncode}
    import graft.functions.TopKAggregate.topk
    import graft.operators.KMeansND
    val sorted = centroids.sortBy(_._1)
    require(sorted.map(_._1) == sorted.indices.map(identity),
      "residual IVF-PQ expects contiguous cell ids from 0")
    val centArrD = array(sorted.map { case (_, cv) =>
      array(cv.toIndexedSeq.map(lit): _*)
    }: _*)
    def residual(vec: Column, cell: Column): Column =
      zip_with(transform(vec, x => x.cast("double")),
        element_at(centArrD, cell + 1), (a, b) => a - b)
    val index = corpus
      .withColumn("cell",
        KMeansND.nearest(col("embedding"), centroids).getField("cid"))
      .select(col("vec_id"), col("cell"),
        pqEncode(residual(col("embedding"), col("cell")), codebook, numSub)
          .as("codes"))
    val probed = probeCells(queries, centroids, nprobe)
      .withColumn("qres", residual(col("qemb"), col("pcell")))
    val cand = index.as("c")
      .join(broadcast(probed.as("q")),
        col("q.pcell") === col("c.cell") && col("q.qid") =!= col("c.vec_id"))
      .select(col("q.qid").as("qid"), col("c.vec_id").as("vid"),
        pqAdcDist(col("q.qres"), col("c.codes"), codebook, numSub).as("ad"))
    cand.groupBy("qid")
      .agg(topk(struct(col("ad"), col("vid").as("v")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
        col("t.v").as("vid"), round(col("t.ad"), 4).as("ad"))
  }

  /** Production coarse quantizer for IVF: cells fitted with the
    * distributed Lloyd's of `KMeansND.fit` (broadcast centroids +
    * treeAggregate partials — no per-iteration shuffle of the corpus).
    * The oracle-gated queries keep the deterministic first-k seed so
    * DuckDB can reproduce the layout; this is the recall path. */
  def trainedCells(corpus: DataFrame, nCells: Int, maxIter: Int = 10)
      : Seq[(Int, Array[Double])] =
    KMeansND.fit(
      corpus.select(col("vec_id").as("id"), col("embedding").as("vec")),
      nCells, maxIter)

  /** Production PQ codebook: each subspace's codewords fitted
    * independently with `KMeansND.fit` over that subspace's slices
    * (PQ's defining property — subspace quantizers are independent),
    * then reassembled into full-length codewords (codeword j's slice
    * for subspace m = subspace-m centroid j) so the result drops into
    * `pqEncode`/`pqAdcDist` unchanged. Seeded from the same first-k
    * vectors as the deterministic codebook, so Lloyd's monotone SSE
    * descent guarantees quantization error ≤ the seeded codebook's. */
  def trainedPqCodebook(corpus: DataFrame, numCodes: Int, numSub: Int,
      dim: Int = 64, maxIter: Int = 5): Seq[Seq[Double]] = {
    val sub = dim / numSub
    val perSub: Seq[Map[Int, Array[Double]]] = (0 until numSub).map { m =>
      val sliced = corpus.select(col("vec_id").as("id"),
        slice(col("embedding"), m * sub + 1, sub).as("vec"))
      KMeansND.fit(sliced, numCodes, maxIter).toMap
    }
    (0 until numCodes).map(j => perSub.flatMap(cb => cb(j).toSeq))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup in
    * embedding space. `cells` blocks the pairwise search (pass
    * `KMeansND.seed` for the oracle-reproducible layout or
    * [[trainedCells]] for the production quantizer; size k ~ sqrt(N) so
    * per-cell pair counts stay bounded). Within a cell a vector is
    * dropped when a lower-id vector sits within cosine `tau`; identical
    * vectors collapse by content hash before the pairwise stage, so
    * the self-join runs over distinct vectors only. Returns the
    * per-cell funnel (cid, n_vecs, n_kept, n_dropped). */
  def semDedup(corpus: DataFrame, cells: Seq[(Int, Array[Double])],
      tau: Double): DataFrame = {
    val emb = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = KMeansND.assign(emb, cells)
      .withColumn("vh", vecHash(col("vec")))
    // one row per distinct vector per cell: member count + keeper
    // candidate (min id); members beyond the keeper are always drops
    // (cosine of identical vectors is 1 >= tau)
    val groups = base.groupBy("cid", "vh")
      .agg(min("id").as("rid"), count(lit(1)).as("c"),
        min_by(col("vec"), col("id")).as("vec"))
    // a rep group is blocked when a lower-rid group in the same cell
    // is within tau (canonical rid_a < rid_b => b is the blocked side)
    val flagged = groups.as("a")
      .join(groups.as("b"),
        col("a.cid") === col("b.cid") && col("a.rid") < col("b.rid")
          && round(cosineSim(col("a.vec"), col("b.vec")), 4) >= tau)
      .select(col("b.cid").as("fcid"), col("b.rid").as("frid")).distinct()
    groups
      .join(flagged,
        col("cid") === col("fcid") && col("rid") === col("frid"), "left")
      .groupBy("cid")
      .agg(sum("c").as("n_vecs"),
        count(when(col("frid").isNull, 1)).as("n_kept"),
        (sum("c") - count(when(col("frid").isNull, 1))).as("n_dropped"))
  }

  /** SemDeDup applied: the kept vector ids (one representative — the
    * min id — per distinct-vector group whose rep is NOT within `tau`
    * of a lower-id group in its cell). The action twin of [[semDedup]]
    * (which reports the funnel); downstream joins this against the
    * corpus to materialize the semantically-deduped training set. Same
    * blocked shape: pairwise work only within cells over distinct
    * vectors. */
  def semDedupApply(corpus: DataFrame, cells: Seq[(Int, Array[Double])],
      tau: Double): DataFrame = {
    val emb = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = KMeansND.assign(emb, cells)
      .withColumn("vh", vecHash(col("vec")))
    val groups = base.groupBy("cid", "vh")
      .agg(min("id").as("rid"), min_by(col("vec"), col("id")).as("vec"))
    val flagged = groups.as("a")
      .join(groups.as("b"),
        col("a.cid") === col("b.cid") && col("a.rid") < col("b.rid")
          && round(cosineSim(col("a.vec"), col("b.vec")), 4) >= tau)
      .select(col("b.cid").as("fcid"), col("b.rid").as("frid")).distinct()
    groups
      .join(flagged,
        col("cid") === col("fcid") && col("rid") === col("frid"), "left_anti")
      .select(col("rid").as("vec_id"), col("cid"))
  }

  /** Graph ANN: partition-local navigable-small-world index + greedy
    * beam search (Malkov & Yashunin 2016, arXiv:1603.09320 — the NSW
    * base layer; deterministic insertion order stands in for the level
    * draw, so no RNG crosses engines). Completes the ANN taxonomy next
    * to IVF/PQ/LSH with the in-memory industry default.
    *
    * Distribution model is SHARDED-HNSW serving: every partition
    * builds an independent graph over ITS vectors (embarrassingly
    * parallel — zero build shuffle at any scale), each query fans out
    * to all shards (broadcast, bounded query set), each shard answers
    * from its graph walk, and a bounded-heap top-k merges shard
    * answers. At 100 TB: executor memory holds shard_size × m edge
    * ints (not vectors²); recall is governed by efSearch exactly as in
    * single-node HNSW because the merge of per-shard EXACT-ish top-k
    * is itself exact over the union of walked candidates. Rows-only
    * gate (the graph walk is imperative); SimilaritySpec pins its
    * recall@3 against exact cosine at/above the IVF+PQ nprobe=2 point
    * from ann_recall_sweep at equal probe cost.
    *
    * Build: insert by ascending vec_id; each insert beam-searches the
    * current graph (ef = efConstruction) from the min-id entry point,
    * links bidirectionally to the m nearest found, and prunes any
    * neighbor list that exceeds 2m back to the m most similar — the
    * paper's simple neighbor-selection heuristic. */
  def nswTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
      efConstruction: Int = 32, efSearch: Int = 32): DataFrame = {
    import graft.functions.TopKAggregate.topk
    val spark = corpus.sparkSession
    import spark.implicits._
    // bounded query-set collect — the same benchmark-size contract as
    // every other ANN query side (codebooks, probes)
    val qs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bq = spark.sparkContext.broadcast(qs)
    val cand = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val pts = it.toArray.sortBy(_._1)
        if (pts.isEmpty) Iterator.empty
        else {
          val n = pts.length
          val vecs = pts.map(_._2.map(_.toDouble))
          val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
          def cos(a: Array[Double], na: Double, b: Array[Double], nb: Double): Double = {
            var s = 0.0; var i = 0
            while (i < a.length) { s += a(i) * b(i); i += 1 }
            if (na == 0 || nb == 0) 0.0 else s / (na * nb)
          }
          val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
          // beam search over the graph built so far: best-first from the
          // entry, keep the ef most similar visited, stop when the best
          // open candidate is worse than the worst kept result
          def search(qv: Array[Double], qn: Double, ef: Int, bound: Int): Array[Int] = {
            val visited = new java.util.BitSet(bound)
            // results: min-heap on sim (head = worst kept)
            val results = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
              Ordering.by[(Double, Int), Double](_._1).reverse)
            // candidates: max-heap on sim
            val candQ = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
              Ordering.by[(Double, Int), Double](_._1))
            val s0 = cos(qv, qn, vecs(0), norms(0))
            visited.set(0); candQ.enqueue((s0, 0)); results.enqueue((s0, 0))
            while (candQ.nonEmpty &&
              (results.size < ef || candQ.head._1 > results.head._1)) {
              val (_, u) = candQ.dequeue()
              adj(u).foreach { v =>
                if (v < bound && !visited.get(v)) {
                  visited.set(v)
                  val sv = cos(qv, qn, vecs(v), norms(v))
                  if (results.size < ef || sv > results.head._1) {
                    candQ.enqueue((sv, v)); results.enqueue((sv, v))
                    if (results.size > ef) results.dequeue()
                  }
                }
              }
            }
            val ordered = scala.collection.mutable.ArrayBuffer.empty[Int]
            while (results.nonEmpty) ordered += results.dequeue()._2
            ordered.reverse.toArray // most similar first
          }
          var i = 1
          while (i < n) {
            val found = search(vecs(i), norms(i), efConstruction, i)
            found.take(m).foreach { j =>
              adj(i) += j; adj(j) += i
              if (adj(j).length > 2 * m) {
                val pruned = adj(j).distinct
                  .sortBy(v => -cos(vecs(j), norms(j), vecs(v), norms(v)))
                  .take(m)
                adj(j).clear(); adj(j) ++= pruned
              }
            }
            i += 1
          }
          bq.value.iterator.flatMap { case (qid, qf) =>
            val qv = qf.map(_.toDouble)
            val qn = math.sqrt(qv.map(x => x * x).sum)
            search(qv, qn, efSearch, n).iterator
              .filter(v => pts(v)._1 != qid)
              .take(k)
              .map(v => (qid, pts(v)._1,
                math.rint(cos(qv, qn, vecs(v), norms(v)) * 10000) / 10000))
          }
        }
      }
      .toDF("qid", "vid", "cos")
    cand.groupBy("qid")
      .agg(topk(struct((-col("cos")).as("negcos"), col("vid").as("v")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
        col("t.v").as("vid"), round(-col("t.negcos"), 4).as("cos"))
  }

  /** Multi-probe LSH top-k (Lv, Josephson, Wang, Charikar & Li,
    * VLDB 2007): each query probes its own bucket PLUS the
    * `nProbes − 1` buckets reached by flipping the hyperplanes whose
    * projection magnitude is smallest — the planes the query sits
    * closest to, i.e. exactly where a true neighbor most plausibly
    * landed on the other side. Recall rises without more hash tables
    * (the paper's point: perturbation probes substitute for table
    * replication); candidate volume is a constant ×nProbes, and the
    * corpus side is the SAME single bucketed scan as [[lshTopK]] —
    * only the broadcast query side widens. Determinism: flip order is
    * (|dot| asc, plane asc) on the same sequentially-folded doubles
    * the bucket signs use, so the oracle ranks flips identically; the
    * flip bit rides the struct as a plan literal (1L << p), never a
    * runtime shift. */
  def lshMultiProbeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 6, nProbes: Int = 3): DataFrame = {
    require(nProbes >= 1 && nProbes <= numPlanes + 1,
      s"nProbes must be in [1, numPlanes + 1], got $nProbes")
    val bc = corpus.withColumn("bucket", lshBucket(col("embedding"), numPlanes))
    val dotStructs = planes(numPlanes, 64).zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.toIndexedSeq.map(lit): _*)
      val dot = aggregate(
        zip_with(col("embedding"), planeCol, (v, r) => v.cast("double") * r),
        lit(0.0), (acc, x) => acc + x)
      struct(abs(dot).as("ad"), lit(p).as("p"), lit(1L << p).as("bit"))
    }
    val bq = queries
      .withColumn("bucket", lshBucket(col("embedding"), numPlanes))
      .withColumn("flips",
        slice(array_sort(array(dotStructs: _*)), 1, nProbes - 1))
      .withColumn("pbucket", explode(concat(array(col("bucket")),
        transform(col("flips"),
          f => col("bucket").bitwiseXOR(f.getField("bit"))))))
    val cand = bc.as("c")
      .join(broadcast(bq.as("q")),
        col("q.pbucket") === col("c.bucket")
          && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("vid"),
        cosineSim(col("q.embedding"), col("c.embedding")).as("cos"))
    // no dedup exchange needed: a query's probed buckets are pairwise
    // DISTINCT values (base XOR distinct single bits) and a corpus
    // vector has exactly one bucket, so each (qid, vid) pair matches
    // at most one probe
    import graft.functions.TopKAggregate.topk
    cand.groupBy("qid")
      .agg(topk(struct((-col("cos")).as("negcos"), col("vid").as("v")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
        col("t.v").as("vid"), round(-col("t.negcos"), 4).as("cos"))
  }

  /** Approximate top-k: brute force only within each query's LSH bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int = 6): DataFrame = {
    val bc = corpus.withColumn("bucket", lshBucket(col("embedding"), numPlanes))
    val bq = queries.withColumn("bucket", lshBucket(col("embedding"), numPlanes))
    val cand = bc.as("c")
      .join(broadcast(bq.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("vid"),
        cosineSim(col("q.embedding"), col("c.embedding")).as("cos"))
    import graft.functions.TopKAggregate.topk
    cand.groupBy("qid")
      .agg(topk(struct((-col("cos")).as("negcos"), col("vid").as("v")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), (col("i") + 1).cast("int").as("rk"),
        col("t.v").as("vid"), round(-col("t.negcos"), 4).as("cos"))
  }
}
