package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.{triShingles, words}

/** Sketch & search pack (round 11) — the bounded-state approximation
  * kernels a 100 TB engine runs INSTEAD of exact operators, each gated
  * against exact ground truth so the error is measured, never assumed:
  *
  *   - `q_bloom_prune`  Bloom-filter runtime join pruning (Bloom 1970)
  *   - `q_hll`          HyperLogLog distinct counting (Flajolet 2007)
  *   - `text_cms`       Count-Min sketch frequency (Cormode 2005)
  *   - `text_winnow`    winnowing fingerprints (Schleimer 2003, MOSS)
  *   - `text_search`    inverted-index boolean + phrase search
  *
  * Determinism (SURVEY §4): every hash is the first 8 md5 hex digits
  * read as a u32 (`conv(…,16,10)` ↔ DuckDB `CAST('0x'||… AS BIGINT)`)
  * — seedless, partition-order-free, engine-identical — and all sketch
  * state is integer, so the only float ops are the final single
  * divisions / ln both engines evaluate on identical inputs.
  */
object SketchPack extends QueryPack {

  /** u32 of the first 8 md5 hex chars — the pack's portable hash. */
  private def u32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  private def u32Sql(e: String): String =
    s"CAST(('0x'||substr(md5($e),1,8)) AS BIGINT)"

  // ---------------------------------------------------------------- bloom

  /** Hash count and bits-per-key for the Bloom filter. k=3 at 8 bits
    * per key gives a theoretical pass-through FP rate of
    * (1−e^(−3/8))³ ≈ 3% — small enough that the post-filter join does
    * ~no wasted work, large enough that the measured rate is nonzero
    * at gate scale (the operator's error is observable, not asserted
    * away). */
  private val BloomK = 3
  private val BloomBitsPerKey = 8

  /** m (bit-array size) is DATA-SIZED: next power of two ≥ 8·|dim|,
    * fixed at query run time and inlined into the oracle (the
    * trained-artifact stash discipline, SURVEY §4) — a constant m
    * would saturate at scale and a saturated Bloom filter passes
    * everything. At 10⁹ dim keys m is 2³³ bits = 1 GiB: past the
    * broadcast sweet spot, which is exactly when Spark's own
    * shuffle-partitioned runtime filters take over; this operator is
    * the broadcast regime, stated as such. */
  @volatile private var bloomStash: (Int, Long) = (4096, 0L)

  /** Runtime Bloom-filter join pruning — the SCALE operator behind
    * every selective fact⋈dim join: build a bit set from the dim-side
    * join keys (bounded by m BITS, never by data), broadcast it, and
    * drop fact rows map-side BEFORE the join shuffle. Output is the
    * per-orderstatus audit: rows in, rows passing the filter, true
    * matches, false positives, and the measured FP rate among true
    * non-matches. Plan shape: the bit set is `dim → explode(k
    * hashes) → distinct` (≤ m rows); the fact side takes k broadcast
    * hash-join probes + one broadcast match probe — zero shuffles
    * before the final 3-group agg. No false negative is possible by
    * construction (every dim key set its own bits); SketchSpec pins
    * n_pass ≥ n_match per group. */
  private def bloomPrune(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
      .localCheckpoint(true) // scanned k+1 times below; count it once
    val nDim = dim.count()
    val m = math.max(1024,
      java.lang.Long.highestOneBit(math.max(1L, BloomBitsPerKey * nDim - 1)) * 2)
      .toInt
    bloomStash = (m, nDim)
    def bkt(i: Int, key: Column): Column =
      pmod(u32(concat(lit(s"bf$i:"), key.cast("string"))), lit(m.toLong))
    val bits = dim
      .select(explode(array((1 to BloomK).map(i => bkt(i, col("k"))): _*)).as("bit"))
      .distinct()
    val fact = Tables.orders(s, d)
      .select(col("o_custkey").as("k"), col("o_orderstatus"))
    val probed = (1 to BloomK).foldLeft(
      (1 to BloomK).foldLeft(fact)((df, i) => df.withColumn(s"b$i", bkt(i, col("k"))))
    )((df, i) => df.join(
      broadcast(bits.select(col("bit").as(s"b$i"), lit(1).as(s"h$i"))),
      Seq(s"b$i"), "left"))
    val flagged = probed.join(
      broadcast(dim.select(col("k"), lit(1).as("dm"))), Seq("k"), "left")
    val pass = (1 to BloomK).map(i => col(s"h$i").isNotNull).reduce(_ && _)
    flagged.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(pass, 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("dm").isNotNull, 1L).otherwise(0L)).as("n_match"),
        sum(when(pass && col("dm").isNull, 1L).otherwise(0L)).as("n_false_pos"))
      .select(col("o_orderstatus"), col("n_rows"), col("n_pass"),
        col("n_match"), col("n_false_pos"),
        round(col("n_false_pos") /
          expr("nullif(n_rows - n_match, 0)"), 6).as("fp_rate"),
        lit(m).as("m_bits"), lit(nDim).as("n_dim_keys"))
  }

  private def bloomSql: String = {
    val (m, nDim) = bloomStash
    def b(i: Int, e: String) = s"${u32Sql(s"'bf$i:'||CAST($e AS VARCHAR)")} % $m"
    s"""WITH dim AS (SELECT DISTINCT c_custkey AS k FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |bits AS (SELECT DISTINCT bit FROM (
       |  SELECT ${b(1, "k")} AS bit FROM dim
       |  UNION ALL SELECT ${b(2, "k")} FROM dim
       |  UNION ALL SELECT ${b(3, "k")} FROM dim)),
       |f AS (SELECT o_custkey AS k, o_orderstatus,
       |  ${b(1, "o_custkey")} AS b1, ${b(2, "o_custkey")} AS b2,
       |  ${b(3, "o_custkey")} AS b3 FROM orders),
       |fl AS (SELECT o_orderstatus,
       |  (b1 IN (SELECT bit FROM bits) AND b2 IN (SELECT bit FROM bits)
       |    AND b3 IN (SELECT bit FROM bits)) AS pass,
       |  k IN (SELECT k FROM dim) AS mt FROM f)
       |SELECT o_orderstatus, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  CAST(sum(CASE WHEN mt THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |  CAST(sum(CASE WHEN pass AND NOT mt THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_false_pos,
       |  round(CAST(sum(CASE WHEN pass AND NOT mt THEN 1 ELSE 0 END) AS DOUBLE)
       |    / nullif(count(*) - sum(CASE WHEN mt THEN 1 ELSE 0 END), 0), 6)
       |    AS fp_rate,
       |  CAST($m AS INT) AS m_bits, CAST($nDim AS BIGINT) AS n_dim_keys
       |FROM fl GROUP BY 1""".stripMargin
  }

  /** Shard count for the SHUFFLE-partitioned filter — stands in for
    * the cluster's partition count; each shard owns m/P bits. */
  private val BloomShards = 32

  @volatile private var bloomShuffleStash: (Int, Long) = (4096, 0L)

  /** Shuffle-partitioned runtime join filter — the BEYOND-broadcast
    * regime of [[bloomPrune]]'s own scale note: at 10⁹ dim keys the
    * global bit set hits ~1 GiB, past the broadcast sweet spot, so the
    * filter state itself must shard. The key space splits into P
    * shards by an independent hash; each shard packs ITS m/P-bit
    * slice of the filter into 64-bit words (a `(word → bits)` map per
    * shard — bounded by the shard's slice, never by data), built with
    * one `bit_or` aggregation. The fact side joins the packed state
    * on `shard` alone — ONE co-partitioned SHUFFLE_HASH join (hinted:
    * the broadcast fallback is exactly what this operator exists to
    * avoid), riding the same hash-partitioning the protected join
    * would pay anyway — then tests its k=3 bits with pure integer
    * word/mask arithmetic. Same audit readout as the broadcast twin
    * (rows in / passed / matched / false-positive / FP rate); no
    * false negative is possible by construction (every dim key set
    * its own 3 bits in its own shard) — SketchSpec plants the
    * match ⊆ pass containment and the per-shard slice bound. */
  private def bloomPruneShuffle(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
      .localCheckpoint(true)
    val nDim = dim.count()
    val m = math.max(1024,
      java.lang.Long.highestOneBit(math.max(1L, BloomBitsPerKey * nDim - 1)) * 2)
      .toInt
    bloomShuffleStash = (m, nDim)
    val mP = m / BloomShards // pow2/pow2: the shard's bit-slice width
    def shardOf(key: Column): Column =
      pmod(u32(concat(lit("bfs:"), key.cast("string"))),
        lit(BloomShards.toLong))
    def bkt(i: Int, key: Column): Column =
      pmod(u32(concat(lit(s"bf$i:"), key.cast("string"))), lit(mP.toLong))
    // (shard, word → or-of-masks) — the sharded filter state; words
    // sort-ordered so the map literal is partition-order-free
    val packed = dim
      .select(shardOf(col("k")).as("shard"),
        explode(array((1 to BloomK).map(i => bkt(i, col("k"))): _*)).as("bit"))
      .distinct()
      .groupBy(col("shard"), expr("bit div 64").as("word"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), " +
        "cast(bit % 64 as int)))").as("mask"))
      .groupBy("shard")
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("word"), col("mask"))))).as("bm"))
    val fact = Tables.orders(s, d)
      .select(col("o_custkey").as("k"), col("o_orderstatus"))
      .withColumn("shard", shardOf(col("k")))
    val probed = (1 to BloomK).foldLeft(fact)((df, i) =>
      df.withColumn(s"b$i", bkt(i, col("k"))))
      .join(packed.hint("SHUFFLE_HASH"), Seq("shard"), "left")
    def hit(i: Int): Column = (coalesce(
      try_element_at(col("bm"), expr(s"b$i div 64")), lit(0L))
      .bitwiseAND(expr(s"shiftleft(cast(1 as bigint), " +
        s"cast(b$i % 64 as int))"))
      =!= 0L)
    val pass = (1 to BloomK).map(hit).reduce(_ && _)
    val flagged = probed.join(
      dim.select(col("k"), lit(1).as("dm")).hint("SHUFFLE_HASH"),
      Seq("k"), "left")
    flagged.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(pass, 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("dm").isNotNull, 1L).otherwise(0L)).as("n_match"),
        sum(when(pass && col("dm").isNull, 1L).otherwise(0L)).as("n_false_pos"))
      .select(col("o_orderstatus"), col("n_rows"), col("n_pass"),
        col("n_match"), col("n_false_pos"),
        round(col("n_false_pos") /
          expr("nullif(n_rows - n_match, 0)"), 6).as("fp_rate"),
        lit(m).as("m_bits"), lit(BloomShards).as("n_shards"),
        lit(nDim).as("n_dim_keys"))
  }

  /** DuckDB replay of [[bloomPruneShuffle]]: membership over the same
    * (shard, local-bit) pairs — the word-packing is engine-side
    * LAYOUT, not semantics, so the oracle tests set membership with
    * the pair encoded as shard·(m/P)+bit. */
  private def bloomShuffleSql: String = {
    val (m, nDim) = bloomShuffleStash
    val mP = m / BloomShards
    def sh(e: String) =
      s"${u32Sql(s"'bfs:'||CAST($e AS VARCHAR)")} % $BloomShards"
    def b(i: Int, e: String) =
      s"${u32Sql(s"'bf$i:'||CAST($e AS VARCHAR)")} % $mP"
    s"""WITH dim AS (SELECT DISTINCT c_custkey AS k FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |bits AS (SELECT DISTINCT sb FROM (
       |  SELECT (${sh("k")}) * $mP + ${b(1, "k")} AS sb FROM dim
       |  UNION ALL SELECT (${sh("k")}) * $mP + ${b(2, "k")} FROM dim
       |  UNION ALL SELECT (${sh("k")}) * $mP + ${b(3, "k")} FROM dim)),
       |f AS (SELECT o_custkey AS k, o_orderstatus,
       |  (${sh("o_custkey")}) * $mP + ${b(1, "o_custkey")} AS s1,
       |  (${sh("o_custkey")}) * $mP + ${b(2, "o_custkey")} AS s2,
       |  (${sh("o_custkey")}) * $mP + ${b(3, "o_custkey")} AS s3
       |  FROM orders),
       |fl AS (SELECT o_orderstatus,
       |  (s1 IN (SELECT sb FROM bits) AND s2 IN (SELECT sb FROM bits)
       |    AND s3 IN (SELECT sb FROM bits)) AS pass,
       |  k IN (SELECT k FROM dim) AS mt FROM f)
       |SELECT o_orderstatus, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  CAST(sum(CASE WHEN mt THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |  CAST(sum(CASE WHEN pass AND NOT mt THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_false_pos,
       |  round(CAST(sum(CASE WHEN pass AND NOT mt THEN 1 ELSE 0 END) AS DOUBLE)
       |    / nullif(count(*) - sum(CASE WHEN mt THEN 1 ELSE 0 END), 0), 6)
       |    AS fp_rate,
       |  CAST($m AS INT) AS m_bits, CAST($BloomShards AS INT) AS n_shards,
       |  CAST($nDim AS BIGINT) AS n_dim_keys
       |FROM fl GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------------ hll

  /** Register-index bits: 2^8 = 256 registers (σ ≈ 1.04/√256 = 6.5%). */
  private val HllP = 8

  /** HyperLogLog estimate vs exact distinct for one key column — the
    * EXPLICIT register construction (idx = h mod 256, rank = leading-
    * zero position of the remaining 24 hash bits via an integer
    * comparison ladder, register = max rank), not a library call, so
    * the DuckDB oracle replays it bit-for-bit. The indicator sum
    * Z = Σ 2^(−M_j) is computed as the INTEGER Σ 2^(25−M_j) (absent
    * registers contribute 2^25 each; total ≤ 2^33) with one float
    * division at the end — exact, association-free. Small-range
    * (linear counting) correction applied per Flajolet 2007 when
    * E ≤ 2.5m and empty registers exist. Scale: state is 256 longs no
    * matter the row count, map-side combined — the distinct-count
    * operator that never shuffles data, only registers. */
  private def hllOne(rows: DataFrame, key: Column, label: String): DataFrame = {
    // per-row register update through the SHARED kernel
    // (graft.functions.Hll) — hllStream sketches with the same
    // expressions, so stream and batch registers are bit-identical
    val (idx, rk) = graft.functions.Hll.idxRank(key)
    val regs = rows
      .select(idx.as("idx"), rk.as("rk"))
      .groupBy("idx").agg(max("rk").as("mr"))
    val est = regs
      .agg(sum(expr("shiftleft(cast(1 as bigint), 25 - mr)")).as("sp"),
        count(lit(1)).as("np"))
      .select((col("sp") + (lit(256L) - col("np")) * lit(1L << 25)).as("si"),
        (lit(256L) - col("np")).as("v"))
    val exact = rows.agg(countDistinct(key).as("n_exact"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val eraw = alpha * lit(65536.0) * lit(33554432.0) / col("si").cast("double")
    val e = when(eraw <= lit(640.0) && col("v") > 0,
      lit(256.0) * log(lit(256.0) / col("v").cast("double"))).otherwise(eraw)
    est.crossJoin(broadcast(exact))
      .select(lit(label).as("col_name"), col("n_exact"),
        round(e, 2).as("n_est"),
        round(abs(e - col("n_exact")) / col("n_exact"), 4).as("rel_err"))
  }

  private def hll(s: SparkSession, d: String): DataFrame =
    hllOne(Tables.lineitem(s, d), col("l_partkey"), "l_partkey")
      .unionByName(hllOne(Tables.lineitem(s, d), col("l_suppkey"), "l_suppkey"))
      .unionByName(hllOne(Tables.orders(s, d), col("o_custkey"), "o_custkey"))

  private def hllSql: String = {
    val rankCase = "CASE " +
      (1 to 24).map(r => s"WHEN wv >= ${1L << (24 - r)} THEN $r").mkString(" ") +
      " ELSE 25 END"
    def one(tab: String, colName: String) =
      s"""SELECT '$colName' AS col_name,
         |  (SELECT count(DISTINCT $colName) FROM $tab) AS n_exact,
         |  round(e, 2) AS n_est,
         |  round(abs(e - (SELECT count(DISTINCT $colName) FROM $tab))
         |    / (SELECT count(DISTINCT $colName) FROM $tab), 4) AS rel_err
         |FROM (
         |  SELECT CASE WHEN (0.7213/(1.0+1.079/256.0))*65536.0*33554432.0
         |      /CAST(si AS DOUBLE) <= 640.0 AND v > 0
         |    THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE))
         |    ELSE (0.7213/(1.0+1.079/256.0))*65536.0*33554432.0
         |      /CAST(si AS DOUBLE) END AS e
         |  FROM (
         |    SELECT sp + (256 - np) * (CAST(1 AS BIGINT) << 25) AS si,
         |      256 - np AS v
         |    FROM (
         |      SELECT sum((CAST(1 AS BIGINT) << (25 - mr))) AS sp,
         |        count(*) AS np
         |      FROM (
         |        SELECT idx, max($rankCase) AS mr
         |        FROM (SELECT hv % 256 AS idx, hv // 256 AS wv FROM (
         |          SELECT ${u32Sql(s"'hll:'||CAST($colName AS VARCHAR)")} AS hv
         |          FROM $tab)) GROUP BY idx))))""".stripMargin
    Seq(one("lineitem", "l_partkey"), one("lineitem", "l_suppkey"),
      one("orders", "o_custkey")).mkString("\nUNION ALL\n")
  }

  // ------------------------------------------------------------------ cms

  /** Sketch depth (rows) and width (buckets per row). Width 32 is
    * deliberately far below the 31-token gate vocabulary so collisions
    * — the thing CMS trades for bounded state — actually occur and the
    * measured overcount is nonzero; production sizing is w = ⌈e/ε⌉
    * (2^20 buckets bounds overcount to ~3·10⁻⁶ of the stream), same
    * plan shape. */
  private val CmsD = 3
  private val CmsW = 32

  /** Count-Min sketch token frequency vs exact — estimate each of the
    * exact top-20 tokens from a d×w integer sketch and report the
    * per-token overcount (CMS never undercounts: every bucket a token
    * hashes to holds AT LEAST its true count; min over d rows is the
    * tightest such bound — Cormode & Muthukrishnan 2005). The sketch
    * is built from the per-token COUNT table, not the raw token
    * stream (§3 rule 3a′: Σ counts of colliding tokens ≡ count of
    * colliding occurrences — same cells, corpus-sized scan, vocab-
    * sized shuffle). Scale: sketch state is d·w cells regardless of
    * corpus size, map-side combined; the exact top-20 exists here as
    * ground truth for the gate — at 100 TB the sketch REPLACES it. */
  private def cms(s: SparkSession, d: String): DataFrame = {
    // bucket through the SHARED kernel (graft.functions.Cms) —
    // cmsStream sketches with the same expressions, so stream and
    // batch cells are bit-identical
    def bkt(dd: Int): Column = graft.functions.Cms.bucket(dd, col("tok"))
    val cnt = Tables.documents(s, d)
      .select(explode(words(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .localCheckpoint(true) // feeds sketch + top-20; one corpus scan
    val sketch = cnt
      .select(explode(array((1 to CmsD).map(dd =>
        struct(lit(dd).as("dd"), bkt(dd).as("bkt"), col("n_exact").as("c"))): _*))
        .as("e"))
      .select(col("e.dd").as("dd"), col("e.bkt").as("bkt"), col("e.c").as("c"))
      .groupBy("dd", "bkt").agg(sum("c").as("cell"))
    val top = cnt.orderBy(col("n_exact").desc, col("tok")).limit(20)
    top
      .select(col("tok"), col("n_exact"), explode(array((1 to CmsD).map(dd =>
        struct(lit(dd).as("dd"), bkt(dd).as("bkt"))): _*)).as("e"))
      .select(col("tok"), col("n_exact"),
        col("e.dd").as("dd"), col("e.bkt").as("bkt"))
      .join(broadcast(sketch), Seq("dd", "bkt"))
      .groupBy("tok", "n_exact").agg(min("cell").as("n_est"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_exact").desc, col("tok"))))
      .select(col("rk").cast("int").as("rk"), col("tok").as("token"),
        col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
  }

  private def cmsSql: String = {
    def b(dd: Int) = s"${u32Sql(s"'cms$dd:'||tok")} % $CmsW"
    val skRows = (1 to CmsD).map(dd =>
      s"SELECT $dd AS dd, ${b(dd)} AS bkt, sum(n_exact) AS cell FROM cnt GROUP BY 2")
      .mkString("\n  UNION ALL ")
    val tbRows = (1 to CmsD).map(dd =>
      s"SELECT tok, n_exact, $dd AS dd, ${b(dd)} AS bkt FROM top")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
       |    FROM documents),
       |cnt AS MATERIALIZED (SELECT tok, count(*) AS n_exact FROM toks
       |  WHERE tok <> '' GROUP BY 1),
       |sk AS ($skRows),
       |top AS MATERIALIZED (SELECT tok, n_exact FROM cnt
       |  ORDER BY n_exact DESC, tok LIMIT 20),
       |tb AS ($tbRows),
       |est AS (SELECT tok, n_exact, min(cell) AS n_est
       |  FROM tb JOIN sk USING (dd, bkt) GROUP BY 1, 2)
       |SELECT CAST(row_number() OVER (ORDER BY n_exact DESC, tok) AS INT) AS rk,
       |  tok AS token, n_exact, CAST(n_est AS BIGINT) AS n_est,
       |  CAST(n_est - n_exact AS BIGINT) AS overcount
       |FROM est""".stripMargin
  }

  // --------------------------------------------------------------- winnow

  /** Winnowing window size: with k=3 token shingles, any shared run of
    * ≥ w+k−1 = 6 tokens is GUARANTEED to share a selected fingerprint
    * (the winnowing guarantee), and expected fingerprint density is
    * 2/(w+1) of shingles. */
  private val WinnowW = 4

  /** Hashes selected in more docs than this are corpus boilerplate
    * (common idiom), masked before pairing — the same frequent-key cap
    * as the dedup pack's band-size cut; keeps the per-hash join fan-out
    * bounded at any corpus size. Gate-scale max df is 9, so the cap is
    * dormant here and documented live. */
  private val WinnowMaxDf = 20

  /** Selected fingerprints per doc: (doc_id, h, sel_pos). The
    * tie-break inside a window is RIGHTMOST minimal hash — canonical
    * winnowing — encoded so one integer `min` does both comparisons:
    * key = h·2^20 + (2^20−1−pos) orders by hash then by DESCENDING
    * position (docs are capped at 2^20 shingles per partition by
    * construction of the key; h < 2^32 keeps the key < 2^52, exact in
    * a long). Public to the test JVM: SketchSpec replays reference
    * winnowing in plain Scala over a hand doc and compares sets. */
  private[graft] def winnowSelected(docsDf: DataFrame,
      w: Int = WinnowW): DataFrame = {
    val sh = docsDf.withColumn("ws", words(col("text")))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), posexplode(triShingles(col("ws"))).as(Seq("pos", "g")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    sh.select(col("doc_id"), col("pos"),
        (u32(col("g")) * lit(1048576L) + (lit(1048575L) - col("pos"))).as("ky"))
      .withColumn("sel", min("ky").over(win))
      .filter(col("pos") >= w - 1)
      .select(col("doc_id"), expr("sel div 1048576").as("h"),
        (lit(1048575L) - pmod(col("sel"), lit(1048576L))).as("sel_pos"))
      .distinct()
  }

  /** Winnowing fingerprint match — MOSS-style local-similarity
    * detection (Schleimer, Wilkerson & Aiken, SIGMOD 2003): the
    * position-robust complement to `text_fingerprint`'s single global
    * min-hash and `dedup_minhash`'s whole-doc Jaccard — winnowing
    * finds docs sharing PASSAGES (any ≥6-token common run must share a
    * fingerprint), not just globally-similar docs. Output: top-20 doc
    * pairs by shared selected-fingerprint count. Scale shape: the
    * per-doc selection is one bounded window over posexploded shingles
    * (partitioned by doc — no global sort); pairing joins the sparse
    * (hash → doc) table against itself per hash with the df cap
    * bounding fan-out; top-20 via sort+limit. */
  private def winnow(s: SparkSession, d: String): DataFrame = {
    val hd = winnowSelected(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select("h", "doc_id").distinct()
    val rare = hd.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, WinnowMaxDf)).select("h")
    val hdr = hd.join(rare, Seq("h"), "left_semi")
    val ord = Seq(col("n_shared").desc, col("doc_a").asc, col("doc_b").asc)
    hdr.as("a").join(hdr.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(ord: _*).limit(20)
      .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
      .select(col("rk").cast("int").as("rk"), col("doc_a"), col("doc_b"),
        col("n_shared"))
  }

  private def winnowSql: String =
    s"""WITH d AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws
       |    FROM documents),
       |sh AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(ws)-1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g,
       |    unnest(range(0, len(ws)-2)) AS pos
       |  FROM d WHERE len(ws) >= 3),
       |ky AS (SELECT doc_id, pos,
       |    ${u32Sql("g")} * 1048576 + (1048575 - pos) AS ky FROM sh),
       |wm AS (SELECT doc_id, pos, min(ky) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS BETWEEN ${WinnowW - 1} PRECEDING AND CURRENT ROW)
       |    AS sel FROM ky),
       |hd AS (SELECT DISTINCT doc_id, sel // 1048576 AS h FROM wm
       |  WHERE pos >= ${WinnowW - 1}),
       |rare AS (SELECT h FROM (SELECT h, count(*) AS df FROM hd GROUP BY 1)
       |  WHERE df BETWEEN 2 AND $WinnowMaxDf),
       |hdr AS (SELECT hd.h, hd.doc_id FROM hd JOIN rare USING (h)),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    count(*) AS n_shared
       |  FROM hdr a JOIN hdr b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |top AS (SELECT doc_a, doc_b, n_shared FROM pairs
       |  ORDER BY n_shared DESC, doc_a, doc_b LIMIT 20)
       |SELECT CAST(row_number() OVER (ORDER BY n_shared DESC, doc_a, doc_b)
       |    AS INT) AS rk, doc_a, doc_b, n_shared
       |FROM top""".stripMargin

  // --------------------------------------------------------------- search

  private val SearchTermA = "table"
  private val SearchTermB = "hash"

  /** Inverted-index search kernel over any (doc_id, text) table —
    * public to the test JVM for the hand-corpus phrase gate. Postings
    * are (doc, pos, term) rows with the term filter PUSHED to the
    * posting build (at 100 TB the postings table persists
    * hive-partitioned by term and the filter becomes partition
    * pruning; the query-time shape is identical). AND semantics: both
    * terms present. Phrase count: positional equi-join pos+1 within
    * doc — co-partitioned, bounded by term frequency. Top-20 by
    * (phrase count, total tf, doc_id) via sort+limit. */
  private[graft] def searchRank(docsDf: DataFrame, termA: String,
      termB: String): DataFrame = {
    val po = docsDf
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(termA, termB))
      .localCheckpoint(true) // feeds tf + both phrase sides; one scan
    val tf = po.groupBy("doc_id")
      .agg(sum(when(col("tok") === termA, 1L).otherwise(0L)).as("tf_a"),
        sum(when(col("tok") === termB, 1L).otherwise(0L)).as("tf_b"))
      .filter(col("tf_a") > 0 && col("tf_b") > 0)
    val pa = po.filter(col("tok") === termA).select(col("doc_id"), col("pos"))
    val pb = po.filter(col("tok") === termB)
      .select(col("doc_id").as("doc_id2"), col("pos").as("pos2"))
    val ph = pa.join(pb,
        pa("doc_id") === pb("doc_id2") && pa("pos") + 1 === pb("pos2"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_phrase"))
    val ord = Seq(col("n_phrase").desc, (col("tf_a") + col("tf_b")).desc,
      col("doc_id").asc)
    tf.join(ph, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_phrase"))
      .orderBy(ord: _*).limit(20)
      .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
      .select(col("rk").cast("int").as("rk"), col("doc_id"),
        col("tf_a"), col("tf_b"), col("n_phrase"))
  }

  /** Boolean + phrase search: AND("table","hash") ranked by exact
    * phrase "table hash" occurrences — the retrieval primitive behind
    * contamination checks and targeted corpus audits (find the docs
    * that actually SAY the thing, not just contain the vocabulary). */
  private def search(s: SparkSession, d: String): DataFrame =
    searchRank(Tables.documents(s, d).select(col("doc_id"), col("text")),
      SearchTermA, SearchTermB)

  private def searchSql: String =
    s"""WITH d AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws
       |    FROM documents),
       |po AS MATERIALIZED (SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id, unnest(ws) AS tok, unnest(range(0, len(ws))) AS pos
       |    FROM d)
       |  WHERE tok IN ('$SearchTermA', '$SearchTermB')),
       |tf AS (SELECT doc_id,
       |    sum(CASE WHEN tok = '$SearchTermA' THEN 1 ELSE 0 END) AS tf_a,
       |    sum(CASE WHEN tok = '$SearchTermB' THEN 1 ELSE 0 END) AS tf_b
       |  FROM po GROUP BY 1
       |  HAVING sum(CASE WHEN tok = '$SearchTermA' THEN 1 ELSE 0 END) > 0
       |    AND sum(CASE WHEN tok = '$SearchTermB' THEN 1 ELSE 0 END) > 0),
       |ph AS (SELECT a.doc_id, count(*) AS n_phrase
       |  FROM po a JOIN po b ON a.doc_id = b.doc_id
       |    AND a.tok = '$SearchTermA' AND b.tok = '$SearchTermB'
       |    AND a.pos + 1 = b.pos
       |  GROUP BY 1),
       |res AS (SELECT tf.doc_id, tf_a, tf_b,
       |    coalesce(n_phrase, 0) AS n_phrase
       |  FROM tf LEFT JOIN ph USING (doc_id)
       |  ORDER BY n_phrase DESC, tf_a + tf_b DESC, doc_id LIMIT 20)
       |SELECT CAST(row_number() OVER (ORDER BY n_phrase DESC,
       |    tf_a + tf_b DESC, doc_id) AS INT) AS rk, doc_id,
       |  CAST(tf_a AS BIGINT) AS tf_a, CAST(tf_b AS BIGINT) AS tf_b,
       |  CAST(n_phrase AS BIGINT) AS n_phrase
       |FROM res""".stripMargin

  // ----------------------------------------------------------------- defs

  // ---------------------------------------------------------------- kmv

  /** KMV sketch size — [[graft.functions.Kmv.K]], the constant shared
    * with the streaming face. 64 keeps the estimator's ±1/√k ≈ 12%
    * regime observable at gate scale (150 distinct users > k). */
  private val KmvK = graft.functions.Kmv.K

  /** K-minimum-values distinct sketch (Bar-Yossef et al., RANDOM 2002;
    * the theta-sketch family's deterministic core) — the SET-OPERATION
    * member beside `q_hll`: HLL registers cannot intersect, but KMV
    * sketches can, because the k smallest hashes of A∪B are a uniform
    * sample of the union that each side's full hash set can test for
    * membership. Per event_type: exact distinct count, KMV estimate
    * D̂ = (k−1)·2³²/h₍ₖ₎ (k-th smallest u32 hash as the quantile
    * estimate of hash density); plus one `click&view` row estimating
    * the INTERSECTION the theta way — S = k smallest of the union,
    * ρ = |S∩A∩B|/|S|, D̂∩ = ρ·D̂∪ — against the exact overlap. When a
    * scope has fewer than k distinct values the sketch IS the set and
    * every estimate collapses to exact (spec-pinned). Determinism:
    * the hash is the portable md5-u32; the k-minima are order-free;
    * both estimator divisions are integer `div`. Scale: the k-minima
    * ride the bounded [[graft.functions.TopKAggregate]] heap (k rows
    * per partition cross the wire, never the distinct sets); the
    * membership tests broadcast the ≤k-row sample against the hash
    * sets (equi semi-joins); the readout is three 1-row broadcasts. */
  private[graft] def kmvFrom(typedIds: DataFrame,
      pair: (String, String) = ("click", "view")): DataFrame = {
    import graft.functions.TopKAggregate.topk
    val h = typedIds
      .select(col("event_type"),
        graft.functions.Kmv.hash(col("user_id")).as("h"))
      .distinct()
      .localCheckpoint(true) // feeds per-type sketches + the pair path
    def estC = when(size(col("arr")) < KmvK, size(col("arr")).cast("long"))
      .otherwise(expr(s"(${KmvK - 1} * 4294967296) div " +
        s"element_at(arr, $KmvK).h"))
    val per = h.groupBy("event_type")
      .agg(topk(struct(col("h")), KmvK).as("arr"),
        count(lit(1)).as("n_exact"))
      .select(col("event_type").as("scope"), col("n_exact"),
        estC.as("n_est"))
    val ha = h.filter(col("event_type") === pair._1).select("h")
    val hb = h.filter(col("event_type") === pair._2).select("h")
    val sku = ha.union(hb).distinct()
      .agg(topk(struct(col("h")), KmvK).as("arr"), count(lit(1)).as("nu"))
      .localCheckpoint(true) // 1 row: the union sketch
    val sampleU = sku.select(explode(col("arr")).as("e"))
      .select(col("e.h").as("h")) // ≤ k rows
    val inA = ha.join(broadcast(sampleU), Seq("h"), "left_semi") // S∩A
    val m = hb.join(broadcast(inA), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("m")) // |S∩A∩B|
    val ni = hb.join(ha, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("ni")) // exact overlap
    val pairRow = broadcast(sku.select(estC.as("est_u"),
        when(col("nu") < KmvK, col("nu")).otherwise(lit(KmvK.toLong))
          .as("sz")))
      .crossJoin(broadcast(m)).crossJoin(broadcast(ni))
      .select(lit(s"${pair._1}&${pair._2}").as("scope"),
        col("ni").as("n_exact"),
        when(col("sz") === 0, 0L)
          .otherwise(expr("(m * est_u) div sz")).as("n_est"))
    per.unionByName(pairRow)
  }

  private val kmvSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    ${u32Sql("'kmv:'||CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |r AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS cnt
       |  FROM h),
       |per AS (SELECT event_type AS scope,
       |    CAST(max(cnt) AS BIGINT) AS n_exact,
       |    CASE WHEN max(cnt) < $KmvK THEN CAST(max(cnt) AS BIGINT)
       |         ELSE (${KmvK - 1} * 4294967296)
       |           // max(CASE WHEN rk = $KmvK THEN h END) END AS n_est
       |  FROM r GROUP BY 1),
       |hu AS (SELECT DISTINCT h FROM h
       |  WHERE event_type IN ('click', 'view')),
       |ru AS (SELECT h, row_number() OVER (ORDER BY h) AS rk,
       |    count(*) OVER () AS nu FROM hu),
       |uest AS (SELECT
       |    CASE WHEN max(nu) < $KmvK THEN CAST(max(nu) AS BIGINT)
       |         ELSE (${KmvK - 1} * 4294967296)
       |           // max(CASE WHEN rk = $KmvK THEN h END) END AS est_u,
       |    CASE WHEN max(nu) < $KmvK THEN CAST(max(nu) AS BIGINT)
       |         ELSE $KmvK END AS sz FROM ru),
       |ha AS (SELECT h FROM h WHERE event_type = 'click'),
       |hb AS (SELECT h FROM h WHERE event_type = 'view'),
       |m AS (SELECT count(*) AS m FROM ru
       |  WHERE rk <= $KmvK AND h IN (SELECT h FROM ha)
       |    AND h IN (SELECT h FROM hb)),
       |ni AS (SELECT count(*) AS ni FROM ha
       |  WHERE h IN (SELECT h FROM hb)),
       |pairrow AS (SELECT 'click&view' AS scope, ni AS n_exact,
       |    CASE WHEN COALESCE(sz, 0) = 0 THEN 0
       |         ELSE (m * est_u) // sz END AS n_est
       |  FROM m, ni, uest)
       |SELECT scope, n_exact, n_est FROM per
       |UNION ALL SELECT scope, n_exact, n_est FROM pairrow""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmv" -> ((s, d) => kmvFrom(Tables.events(s, d)
      .select(col("event_type"), col("user_id")))),
    "q_bloom_prune" -> ((s, d) => bloomPrune(s, d)),
    "q_bloom_prune_shuffle" -> ((s, d) => bloomPruneShuffle(s, d)),
    "q_hll" -> ((s, d) => hll(s, d)),
    "text_cms" -> ((s, d) => cms(s, d)),
    "text_winnow" -> ((s, d) => winnow(s, d)),
    "text_search" -> ((s, d) => search(s, d))
  )

  def oracles: Map[String, String] = Map(
    "q_kmv" -> kmvSql,
    "q_bloom_prune" -> bloomSql,
    "q_bloom_prune_shuffle" -> bloomShuffleSql,
    "q_hll" -> hllSql,
    "text_cms" -> cmsSql,
    "text_winnow" -> winnowSql,
    "text_search" -> searchSql
  )
}
