package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions.words

/** Learned-model kernels (round 11) — the three classic "train a tiny
  * model inside the engine" operators a data-curation pipeline runs
  * beside its statistics: item-item collaborative filtering (the
  * recommendation readout of the co-purchase data), histogram-based
  * decision-stump split search (the single step every gradient-boosted
  * tree repeats), and a multinomial Naive Bayes text classifier with a
  * held-out confusion matrix (the supervised twin of `lang_id`'s
  * heuristic). All three follow the pack's determinism discipline
  * (SURVEY §4): counts are exact integers; float arithmetic happens in
  * identical expression shapes in Spark and the oracle, is
  * floor-quantized to integer units BEFORE any reduction over
  * unordered groups (double addition is non-associative — a raw
  * float sum would hash differently run to run), and ranking uses the
  * quantized/rounded value. */
object LearnPack extends QueryPack {

  /** Per-customer basket-size cap for the pair generator. A power user
    * contributes C(n,2) pairs — quadratic noise concentrated on
    * exactly the rows least informative for item-item similarity (the
    * standard mitigation: drop or sample mega-users; Linden et al.,
    * IEEE Internet Computing 2003 §"scalability"). Dormant at gate
    * scale (max basket ≈ 40 parts) and documented here rather than
    * tuned: the cap keeps the self-join's per-key fan-out bounded at
    * ANY scale, the same discipline as dedup's frequent-key cap. */
  private val MaxBasket = 256

  /** Item-item collaborative filtering (Sarwar et al., WWW 2001;
    * Linden et al. 2003 — "customers who bought X also bought") over
    * customer purchase baskets: cosine similarity between parts under
    * the binary customer×part matrix, sim(u,v) = co(u,v)/√(n_u·n_v),
    * reported as top-5 recommendations for each of the 10
    * most-purchased anchor parts. Scale shape: the pair generator is
    * the basket self-join co-partitioned on the customer key with the
    * [[MaxBasket]] fan-out cap; co-counts with support < 2 are pruned
    * before the similarity math (a single shared customer is noise,
    * q_triangles' support cut); the anchor set is a 10-row broadcast,
    * so the per-anchor rank window orders ≤ anchors×neighbors rows,
    * never the full pair table. The only floats are one √ and one
    * division per surviving pair — single IEEE ops on exact integers,
    * identical in any engine — and ranking uses the ROUNDED score
    * (ties to the smaller part key). */
  private def recsItemItem(s: SparkSession, d: String): DataFrame = {
    val baskets = orders(s, d)
      .select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
        col("l_partkey").as("p")), "o_orderkey")
      .select("c", "p").distinct()
    val capped = baskets.join(
      baskets.groupBy("c").agg(count(lit(1)).as("bs"))
        .where(col("bs") <= MaxBasket).select("c"),
      Seq("c"), "left_semi")
      .localCheckpoint(true) // feeds item counts + both pair sides
    val cnt = capped.groupBy("p").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.c") === col("b.c") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("co"))
      .where(col("co") >= 2)
    val anchors = cnt.orderBy(col("n").desc, col("p")).limit(10)
      .select(col("p").as("anchor"), col("n").as("n_anchor"))
    val sym = pairs.select(col("u").as("anchor"), col("v").as("rec"), col("co"))
      .union(pairs.select(col("v"), col("u"), col("co")))
    val scored = sym.join(broadcast(anchors), "anchor")
      .join(cnt.select(col("p").as("rec"), col("n").as("n_rec")), "rec")
      .withColumn("score",
        round(col("co") / sqrt(col("n_anchor") * col("n_rec")), 4))
    scored.withColumn("rk", row_number().over(Window.partitionBy("anchor")
        .orderBy(col("score").desc, col("rec"))))
      .where(col("rk") <= 5)
      .select(col("anchor"), col("rk").cast("int").as("rk"), col("rec"),
        col("co"), col("n_anchor"), col("n_rec"), col("score"))
  }

  /** NDCG@k cut-off and the 1e-6-quantized discounted gains
    * 1/log₂(rank+1), precomputed in Scala and inlined as LITERALS in
    * both engines — the trained-artifact discipline applied to the
    * gain table, sidestepping any engine-log₂ divergence. */
  private val NdcgK = 10
  private val NdcgGainQ: Seq[Long] = (1 to NdcgK).map(r =>
    math.floor(1e6 / (math.log(r + 1) / math.log(2))).toLong)

  /** Leave-last-order-out NDCG@10 of the item-item recommender
    * (Järvelin & Kekäläinen, TOIS 2002; the offline-eval loop of
    * Linden et al. 2003) — `q_recs_itemitem`'s EVAL twin, the
    * dedup_eval/ann_recall discipline applied to the recommender: is
    * the similarity model predictive at all, measured before anyone
    * trusts its recommendations. Protocol: each customer's LAST order
    * (max date, then max key) is held out; the model trains on their
    * EARLIER baskets only (no leakage); the test item is the held-out
    * order's smallest NOVEL part (customers with no earlier baskets
    * or no novel item drop — binary CF cannot score re-purchase);
    * each customer is scored by Σ-of-similarities recommendations
    * over their train items (owned items excluded), and with one
    * relevant item NDCG@10 per customer is 1/log₂(rank+1) on a hit,
    * 0 on a miss. One row: n_eval, n_hit, hit_rate, mean NDCG.
    * Determinism: similarities quantize to 1e-6 integer units per
    * PAIR before the per-customer candidate sum (§4 float-sum rule),
    * ranking is (score desc, part asc) on integers, gains are the
    * inlined [[NdcgGainQ]] literals, the final two divisions are
    * single float ops. Scale: training pairs are the capped basket
    * self-join (recsItemItem's shape); per-customer candidates are
    * train-items × neighbors joins on the item key; the top-10 ride
    * the bounded TopKStructs heap (k rows per partition, never a
    * sort); the readout is a 1-row fold. */
  private def ndcg(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TopKAggregate.topk
    val bk = orders(s, d)
      .select(col("o_orderkey").as("o"), col("o_custkey").as("c"),
        col("o_orderdate").as("od"))
      .join(lineitem(s, d).select(col("l_orderkey").as("o"),
        col("l_partkey").as("p")), "o")
      .select("c", "o", "od", "p").distinct()
      .localCheckpoint(true) // feeds the last-order split + both sides
    val lastO = bk.select("c", "o", "od").distinct()
      .withColumn("rn", row_number().over(Window.partitionBy("c")
        .orderBy(col("od").desc, col("o").desc)))
      .where(col("rn") === 1).select(col("c"), col("o").as("lo"))
    val train = bk.join(lastO, "c").where(col("o") =!= col("lo"))
      .select("c", "p").distinct()
    val capped = train.join(
        train.groupBy("c").agg(count(lit(1)).as("bs"))
          .where(col("bs") <= MaxBasket).select("c"),
        Seq("c"), "left_semi")
      .localCheckpoint(true) // the model's train set, scanned 4 ways
    val test = bk.join(lastO, "c").where(col("o") === col("lo"))
      .select("c", "p")
      .join(capped, Seq("c", "p"), "left_anti") // novel items only
      .join(capped.select("c").distinct(), Seq("c"), "left_semi")
      .groupBy("c").agg(min("p").as("tp"))
      .localCheckpoint(true)
    val cnt = capped.groupBy("p").agg(count(lit(1)).as("n"))
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.c") === col("b.c") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("co"))
      .where(col("co") >= 2)
    val sym = pairs.select(col("u").as("t"), col("v").as("r"), col("co"))
      .union(pairs.select(col("v"), col("u"), col("co")))
    val simq = sym
      .join(cnt.select(col("p").as("t"), col("n").as("nu")), "t")
      .join(cnt.select(col("p").as("r"), col("n").as("nv")), "r")
      .select(col("t"), col("r"),
        floor(col("co") / sqrt(col("nu") * col("nv")) * 1e6)
          .cast("long").as("sq"))
    val cand = capped.select(col("c"), col("p").as("t"))
      .join(simq, "t")
      .groupBy("c", "r").agg(sum("sq").as("score"))
      .join(capped.select(col("c"), col("p").as("r")), Seq("c", "r"),
        "left_anti") // never recommend an owned item
    val recs = cand.groupBy("c")
      .agg(topk(struct((-col("score")).as("ns"), col("r")), NdcgK)
        .as("arr"))
      .select(col("c"), posexplode(col("arr")))
      .select(col("c"), (col("pos") + 1).as("rk"), col("col.r").as("r"))
    val gain = NdcgGainQ.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (g, i)) => when(col("rk") === (i + 1), g).otherwise(acc)
    }
    test.join(recs, test("c") === recs("c") && test("tp") === recs("r"),
        "left")
      .select(test("c"), col("rk"))
      .agg(count(lit(1)).as("n_eval"), count(col("rk")).as("n_hit"),
        sum(coalesce(gain, lit(0L))).as("gq"))
      .select(col("n_eval"), col("n_hit"),
        when(col("n_eval") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double")
            / col("n_eval"), 4)).as("hit_rate"),
        when(col("n_eval") === 0, lit(null).cast("double"))
          .otherwise(round(col("gq").cast("double")
            / (lit(1e6) * col("n_eval")), 6)).as("ndcg"))
  }

  private val ndcgSql: String = {
    val gains = NdcgGainQ.zipWithIndex
      .map { case (g, i) => s"WHEN ${i + 1} THEN $g" }.mkString(" ")
    s"""WITH bk AS (SELECT DISTINCT o.o_custkey AS c, o.o_orderkey AS o,
       |    o.o_orderdate AS od, l.l_partkey AS p
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |lasto AS (SELECT c, o AS lo FROM (
       |    SELECT c, o, row_number() OVER (PARTITION BY c
       |      ORDER BY od DESC, o DESC) AS rn
       |    FROM (SELECT DISTINCT c, o, od FROM bk)) WHERE rn = 1),
       |train AS (SELECT DISTINCT b.c, b.p FROM bk b
       |  JOIN lasto lo ON b.c = lo.c WHERE b.o <> lo.lo),
       |capped AS MATERIALIZED (SELECT c, p FROM train
       |  WHERE c IN (SELECT c FROM train GROUP BY c
       |              HAVING count(*) <= $MaxBasket)),
       |test AS (SELECT b.c, min(b.p) AS tp FROM bk b
       |  JOIN lasto lo ON b.c = lo.c AND b.o = lo.lo
       |  WHERE NOT EXISTS (SELECT 1 FROM capped t
       |      WHERE t.c = b.c AND t.p = b.p)
       |    AND EXISTS (SELECT 1 FROM capped t WHERE t.c = b.c)
       |  GROUP BY 1),
       |cnt AS (SELECT p, count(*) AS n FROM capped GROUP BY 1),
       |pairs AS (SELECT a.p AS u, b.p AS v, count(*) AS co
       |  FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |sym AS (SELECT u AS t, v AS r, co FROM pairs
       |  UNION ALL SELECT v, u, co FROM pairs),
       |simq AS (SELECT s.t, s.r,
       |    CAST(floor(s.co / sqrt(cu.n * cv.n) * 1e6) AS BIGINT) AS sq
       |  FROM sym s JOIN cnt cu ON cu.p = s.t
       |  JOIN cnt cv ON cv.p = s.r),
       |cand AS (SELECT tr.c, sq.r, CAST(sum(sq.sq) AS BIGINT) AS score
       |  FROM capped tr JOIN simq sq ON sq.t = tr.p
       |  WHERE NOT EXISTS (SELECT 1 FROM capped t2
       |      WHERE t2.c = tr.c AND t2.p = sq.r)
       |  GROUP BY 1, 2),
       |recs AS (SELECT c, r, rk FROM (
       |    SELECT c, r, row_number() OVER (PARTITION BY c
       |      ORDER BY score DESC, r) AS rk FROM cand)
       |  WHERE rk <= $NdcgK),
       |hits AS (SELECT te.c, re.rk FROM test te
       |  LEFT JOIN recs re ON re.c = te.c AND re.r = te.tp)
       |SELECT CAST(count(*) AS BIGINT) AS n_eval,
       |  CAST(count(rk) AS BIGINT) AS n_hit,
       |  CASE WHEN count(*) = 0 THEN NULL
       |    ELSE round(CAST(count(rk) AS DOUBLE) / count(*), 4)
       |    END AS hit_rate,
       |  CASE WHEN count(*) = 0 THEN NULL
       |    ELSE round(CAST(sum(COALESCE(
       |      CASE rk $gains ELSE 0 END, 0)) AS DOUBLE)
       |      / (1e6 * count(*)), 6) END AS ndcg
       |FROM hits""".stripMargin
  }

  /** Decision-stump split search over pre-binned integer features —
    * the histogram split step at the heart of every gradient-boosted
    * tree learner (CART: Breiman et al. 1984; the histogram
    * formulation is LightGBM's, Ke et al. NIPS 2017): for label
    * `l_returnflag = 'R'` and features quantity (already integer) and
    * discount (integer cents), score every candidate threshold t by
    * Gini impurity reduction of the `feature ≤ t` split. The entire
    * search runs on ONE histogram per feature (value → (n, n_pos) hash
    * agg, map-side combined — bins, not rows, cross the exchange;
    * ~50 quantity bins at ANY data size), cumulated with a per-feature
    * ordered window, so cost is corpus-scan + bins·log(bins). The
    * gain arithmetic is the identical expression tree over exact
    * integer counts in both engines; ranking uses the ROUNDED gain
    * (ties feature asc, threshold asc). Output: top-10 candidate
    * splits across both features. */
  private def stump(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(
      floor(col("l_quantity")).cast("long").as("qty"),
      floor(col("l_discount") * 100).cast("long").as("disc"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val feats = li
      .select(lit("root").as("branch"), lit("quantity").as("feature"),
        col("qty").as("v"), col("y"))
      .union(li.select(lit("root"), lit("discount"), col("disc"), col("y")))
    val nr = col("nt") - col("nl")
    val posr = col("post") - col("posl")
    splitGains(feats)
      .orderBy(col("gain").desc, col("feature"), col("v")).limit(10)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("gain").desc, col("feature"), col("v"))))
      .select(col("rk").cast("int").as("rk"), col("feature"),
        col("v").as("threshold"), col("nl"), nr.as("nr"),
        col("posl"), posr.as("posr"), col("gain"))
  }

  /** Histogram split-candidate table for [[stump]]/[[tree2]]: per
    * (branch, feature, bin value) the cumulative left counts and the
    * branch totals, gain-scored. Counts are exact integers; the Gini
    * gain is the identical expression tree in both engines over those
    * integers, rounded to 8 places for ranking. The window partitions
    * by (branch, feature) — bins-sized, never rows-sized. */
  private def splitGains(feats: DataFrame): DataFrame = {
    val hist = feats.groupBy("branch", "feature", "v")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
    val w = Window.partitionBy("branch", "feature").orderBy("v")
    val wt = Window.partitionBy("branch", "feature")
    val cum = hist
      .withColumn("nl", sum("n").over(w))
      .withColumn("posl", sum("pos").over(w))
      .withColumn("nt", sum("n").over(wt))
      .withColumn("post", sum("pos").over(wt))
      .where(col("nl") < col("nt"))
    def gini(p: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      lit(1.0) - (p / n) * (p / n) - ((n - p) / n) * ((n - p) / n)
    val nr = col("nt") - col("nl")
    val posr = col("post") - col("posl")
    val gain = gini(col("post"), col("nt")) -
      (col("nl") / col("nt")) * gini(col("posl"), col("nl")) -
      (nr / col("nt")) * gini(posr, nr)
    cum.withColumn("gain", round(gain, 8))
  }

  /** Depth-2 greedy CART tree (Breiman et al. 1984) — `q_stump`'s
    * split search applied RECURSIVELY, the shape every tree learner
    * repeats: find the best root split over the binned features, send
    * every row down its side, and re-run the search independently
    * inside each branch. Output: the three split nodes (root, left,
    * right) with their chosen (feature, threshold), partition counts
    * and gain. Fully declarative — the root pick is an ORDER BY/LIMIT-1
    * single row CROSS-JOINED back onto the data (km_bisect's
    * scalar-subquery idiom; no driver collect anywhere), so the second
    * level's branch column is one broadcast comparison per row. Scale:
    * two corpus scans (root histogram, branch histograms); only
    * bins × branches rows ever cross an exchange; the windows
    * partition by (branch, feature). Determinism: q_stump's — exact
    * integer counts, identical gain expression, rounded-gain ranking
    * with (feature, v) tie-breaks at every pick. */
  private def tree2(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(
      floor(col("l_quantity")).cast("long").as("qty"),
      floor(col("l_discount") * 100).cast("long").as("disc"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .localCheckpoint(true) // scanned by the root and branch searches
    tree2From(li)
  }

  /** The kernel over any (qty, disc, y) frame — public to the test JVM
    * for the planted-tree gate. */
  private[graft] def tree2From(li: DataFrame): DataFrame = {
    def feats(df: DataFrame) = df
      .select(col("branch"), lit("quantity").as("feature"),
        col("qty").as("v"), col("y"))
      .union(df.select(col("branch"), lit("discount"),
        col("disc"), col("y")))
    val root = splitGains(feats(li.withColumn("branch", lit("root"))))
      .orderBy(col("gain").desc, col("feature"), col("v")).limit(1)
      .localCheckpoint(true) // 1 row: feeds the branch column + output
    val branched = li.crossJoin(broadcast(
        root.select(col("feature").as("rf"), col("v").as("rt"))))
      .withColumn("branch",
        when(when(col("rf") === "quantity", col("qty"))
          .otherwise(col("disc")) <= col("rt"), "left").otherwise("right"))
    val best = splitGains(feats(branched))
      .withColumn("rk", row_number().over(Window.partitionBy("branch")
        .orderBy(col("gain").desc, col("feature"), col("v"))))
      .where(col("rk") === 1)
    val out = root.withColumn("rk", lit(1)).unionByName(best)
    out.select(col("branch").as("node"), col("feature"),
      col("v").as("threshold"), col("nl"),
      (col("nt") - col("nl")).as("nr"), col("posl"),
      (col("post") - col("posl")).as("posr"), col("gain"))
  }

  /** Depth-k greedy CART (round 11, closing the round-12 candidate
    * list's "per-branch depth-k tree") — [[tree2From]]'s recursion as a
    * FOLD over levels: level l holds ≤ 2^l branch nodes addressed by
    * their root-to-node path ("root", then "L"/"R", "LL"/"LR"/…), each
    * level is ONE histogram pass over the whole corpus (the branch key
    * simply joins the groupBy — bins × branches rows cross the
    * exchange, never data rows), and routing to the next level is one
    * broadcast join against the ≤ 2^l picked splits. A PURE or
    * single-valued branch contributes no split candidate (`nl < nt`
    * never holds) and silently disappears — the tree's leaves are the
    * absent paths, the same convention both engines derive
    * independently. Scale: depth scans, not 2^depth — the level pass
    * is branch-parallel by construction (LightGBM's level-wise growth,
    * Ke et al. NIPS 2017); driver state is the ≤ 2^l-row pick table
    * per level. Determinism: q_stump's throughout — exact integer
    * counts, shared gain expression, rounded-gain (feature, v)
    * tie-broken picks at every node. */
  private[graft] def treeDeepFrom(li: DataFrame, depth: Int): DataFrame = {
    def feats(df: DataFrame) = df
      .select(col("branch"), lit("quantity").as("feature"),
        col("qty").as("v"), col("y"))
      .union(df.select(col("branch"), lit("discount"),
        col("disc"), col("y")))
    var cur = li.withColumn("branch", lit("root"))
    val picks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (lvl <- 0 until depth) {
      val best = splitGains(feats(cur))
        .withColumn("rk", row_number().over(Window.partitionBy("branch")
          .orderBy(col("gain").desc, col("feature"), col("v"))))
        .where(col("rk") === 1)
        .localCheckpoint(true) // <= 2^lvl rows: feeds routing + output
      picks += best
      if (lvl < depth - 1)
        cur = cur.join(broadcast(best.select(col("branch"),
            col("feature").as("bf"), col("v").as("bt"))), "branch")
          .withColumn("branch", concat(
            when(col("branch") === "root", lit("")).otherwise(col("branch")),
            when(when(col("bf") === "quantity", col("qty"))
              .otherwise(col("disc")) <= col("bt"), lit("L"))
              .otherwise(lit("R"))))
          .drop("bf", "bt")
    }
    picks.reduce(_ unionByName _)
      .select(col("branch").as("node"), col("feature"),
        col("v").as("threshold"), col("nl"),
        (col("nt") - col("nl")).as("nr"), col("posl"),
        (col("post") - col("posl")).as("posr"), col("gain"))
  }

  private def tree3(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(
      floor(col("l_quantity")).cast("long").as("qty"),
      floor(col("l_discount") * 100).cast("long").as("disc"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .localCheckpoint(true) // scanned once per level
    treeDeepFrom(li, 3)
  }

  /** Quantization grain for NB log-probabilities: 2^20 units per bit.
    * Each (class, token) log-likelihood is floor-quantized ONCE in the
    * model table; every per-document reduction after that is exact
    * integer addition (order-free), text_ppl_bigram's discipline. */
  private val NbGrain = 1048576L

  /** Multinomial Naive Bayes language classifier with Laplace
    * smoothing (the standard formulation — McCallum & Nigam, AAAI-98
    * workshop), trained and evaluated inside the engine: train on
    * `doc_id % 5 ≠ 0`, score the held-out 20%, report the
    * language confusion matrix. The float work is confined to the
    * MODEL table — q(c,w) = ⌊2²⁰·log₂((cnt+1)/(tot_c+V))⌋ per
    * observed (class, token) plus one unseen-token default per class
    * and one prior per class — vocab-sized, computed once; document
    * scoring is then integer: score(d,c) = prior_q(c) + Σ n_w·q(c,w),
    * and the argmax is ONE integer `min` over
    * key = (2⁴⁶ − score)·8 + class_idx (score ∈ (−2⁴⁶, 0], idx < 8 —
    * q_label_prop's encode-the-tiebreak trick; exact in a long).
    * Scale shape: the model build is a (class, token) hash agg; the
    * test-side join explodes test tokens × |classes| (a 5-row
    * broadcast) and probes the model table on (token, class) — fan-out
    * = class count, bounded; the confusion matrix is a final
    * 25-cell agg. The synthetic corpus shares one tech vocabulary
    * across language labels, so the MEASURED matrix is mostly-majority
    * — that imbalance is the finding the operator exists to surface
    * (the spec proves separability on a corpus that has it). */
  private def naiveBayes(s: SparkSession, d: String): DataFrame =
    naiveBayesFrom(documents(s, d)
      .select(col("doc_id"), col("lang"), words(col("text")).as("w")))

  /** Train the NB model from a (doc_id, lang, tok) occurrence frame:
    * returns (model, classStats) — model(cls, tok, q) with the
    * quantized log-likelihood per OBSERVED (class, token), and
    * classStats(cls, cls_idx, q_unseen, prior_q) with the per-class
    * unseen-token default and log-prior. Both are exactly what the
    * streaming scorer ([[graft.streaming.StreamingOps.nbScoreStream]])
    * consumes — train offline, serve online, one arithmetic. */
  private[graft] def nbModel(train: DataFrame): (DataFrame, DataFrame) = {
    val vocabN = train.select("tok").distinct().agg(count(lit(1)).as("vn"))
    // 0-BASED class index: the argmax encodes key·8 + cls_idx and
    // decodes via pmod(key, 8), so a 1-based index wrapped idx=8 to 0
    // and silently dropped the 8th class's predictions — 0-based makes
    // the documented 8-class bound real (idx ∈ 0..7, matching the
    // streaming scorer's `idx < 8` require)
    val classes = train.select(col("lang").as("cls")).distinct()
      .withColumn("cls_idx",
        (row_number().over(Window.orderBy("cls")) - 1).cast("long"))
    val totals = train.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("tot"))
    val priorsRaw = train.select("doc_id", "lang").distinct()
      .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("nd"))
    val ndocs = priorsRaw.agg(sum("nd").as("ndt"))
    val model = train.groupBy(col("lang").as("cls"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .join(totals, "cls").crossJoin(broadcast(vocabN))
      .select(col("cls"), col("tok"),
        floor(log2((col("cnt") + 1).cast("double") / (col("tot") + col("vn")))
          * NbGrain).cast("long").as("q"))
      .localCheckpoint(true)
    val classStats = totals.crossJoin(broadcast(vocabN))
      .join(priorsRaw, "cls").crossJoin(broadcast(ndocs))
      .join(classes, "cls")
      .select(col("cls"), col("cls_idx"),
        floor(log2(lit(1.0) / (col("tot") + col("vn"))) * NbGrain)
          .cast("long").as("q_unseen"),
        floor(log2(col("nd").cast("double") / col("ndt")) * NbGrain)
          .cast("long").as("prior_q"))
      .localCheckpoint(true)
    (model, classStats)
  }

  /** Per-document predictions over the held-out split: (doc_id, lang,
    * pred). Public so the streaming spec can assert batch/stream
    * prediction equality document by document. */
  private[graft] def nbPredictions(docsW: DataFrame): DataFrame = {
    val toks = docsW
      .select(col("doc_id"), col("lang"), explode(col("w")).as("tok"))
      .localCheckpoint(true) // feeds model build + test scoring
    val (model, classStats) = nbModel(toks.where(col("doc_id") % 5 =!= 0))
    val test = toks.where(col("doc_id") % 5 === 0)
    val testCounts = test.groupBy("doc_id", "lang", "tok")
      .agg(count(lit(1)).as("n"))
    val scored = testCounts
      .crossJoin(broadcast(classStats))
      .join(model, Seq("cls", "tok"), "left")
      .groupBy(col("doc_id"), col("lang"), col("cls"), col("cls_idx"),
        col("prior_q"))
      .agg(sum(col("n") * coalesce(col("q"), col("q_unseen"))).as("ll"))
      .select(col("doc_id"), col("lang"),
        ((lit(70368744177664L) - col("prior_q") - col("ll")) * 8
          + col("cls_idx")).as("key"))
    scored.groupBy("doc_id", "lang")
      .agg(min("key").as("mk"))
      .select(col("doc_id"), col("lang"),
        pmod(col("mk"), lit(8L)).as("cls_idx"))
      .join(broadcast(classStats.select("cls", "cls_idx")), "cls_idx")
      .select(col("doc_id"), col("lang"), col("cls").as("pred"))
  }

  /** The train/score kernel over any (doc_id, lang, w[]) frame —
    * public to the test JVM so the spec can gate it on a separable
    * hand corpus. */
  private[graft] def naiveBayesFrom(docsW: DataFrame): DataFrame =
    nbPredictions(docsW)
      .groupBy(col("lang").as("true_lang"), col("pred").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** kNN-classify knobs: neighborhood radius cap (= grid cell side)
    * and k. eps is wider than LOF's 0.03 so most held-out points see a
    * full k-vote at gate scale; the argmax encoding is q_label_prop's
    * single-min integer key. */
  private val KnnEps = 0.06
  private val KnnK = 5

  /** Radius-capped grid-blocked kNN majority-vote classification
    * (Cover & Hart 1967; the blocked search is dbscan_grid/q_lof's
    * 3×3 discipline) over labelled 2-D points — the non-parametric
    * classifier beside `q_naive_bayes`: an 80/20 seedless md5 split,
    * each held-out point takes the majority label of its k nearest
    * TRAINING points within eps, and the readout is the confusion
    * census (true label × predicted label → count) — the
    * accuracy-by-class view a curation pipeline checks before trusting
    * auto-labels. Points with fewer than k in-radius training
    * neighbors ABSTAIN (pred = −1): under a radius cap they are
    * sparse-region outliers by construction (q_lof's rim semantics),
    * and a defensible classifier refuses rather than guesses there.
    * Determinism: the neighbor set is exactly k under the (d², id)
    * tie-break; the vote argmax is ONE integer min over
    * key = (2²⁰ − cnt)·2³² + label (count desc, label asc — cnt ≤ k,
    * label < 2³², exact in a long both engines); the only float op is
    * the d² compare, identical doubles both engines. Scale: test
    * points explode ×9 probes and join train on the cell key (equi —
    * candidates ∝ local density, never |test|×|train|); the vote path
    * ships (tid, label) pairs bounded by k per test point; the census
    * is one hash agg. The ORACLE brute-forces all test×train pairs,
    * so the grid blocking's completeness is itself hash-gated
    * (dbscan_grid's discipline). Measured gate-scale readout: the
    * synthetic labels are NOT clustered in the 2-D embedding
    * projection, so accuracy sits at chance (~7.6% over 10 classes) —
    * which is exactly what the census is for: it tells you a feature
    * space does not predict the label BEFORE auto-labels ship
    * (LearnPackSpec plants separable blobs and reads 100%). */
  private[graft] def knnClassifyGrid(pts: DataFrame, eps: Double = KnnEps,
      k: Int = KnnK): DataFrame = {
    val offs = Seq(-1L, 0L, 1L)
    val sp = pmod(conv(substring(md5(concat(lit("knn:"),
      col("id").cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(10L))
    val p = pts.select(col("id"), col("x"), col("y"),
        col("label").cast("long").as("lbl"), sp.as("sp"),
        floor(col("x") / eps).cast("long").as("cx"),
        floor(col("y") / eps).cast("long").as("cy"))
      .localCheckpoint(true) // feeds both split sides
    val tr = p.where(col("sp") < 8)
    val te = p.where(col("sp") >= 8)
    val probes = te.select(col("id").as("tid"), col("x").as("xb"),
        col("y").as("yb"), col("lbl").as("lb"),
        explode(array(offs.flatMap(dx => offs.map(dy =>
          struct((col("cx") + dx).as("px"), (col("cy") + dy).as("py"))))
          : _*)).as("c"))
      .select(col("tid"), col("xb"), col("yb"), col("lb"),
        col("c.px"), col("c.py"))
    val dx = col("x") - col("xb")
    val dy = col("y") - col("yb")
    val ranked = tr.join(probes,
        col("cx") === col("px") && col("cy") === col("py"))
      .where(dx * dx + dy * dy <= expr(s"$eps * $eps"))
      .select(col("tid"), col("lb"), col("lbl").as("nl"),
        (dx * dx + dy * dy).as("d2"), col("id").as("nid"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("tid").orderBy(col("d2"), col("nid"))))
      .where(col("rk") <= k)
      .localCheckpoint(true) // feeds the full-vote filter + the votes
    val full = ranked.groupBy("tid").agg(count(lit(1)).as("nn"))
      .where(col("nn") === k).select("tid")
    val voted = ranked.join(full, "tid")
      .groupBy("tid", "lb", "nl").agg(count(lit(1)).as("c"))
      .groupBy("tid", "lb")
      .agg(min((lit(1048576L) - col("c")) * lit(4294967296L) + col("nl"))
        .as("ky"))
      .select(col("tid"), col("lb"), pmod(col("ky"), lit(4294967296L))
        .as("pred"))
    val abstain = te.select(col("id").as("tid"), col("lbl").as("lb"))
      .join(voted.select("tid"), Seq("tid"), "left_anti")
      .withColumn("pred", lit(-1L))
    voted.unionByName(abstain)
      .groupBy(col("lb").as("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
  }

  private def knnClassify(s: SparkSession, d: String): DataFrame =
    knnClassifyGrid(embeddings(s, d).select(col("vec_id").as("id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"),
      col("label")))

  private val knnSql: String =
    s"""WITH p AS (SELECT vec_id AS id,
       |    CAST(embedding[1] AS DOUBLE) AS x,
       |    CAST(embedding[2] AS DOUBLE) AS y,
       |    CAST(label AS BIGINT) AS lbl,
       |    CAST(('0x'||substr(md5('knn:'||CAST(vec_id AS VARCHAR)),1,8))
       |      AS BIGINT) % 10 AS sp
       |  FROM embeddings),
       |tr AS (SELECT * FROM p WHERE sp < 8),
       |te AS (SELECT * FROM p WHERE sp >= 8),
       |kn AS (SELECT * FROM (
       |    SELECT te.id AS tid, te.lbl AS lb, tr.lbl AS nl,
       |      (tr.x-te.x)*(tr.x-te.x)+(tr.y-te.y)*(tr.y-te.y) AS d2,
       |      tr.id AS nid,
       |      row_number() OVER (PARTITION BY te.id
       |        ORDER BY (tr.x-te.x)*(tr.x-te.x)+(tr.y-te.y)*(tr.y-te.y),
       |          tr.id) AS rk
       |    FROM te, tr
       |    WHERE (tr.x-te.x)*(tr.x-te.x)+(tr.y-te.y)*(tr.y-te.y)
       |      <= $KnnEps * $KnnEps)
       |  WHERE rk <= $KnnK),
       |full_v AS (SELECT tid FROM kn GROUP BY 1
       |  HAVING count(*) = $KnnK),
       |votes AS (SELECT kn.tid, kn.lb, kn.nl, count(*) AS c
       |  FROM kn JOIN full_v USING (tid) GROUP BY 1, 2, 3),
       |pred AS (SELECT tid, lb,
       |    (min((1048576 - c) * 4294967296 + nl)) % 4294967296 AS pred
       |  FROM votes GROUP BY 1, 2),
       |abst AS (SELECT id AS tid, lbl AS lb, CAST(-1 AS BIGINT) AS pred
       |  FROM te WHERE id NOT IN (SELECT tid FROM pred))
       |SELECT lb AS label, pred, count(*) AS n
       |FROM (SELECT * FROM pred UNION ALL SELECT * FROM abst)
       |GROUP BY 1, 2""".stripMargin

  /** Exact ROC AUC via the rank-sum identity (Hanley & McNeil 1982:
    * AUC = U/(n₁n₀), U the Mann–Whitney statistic) with tie-corrected
    * doubled mid-ranks — the threshold-free companion to
    * [[knnClassifyGrid]]'s fixed-threshold confusion census: does a
    * SCORE rank positives above negatives at all, before any cutoff
    * is chosen. Evaluated on "does event value rank purchases above
    * views" (chance at gate scale — like the kNN census, a measured
    * no-signal finding is the point of running the audit). One row:
    * counts, the doubled U (exact BIGINT — mid-ranks enter doubled so
    * ties never produce .5 floats, q_mann_whitney's discipline), AUC
    * and the Gini coefficient 2·AUC−1, each ONE final division.
    * Degenerate single-class input reports NULL rather than an ANSI
    * divide-by-zero. Scale: the rank pass groups by DISTINCT score
    * first (ties collapse — the window sorts score-cardinality rows,
    * not data rows), then one global cumulative window + a 1-row
    * fold; the mann_whitney trade, stated there. */
  private[graft] def aucFrom(scored: DataFrame): DataFrame = {
    val perVal = scored.groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("cnt_p"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perVal
      .withColumn("cumb", sum("cnt").over(w) - col("cnt"))
      .withColumn("rank2", lit(2) * col("cumb") + col("cnt") + 1)
    val agg = ranked.agg(sum("cnt").as("n"), sum("cnt_p").as("n_pos"),
      sum(col("cnt_p") * col("rank2")).as("r2p"))
    val n0 = col("n") - col("n_pos")
    val u2 = col("r2p") - col("n_pos") * (col("n_pos") + 1)
    val denom2 = lit(2.0) * col("n_pos").cast("double") * n0.cast("double")
    agg.select(col("n_pos"), n0.as("n_neg"), u2.as("u2"),
      when(col("n_pos") === 0 || n0 === 0, lit(null).cast("double"))
        .otherwise(round(u2.cast("double") / denom2, 6)).as("auc"),
      when(col("n_pos") === 0 || n0 === 0, lit(null).cast("double"))
        .otherwise(round(u2.cast("double") / denom2 * 2.0 - 1.0, 6))
        .as("gini"))
  }

  private val aucSql: String =
    """WITH sc AS (SELECT value AS score,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |pv AS (SELECT score, count(*) AS cnt, sum(pos) AS cnt_p
      |  FROM sc GROUP BY 1),
      |rk AS (SELECT *,
      |    sum(cnt) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
      |      AS cumb FROM pv),
      |ag AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(cnt_p) AS BIGINT) AS n_pos,
      |    CAST(sum(cnt_p * (2 * cumb + cnt + 1)) AS BIGINT) AS r2p
      |  FROM rk)
      |SELECT n_pos, n - n_pos AS n_neg,
      |  r2p - n_pos * (n_pos + 1) AS u2,
      |  CASE WHEN n_pos = 0 OR n = n_pos THEN NULL
      |    ELSE round(CAST(r2p - n_pos * (n_pos + 1) AS DOUBLE)
      |      / (2.0 * n_pos * (n - n_pos)), 6) END AS auc,
      |  CASE WHEN n_pos = 0 OR n = n_pos THEN NULL
      |    ELSE round(CAST(r2p - n_pos * (n_pos + 1) AS DOUBLE)
      |      / (2.0 * n_pos * (n - n_pos)) * 2.0 - 1.0, 6) END AS gini
      |FROM ag""".stripMargin

  /** Reliability diagram + Expected Calibration Error (Naeini, Cooper
    * & Hauskrecht AAAI 2015's ECE over the classic reliability curve,
    * DeGroot & Fienberg 1983) — the "are the probabilities RIGHT"
    * audit completing the eval family: `q_auc` asks whether a score
    * RANKS positives first; calibration asks whether a score read as
    * a probability MEANS what it says (a model can be AUC-perfect and
    * calibration-useless — temperature scaling exists because of this
    * gap). Ten equal-width bins over p̂; per bin n, positives,
    * confidence (mean p̂), accuracy, |gap|, plus the global
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b| on every row. Determinism: p̂
    * floor-quantizes to 2²⁰ integer units PER ROW before any sum, and
    * the per-bin gap folds to the EXACT integer |n_pos·2²⁰ − Σp̂_q|
    * (acc−conf over a common denominator — no float subtraction
    * anywhere), so ECE's numerator is an exact integer sum and every
    * emitted float is ONE division, rounded. Sums and the n_pos·2²⁰
    * product run in DECIMAL(38,0): at 10¹²-row scale both pass
    * BIGINT's edge. Scale shape: one corpus scan → 10-bin hash agg →
    * a 10-row global window (bounded by the bin domain, never rows).
    * Gate framing per q_auc: the proxy score value/100 is measured
    * mostly-uncalibrated — the audit exists to SAY that. */
  private[graft] def calibrationFrom(scored: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val q = scored.select(
      least(lit(9L), floor(col("phat") * 10).cast("long")).as("bin"),
      floor(col("phat") * 1048576).cast("long").as("pq"), col("pos"))
    val bins = q.groupBy("bin").agg(count(lit(1)).as("n"),
      sum("pos").as("n_pos"), sum(col("pq").cast(dec)).as("spq"))
    val w = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bins
      .withColumn("gap_num",
        abs(col("n_pos").cast(dec) * 1048576 - col("spq")))
      .withColumn("ece_num", sum("gap_num").over(w))
      .withColumn("n_all", sum("n").over(w))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("spq").cast("double") / (col("n") * 1048576.0), 6)
          .as("conf"),
        round(col("n_pos").cast("double") / col("n"), 6).as("acc"),
        round(col("gap_num").cast("double") / (col("n") * 1048576.0), 6)
          .as("gap"),
        round(col("ece_num").cast("double") /
          (col("n_all").cast("double") * 1048576.0), 6).as("ece"))
  }

  private val calibrationSql: String =
    """WITH sc AS (SELECT least(1.0, value / 100.0) AS phat,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |q AS (SELECT least(9, CAST(floor(phat * 10) AS BIGINT)) AS bin,
      |    CAST(floor(phat * 1048576) AS BIGINT) AS pq, pos FROM sc),
      |b AS (SELECT bin, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
      |    sum(CAST(pq AS DECIMAL(38,0))) AS spq FROM q GROUP BY 1),
      |g AS (SELECT *,
      |    abs(CAST(n_pos AS DECIMAL(38,0)) * 1048576 - spq) AS gap_num
      |  FROM b),
      |t AS (SELECT *, sum(gap_num) OVER () AS ece_num,
      |    sum(n) OVER () AS n_all FROM g)
      |SELECT bin, n, n_pos,
      |  round(CAST(spq AS DOUBLE) / (n * 1048576.0), 6) AS conf,
      |  round(CAST(n_pos AS DOUBLE) / n, 6) AS acc,
      |  round(CAST(gap_num AS DOUBLE) / (n * 1048576.0), 6) AS gap,
      |  round(CAST(ece_num AS DOUBLE)
      |    / (CAST(n_all AS DOUBLE) * 1048576.0), 6) AS ece
      |FROM t""".stripMargin

  /** Rounds for `q_logreg` — the oracle replays exactly these. */
  private[graft] val LrRounds = 8

  /** Feature/label frame for `q_logreg`: predict the engine's
    * quality-score keep decision (score > 0.7 — text_quality's shared
    * formula, the label a production quality classifier distills) from
    * three INTEGER features carrying the same signals at different
    * scales/clamps: a capped word count (knee at the score's nw=50
    * saturation), the stopword-hit ratio, and the punctuation ratio
    * (the negative signal). The label is the one float expression —
    * rounded to 6 in BOTH engines, the shared-oracle-twin discipline
    * every quality key uses; the features and the whole training
    * trajectory are exact integers. */
  private def logregFeatures(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.charClassCount
    val en = graft.functions.TextFunctions.langProfiles.toMap.apply("en")
    documents(s, d).select(col("text"))
      .withColumn("ws", words(col("text")))
      .withColumn("nw", greatest(size(col("ws")).cast("long"), lit(1L)))
      .withColumn("nc", greatest(length(col("text")).cast("long"), lit(1L)))
      .withColumn("hits",
        graft.functions.TextFunctions.hitCount(col("ws"), en).cast("long"))
      .withColumn("punct",
        col("nc") - charClassCount(col("text"), "a-zA-Z0-9 ").cast("long"))
      .withColumn("q",
        round(lit(0.5) * least(lit(1.0), col("nw") / 50.0)
          + lit(0.3) * round(col("hits") / col("nw"), 6)
          + lit(0.2) * (lit(1.0) - round(col("punct") / col("nc"), 6)), 6))
      .select(
        when(col("q") > 0.7, 1L).otherwise(0L).as("y"),
        lit(1024L).as("x0"),
        least(col("nw") * 82, lit(4096L)).as("x1"),
        expr("(hits * 8192) div nw").as("x2"),
        expr("(punct * 4096) div nc").as("x3"))
  }

  /** Fixed-round logistic trainer whose ENTIRE trajectory is exact
    * integer arithmetic — the hash-gated twin of the MLlib
    * `text_quality_learned` key (the km_lloyd_fixed ↔ km_fit_mllib
    * pattern on the supervised side). The sigmoid is the HARD sigmoid
    * σ̂(m) = clamp(½ + m/4, 0, 1): its gradient needs no exp(), so
    * every round is integer-exact in any partition order and the
    * oracle replays the whole trajectory as chained CTEs with NO
    * trained-artifact stash (documented trade: the smooth-sigmoid MLE
    * is the MLlib twin's job; fixed-point hard-sigmoid training is the
    * embedded/quantized-ML form). Units: features 2^10, weights 2^20,
    * probabilities 2^20 — p_q = clamp(2^19 + margin_q div 2^12, 0,
    * 2^20) with margin_q = Σ w_q·x_q in 2^30 units; gradient
    * g_j = Σ (p_q − y·2^20)·x_qj, per-example mean by div n, update
    * w_q −= (ḡ div 2^12) (η = ¼ — max per-round step 0.25 real, so 8
    * rounds stay inside the hard sigmoid's active region). Per round:
    * ONE aggregate job collecting d+1 gradient sums (the sanctioned
    * k-row collect — kmeans' centroid shape) and a lazy 1-row census
    * (round, weights, training accuracy). Output: the 8-row
    * trajectory. */
  private[graft] def logregFrom(feats0: DataFrame,
      rounds: Int = LrRounds): DataFrame = {
    val f0 = feats0.select(col("y").cast("long").as("y"),
        col("x0").cast("long").as("x0"), col("x1").cast("long").as("x1"),
        col("x2").cast("long").as("x2"), col("x3").cast("long").as("x3"))
      .localCheckpoint(true)
    // exact integer feature CENTERING (mean_q = sum div n, inlined as
    // literals — a 1-row collect): uncentered, the big lang-neutral
    // shape features share a common positive mass whose gradient
    // swamps the informative dimension and the trainer just walks the
    // bias to the class prior (measured: accuracy pinned at 0.564 for
    // all 8 rounds); centered, the bias absorbs the prior in one step
    // and each weight moves with its feature's class COVARIANCE
    val mu = f0.selectExpr("count(1) as n",
      "sum(x1) div count(1) as m1", "sum(x2) div count(1) as m2",
      "sum(x3) div count(1) as m3").collect().head
    val f = f0.selectExpr("y", "x0",
        s"x1 - ${mu.getAs[Long]("m1")}L as x1",
        s"x2 - ${mu.getAs[Long]("m2")}L as x2",
        s"x3 - ${mu.getAs[Long]("m3")}L as x3")
      .localCheckpoint(true)
    var w = Array(0L, 0L, 0L, 0L)
    def mexpr(w: Array[Long]): String =
      s"(x0*${w(0)}L + x1*${w(1)}L + x2*${w(2)}L + x3*${w(3)}L)"
    val census = collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val p = s"greatest(0L, least(1048576L, 524288L + ${mexpr(w)} div 4096))"
      val g = f.selectExpr(
        (0 to 3).map(j => s"sum(($p - y*1048576L) * x$j) as g$j")
          :+ "count(1) as n": _*).collect().head
      val n = math.max(1L, g.getAs[Long]("n"))
      w = w.indices.map(j =>
        w(j) - ((g.getAs[Long](s"g$j") / n) / 8192L)).toArray
      val pNew =
        s"greatest(0L, least(1048576L, 524288L + ${mexpr(w)} div 4096))"
      census += f.selectExpr(
        s"cast($r as int) as round",
        s"${w(0)}L as w0_q", s"${w(1)}L as w1_q",
        s"${w(2)}L as w2_q", s"${w(3)}L as w3_q",
        s"(1000000L * sum(case when (${mexpr(w)} > 0) = (y = 1) " +
          s"then 1L else 0L end)) div count(1) as acc_q",
        // mean |p - y| in 2^20 units: the calibration loss the mean
        // update descends - accuracy saturates at round 1 (the sign
        // is covariance-determined), the LOSS shows the training
        s"sum(abs($pNew - y*1048576L)) div count(1) as loss_q")
    }
    census.reduce(_ unionByName _)
  }

  private def logreg(s: SparkSession, d: String): DataFrame =
    logregFrom(logregFeatures(s, d))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_logreg" -> ((s, d) => logreg(s, d)),
    "q_ndcg" -> ((s, d) => ndcg(s, d)),
    "q_auc" -> ((s, d) => aucFrom(events(s, d)
      .where(col("event_type").isin("purchase", "view"))
      .select(col("value").as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("pos")))),
    "q_calibration" -> ((s, d) => calibrationFrom(events(s, d)
      .where(col("event_type").isin("purchase", "view"))
      .select(least(lit(1.0), col("value") / 100.0).as("phat"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("pos")))),
    "q_knn_classify" -> ((s, d) => knnClassify(s, d)),
    "q_recs_itemitem" -> ((s, d) => recsItemItem(s, d)),
    "q_stump" -> ((s, d) => stump(s, d)),
    "q_tree2" -> ((s, d) => tree2(s, d)),
    "q_tree3" -> ((s, d) => tree3(s, d)),
    "q_adaboost" -> ((s, d) => adaboost(s, d)),
    "q_naive_bayes" -> ((s, d) => naiveBayes(s, d))
  )

  private[graft] val AdaRounds = 3
  private[graft] val AdaW0 = 1048576L // 2^20 initial per-row weight

  /** Discrete AdaBoost over decision stumps (Freund & Schapire, JCSS
    * 1997 — the multiplicative-weights ORIGINAL, 3 rounds): per round
    * pick the (feature, threshold, polarity) stump minimizing the
    * WEIGHTED error ε = Σ_{h(x)≠y} w, multiply every misclassified
    * row's weight by (W−ε)/ε, renormalize to Σw = 2²⁰·n, repeat.
    * Readout: one row per round (t, feature, threshold, pol, eps_bp)
    * plus the ENSEMBLE's training accuracy — where the textbook vote
    * sign(Σ_t ±α_t), α_t = ½ln((W−ε)/ε), is decided WITHOUT any
    * engine transcendental: with 3 rounds the sign reduces to one
    * exact integer cross-multiplication, Π_{h_t=1}(W_t−ε_t) >
    * Π_{h_t=0}ε_t-mirrored — three-factor products ≤ 2¹¹⁷ carried in
    * DECIMAL(38,0)/HUGEINT (at the 10¹²-row regime the vote goes
    * float — scoring, never the gate). Weight updates and renorms are
    * truncating integer divisions on positive operands (`div` = `//`),
    * so the whole trajectory — stump picks, ε values, final accuracy
    * — hashes. Scale shape: see [[adaboostFrom]] — the weight ledger
    * is ≤ 2ᵗ driver-side BigInt constants keyed by misclassification
    * bit-pattern, so the per-round fact scans are pure Long
    * arithmetic; ε = 0 clamps to 1 weight unit (the standard epsilon
    * clamp) so a perfect stump cannot divide by zero. */
  private def adaboost(s: SparkSession, d: String): DataFrame =
    adaboostFrom(lineitem(s, d).select(
      floor(col("l_quantity")).cast("long").as("qty"),
      floor(col("l_discount") * 100).cast("long").as("disc"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y")))

  /** The boosting loop over any (`qty`, `disc`, `y`) frame — public to
    * the test JVM for the planted-interval and driver-replay gates.
    *
    * Scale shape: every row starts at the same weight 2²⁰ and the
    * per-row recurrence (truncating multiply-divide, then truncating
    * renorm) maps equal weights to equal weights, so after round t a
    * row's weight is a pure function of its misclassification
    * bit-pattern — at most 2ᵗ ≤ 8 distinct values. The weight LEDGER
    * therefore lives on the driver as exact BigInt per pattern, and
    * the engine only ever scans Long columns: per round one
    * weighted-histogram pass (weight = a CASE over ≤ 8 pattern
    * constants, recomputed from the picked stumps — no per-round
    * checkpoint, no fact-sized state) and one `groupBy(bits, y)`
    * count pass that both advances the ledger and, on the last round,
    * doubles as the ensemble-accuracy readout (h_t = y XOR
    * misbit_t, so the vote is decided per 16-row pattern census on
    * the driver, BigInt-exact). Nothing wider than Long ever
    * shuffles; the 2²⁰·n total mass must fit a Long sum, bounding
    * n < 2⁴² rows (~4.4 trillion — documented, `require`d). */
  private[graft] def adaboostFrom(rows0: DataFrame,
      rounds: Int = AdaRounds): DataFrame = {
    require(rounds >= 1 && rounds <= 3,
      s"adaboostFrom supports 1..3 rounds, got $rounds")
    val s = rows0.sparkSession
    val li = rows0.localCheckpoint(true)
    val n = li.count()
    val renorm = BigInt(AdaW0) * BigInt(n)
    require(renorm < (BigInt(1) << 62),
      s"adaboostFrom carries the 2^20*n weight mass in Long sums; " +
        s"n=$n exceeds the 2^42-row bound")
    final case class Pick(t: Int, feature: String, thr: Long, pol: Int,
      eRaw: BigInt, e: BigInt, wt: BigInt)
    var picks = Vector.empty[Pick]
    def hCol(p: Pick) = {
      val vcol = if (p.feature == "quantity") col("qty") else col("disc")
      if (p.pol == 1) when(vcol <= p.thr, 1L).otherwise(0L)
      else when(vcol <= p.thr, 0L).otherwise(1L)
    }
    // misclassification bit-pattern of a row under the first `k`
    // picked stumps — pure constant-folded CASE arithmetic on the
    // base columns, so every round's scan reads the one checkpoint
    def bitsCol(k: Int): org.apache.spark.sql.Column =
      picks.take(k).map(p =>
          when(hCol(p) =!= col("y"), lit(1L << (p.t - 1)))
            .otherwise(lit(0L)))
        .reduceOption(_ + _).getOrElse(lit(0L))
    // driver ledger: pattern -> (exact weight, row count)
    var wByBits = Map(0L -> BigInt(AdaW0))
    var cntByBits = Map(0L -> BigInt(n))
    // every bits pattern a scan can produce MUST be in the ledger —
    // round t's wCase and the census that built wByBits evaluate the
    // SAME bitsCol expression over the same checkpoint, so coverage
    // holds by construction; the census's Σcount = n require below
    // makes a future edit that breaks it throw loudly instead of
    // silently scoring weight 0 (the r15 ADVICE item; a raise_error
    // CASE base was tried first and cost 2× — 1.8 → 3.7 s at sf0.1 —
    // by knocking the weight CASE out of cheap codegen)
    def wCase: org.apache.spark.sql.Column = wByBits.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (b, wgt)) =>
        when(col("bits") === b, lit(wgt.toLong)).otherwise(acc) }
    var accBp = BigInt(0)
    for (t <- 1 to rounds) {
      val rows = li.withColumn("bits", bitsCol(t - 1))
        .withColumn("w", wCase)
      val feats = rows.select(lit("quantity").as("feature"),
          col("qty").as("v"), col("y"), col("w"))
        .union(rows.select(lit("discount"), col("disc"), col("y"),
          col("w")))
      val hist = feats.groupBy("feature", "v")
        .agg(sum("w").as("wv"), sum(expr("w * y")).as("pwv"))
      val wvc = Window.partitionBy("feature").orderBy("v")
      val wtw = Window.partitionBy("feature")
      val cum = hist.withColumn("wl", sum("wv").over(wvc))
        .withColumn("pwl", sum("pwv").over(wvc))
        .withColumn("wt", sum("wv").over(wtw))
        .withColumn("pwt", sum("pwv").over(wtw))
        .where(col("wl") < col("wt"))
      val errPos = col("wl") - col("pwl") + col("pwt") - col("pwl")
      val best = cum.select(col("feature"), col("v"), col("wt"),
          when(errPos * 2 <= col("wt"), errPos)
            .otherwise(col("wt") - errPos).as("e"),
          when(errPos * 2 <= col("wt"), 1).otherwise(0).as("pol"))
        .orderBy(col("e").asc, col("feature"), col("v")).limit(1)
        .collect().head
      val (feat, thr) = (best.getString(0), best.getLong(1))
      val (wTot, eRaw, pol) =
        (BigInt(best.getLong(2)), BigInt(best.getLong(3)),
          best.getInt(4))
      val e = eRaw.max(BigInt(1))
      picks :+= Pick(t, feat, thr, pol, eRaw, e, wTot)
      // pattern census after stump t: advances the BigInt ledger
      // exactly as the old per-row chain did (rows sharing a pattern
      // shared a weight there too); on the final round the same 16
      // (bits, y) rows decide the cross-multiplied ensemble vote
      val census = li.withColumn("bits", bitsCol(t))
        .groupBy("bits", "y").count().collect()
        .map(r => (r.getLong(0), r.getLong(1), BigInt(r.getLong(2))))
      cntByBits = census.groupBy(_._1).map { case (b, rs) =>
        b -> rs.map(_._3).sum }
      // the coverage invariant, enforced loudly at zero plan cost:
      // the census must account for EVERY row (so the ledger built
      // from it covers every pattern the next round's wCase can see),
      // and the patterns the CURRENT round just weighted must all
      // have come from the ledger
      require(cntByBits.values.sum == BigInt(n),
        s"adaboostFrom round $t census covers ${cntByBits.values.sum} " +
          s"of $n rows — the weight ledger no longer spans the data")
      require(census.forall { case (b, _, _) =>
          wByBits.contains(b & ~(1L << (t - 1))) },
        s"adaboostFrom round $t saw a bits pattern outside the ledger")
      val w1ByBits = cntByBits.keys.map { b =>
        val prev = wByBits(b & ~(1L << (t - 1)))
        b -> (if ((b & (1L << (t - 1))) != 0L) prev * (wTot - e) / e
          else prev)
      }.toMap
      val sw = w1ByBits.map { case (b, wgt) => wgt * cntByBits(b) }.sum
      wByBits = w1ByBits.map { case (b, wgt) =>
        b -> wgt * renorm / sw }
      if (t == rounds) {
        // ensemble vote by exact cross-multiplication: pred = 1 iff
        // Π_t (h_t=1 ? (W_t−ε_t) : ε_t) > Π_t (h_t=1 ? ε_t : (W_t−ε_t));
        // h_t recovers from the pattern as y XOR misbit_t
        val ok = census.collect { case (b, y, c) =>
          val (lhs, rhs) = picks.map { p =>
            val mis = (b & (1L << (p.t - 1))) != 0L
            val h = (y == 1L) != mis // h_t = y XOR misbit
            if (h) (p.wt - p.e, p.e) else (p.e, p.wt - p.e)
          }.reduce((a, c2) => (a._1 * c2._1, a._2 * c2._2))
          if ((if (lhs > rhs) 1L else 0L) == y) c else BigInt(0)
        }.sum
        accBp = ok * 10000 / n
      }
    }
    import s.implicits._
    picks.map(p => (p.t, p.feature, p.thr, p.pol,
        (p.eRaw * 10000 / p.wt).toLong, accBp.toLong, n))
      .toDF("t", "feature", "threshold", "pol", "eps_bp", "acc_bp", "n")
  }

  /** The Gini gain over (nl, posl, nt, post) cumulative-count columns —
    * ONE string shared by the q_stump and q_tree2 oracles, mirroring
    * the one [[splitGains]] expression both Spark plans share. Integer
    * `/` is double division in DuckDB as in Spark. */
  private val giniGainSql: String =
    """round(
      |      (1.0 - (post / nt) * (post / nt)
      |           - ((nt - post) / nt) * ((nt - post) / nt))
      |      - (nl / nt) * (1.0 - (posl / nl) * (posl / nl)
      |           - ((nl - posl) / nl) * ((nl - posl) / nl))
      |      - ((nt - nl) / nt)
      |        * (1.0 - ((post - posl) / (nt - nl)) * ((post - posl) / (nt - nl))
      |           - (((nt - nl) - (post - posl)) / (nt - nl))
      |             * (((nt - nl) - (post - posl)) / (nt - nl))), 8)"""
      .stripMargin

  /** One tree level for the q_tree3 oracle: histogram → cumulative →
    * gain → rk-1 pick per branch, all partitioned by the path column —
    * the same shape [[splitGains]] + the rank window produce. */
  private def treeLevelSql(lvl: Int): String =
    s"""f$lvl AS (SELECT branch, 'quantity' AS feature, qty AS v, y FROM b$lvl
       |  UNION ALL SELECT branch, 'discount', disc, y FROM b$lvl),
       |h$lvl AS (SELECT branch, feature, v, count(*) AS n, sum(y) AS pos
       |  FROM f$lvl GROUP BY 1, 2, 3),
       |c$lvl AS (SELECT branch, feature, v,
       |    sum(n) OVER (PARTITION BY branch, feature ORDER BY v) AS nl,
       |    sum(pos) OVER (PARTITION BY branch, feature ORDER BY v) AS posl,
       |    sum(n) OVER (PARTITION BY branch, feature) AS nt,
       |    sum(pos) OVER (PARTITION BY branch, feature) AS post
       |  FROM h$lvl),
       |g$lvl AS (SELECT branch, feature, v, nl, posl, nt, post,
       |    $giniGainSql AS gain
       |  FROM c$lvl WHERE nl < nt),
       |s$lvl AS MATERIALIZED (SELECT * FROM (SELECT *, row_number() OVER (
       |    PARTITION BY branch ORDER BY gain DESC, feature, v) AS rk
       |  FROM g$lvl) WHERE rk = 1)""".stripMargin

  /** Routing CTE: send every row of level `lvl` down its picked
    * split's side, path-appending 'L'/'R' ('root' resets to ''). Rows
    * in a branch with no pick (pure/single-valued) drop via the inner
    * join — those paths are leaves in both engines. */
  private def treeRouteSql(lvl: Int): String =
    s"""b${lvl + 1} AS MATERIALIZED (SELECT b.qty, b.disc, b.y,
       |    (CASE WHEN b.branch = 'root' THEN '' ELSE b.branch END) ||
       |    (CASE WHEN (CASE WHEN s.feature = 'quantity' THEN b.qty
       |                ELSE b.disc END) <= s.v
       |      THEN 'L' ELSE 'R' END) AS branch
       |  FROM b$lvl b JOIN s$lvl s ON s.branch = b.branch)""".stripMargin

  private def treeDeepSql(depth: Int): String = {
    val levels = (0 until depth).map { l =>
      if (l < depth - 1) treeLevelSql(l) + ",\n" + treeRouteSql(l)
      else treeLevelSql(l)
    }.mkString(",\n")
    val out = (0 until depth).map { l =>
      s"""SELECT branch AS node, feature, v AS threshold,
         |  CAST(nl AS BIGINT) AS nl, CAST(nt - nl AS BIGINT) AS nr,
         |  CAST(posl AS BIGINT) AS posl,
         |  CAST(post - posl AS BIGINT) AS posr, gain
         |FROM s$l""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li AS MATERIALIZED (SELECT
       |    CAST(floor(l_quantity) AS BIGINT) AS qty,
       |    CAST(floor(l_discount * 100) AS BIGINT) AS disc,
       |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
       |  FROM lineitem),
       |b0 AS (SELECT li.*, 'root' AS branch FROM li),
       |$levels
       |$out""".stripMargin
  }

  // q_logreg: the full integer trajectory replayed as chained CTEs —
  // same hard-sigmoid clamp, same truncating divisions, no artifact
  private def logregSql: String = {
    val en = graft.functions.TextFunctions.langProfiles.toMap.apply("en")
    val hits = "len(list_filter(regexp_split_to_array(text, '\\s+'), " +
      s"x -> list_contains([${en.map("'" + _ + "'").mkString(",")}], x)))"
    val f0 =
      s"""f0 AS MATERIALIZED (SELECT
         |    CASE WHEN round(0.5 * least(1.0, nw / 50.0)
         |        + 0.3 * round(hits / nw, 6)
         |        + 0.2 * (1.0 - round(punct / nc, 6)), 6) > 0.7
         |      THEN 1 ELSE 0 END AS y,
         |    1024 AS x0,
         |    least(nw * 82, 4096) AS x1,
         |    (hits * 8192) // nw AS x2,
         |    (punct * 4096) // nc AS x3
         |  FROM (SELECT
         |      greatest(len(regexp_split_to_array(text, '\\s+')), 1) AS nw,
         |      greatest(length(text), 1) AS nc,
         |      $hits AS hits,
         |      greatest(length(text), 1) - length(regexp_replace(text,
         |        '[^a-zA-Z0-9 ]', '', 'g')) AS punct
         |    FROM documents))""".stripMargin
    val rounds = (1 to LrRounds).map { r =>
      val m = s"(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3)"
      s"""g$r AS (SELECT ${(0 to 3).map(j =>
           s"sum((p - y*1048576) * x$j) AS g$j").mkString(", ")}
         |  FROM (SELECT f.*, greatest(0, least(1048576,
         |      524288 + $m // 4096)) AS p
         |    FROM f, w${r - 1}r w)),
         |w${r}r AS (SELECT ${(0 to 3).map(j =>
           s"w.w$j - ((g.g$j // c.n) // 8192) AS w$j").mkString(", ")}
         |  FROM w${r - 1}r w, g$r g, cnt c),
         |a$r AS (SELECT CAST($r AS INT) AS round,
         |    ${(0 to 3).map(j =>
           s"CAST(max(w.w$j) AS BIGINT) AS w${j}_q").mkString(", ")},
         |    CAST((1000000 * sum(CASE WHEN ($m > 0) = (f.y = 1)
         |      THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS acc_q,
         |    CAST(sum(abs(greatest(0, least(1048576,
         |      524288 + $m // 4096)) - f.y*1048576)) // count(*)
         |      AS BIGINT) AS loss_q
         |  FROM f, w${r}r w)""".stripMargin
    }.mkString(",\n")
    s"""WITH $f0,
       |mu AS (SELECT sum(x1) // count(*) AS m1,
       |    sum(x2) // count(*) AS m2, sum(x3) // count(*) AS m3
       |  FROM f0),
       |f AS MATERIALIZED (SELECT y, x0, x1 - m.m1 AS x1,
       |    x2 - m.m2 AS x2, x3 - m.m3 AS x3 FROM f0, mu m),
       |cnt AS (SELECT greatest(count(*), 1) AS n FROM f),
       |w0r AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |  CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
       |$rounds
       |${(1 to LrRounds).map(r => s"SELECT * FROM a$r")
         .mkString("\nUNION ALL ")}""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q_logreg" -> logregSql,
    "q_ndcg" -> ndcgSql,
    "q_auc" -> aucSql,
    "q_calibration" -> calibrationSql,
    "q_knn_classify" -> knnSql,
    "q_tree3" -> treeDeepSql(3),
    "q_recs_itemitem" ->
      s"""WITH baskets AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |capped AS MATERIALIZED (SELECT c, p FROM baskets
        |  WHERE c IN (SELECT c FROM baskets GROUP BY c
        |              HAVING count(*) <= $MaxBasket)),
        |cnt AS MATERIALIZED (SELECT p, count(*) AS n FROM capped
        |  GROUP BY 1),
        |pairs AS (SELECT a.p AS u, b.p AS v, count(*) AS co
        |  FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |anchors AS (SELECT p AS anchor, n AS n_anchor FROM cnt
        |  ORDER BY n DESC, p LIMIT 10),
        |sym AS (SELECT u AS anchor, v AS rec, co FROM pairs
        |  UNION ALL SELECT v, u, co FROM pairs),
        |scored AS (SELECT s.anchor, s.rec, s.co, a.n_anchor, c.n AS n_rec,
        |    round(s.co / sqrt(a.n_anchor * c.n), 4) AS score
        |  FROM sym s JOIN anchors a ON a.anchor = s.anchor
        |  JOIN cnt c ON c.p = s.rec),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY anchor
        |    ORDER BY score DESC, rec) AS rk FROM scored)
        |SELECT anchor, CAST(rk AS INT) AS rk, rec, co, n_anchor, n_rec,
        |  score
        |FROM rk WHERE rk <= 5""".stripMargin,

    "q_stump" ->
      s"""WITH li AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS qty,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS disc,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |feats AS (SELECT 'quantity' AS feature, qty AS v, y FROM li
        |  UNION ALL SELECT 'discount', disc, y FROM li),
        |hist AS (SELECT feature, v, count(*) AS n, sum(y) AS pos
        |  FROM feats GROUP BY 1, 2),
        |cum AS (SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v) AS nl,
        |    sum(pos) OVER (PARTITION BY feature ORDER BY v) AS posl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(pos) OVER (PARTITION BY feature) AS post
        |  FROM hist),
        |gains AS (SELECT feature, v, nl, nt - nl AS nr, posl,
        |    post - posl AS posr,
        |    $giniGainSql AS gain
        |  FROM cum WHERE nl < nt),
        |top AS (SELECT * FROM gains ORDER BY gain DESC, feature, v LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY gain DESC, feature, v) AS INT)
        |    AS rk, feature, v AS threshold, CAST(nl AS BIGINT) AS nl,
        |  CAST(nr AS BIGINT) AS nr, CAST(posl AS BIGINT) AS posl,
        |  CAST(posr AS BIGINT) AS posr, gain
        |FROM top""".stripMargin,

    "q_adaboost" -> {
      def pred(bt: String) =
        s"(CASE WHEN $bt.pol = 1 THEN CASE WHEN (CASE WHEN " +
          s"$bt.feature = 'quantity' THEN r.qty ELSE r.disc END) " +
          s"<= $bt.v THEN 1 ELSE 0 END ELSE CASE WHEN (CASE WHEN " +
          s"$bt.feature = 'quantity' THEN r.qty ELSE r.disc END) " +
          s"<= $bt.v THEN 0 ELSE 1 END END)"
      def stage(t: Int) = {
        val ep = "wl - pwl + pwt - pwl"
        s"""f$t AS (SELECT 'quantity' AS feature, qty AS v, y, w
           |    FROM w${t - 1}
           |  UNION ALL SELECT 'discount', disc, y, w FROM w${t - 1}),
           |h$t AS (SELECT feature, v, sum(w) AS wv, sum(w*y) AS pwv
           |  FROM f$t GROUP BY 1, 2),
           |c$t AS (SELECT feature, v,
           |    sum(wv) OVER (PARTITION BY feature ORDER BY v) AS wl,
           |    sum(pwv) OVER (PARTITION BY feature ORDER BY v) AS pwl,
           |    sum(wv) OVER (PARTITION BY feature) AS wt,
           |    sum(pwv) OVER (PARTITION BY feature) AS pwt
           |  FROM h$t),
           |s$t AS (SELECT feature, v, wt,
           |    CASE WHEN 2*($ep) <= wt THEN $ep ELSE wt - ($ep) END AS e,
           |    CASE WHEN 2*($ep) <= wt THEN 1 ELSE 0 END AS pol
           |  FROM c$t WHERE wl < wt),
           |b$t AS MATERIALIZED (SELECT feature, v, wt, e AS eraw,
           |    greatest(e, 1) AS e, pol
           |  FROM s$t ORDER BY e, feature, v LIMIT 1),
           |u$t AS (SELECT r.qty, r.disc, r.y,
           |    CASE WHEN ${pred(s"b$t")} <> r.y
           |      THEN (r.w * (b$t.wt - b$t.e)) // b$t.e ELSE r.w END AS w1
           |  FROM w${t - 1} r, b$t),
           |n$t AS (SELECT sum(w1) AS sw FROM u$t),
           |w$t AS (SELECT qty, disc, y,
           |    (w1 * (1048576 * cnt.n)) // sw AS w FROM u$t, n$t, cnt)"""
          .stripMargin
      }
      val lhs = (1 to 3).map(t =>
        s"(CASE WHEN ${pred(s"b$t")} = 1 THEN (b$t.wt - b$t.e) " +
          s"ELSE b$t.e END)").mkString(" * ")
      val rhs = (1 to 3).map(t =>
        s"(CASE WHEN ${pred(s"b$t")} = 1 THEN b$t.e " +
          s"ELSE (b$t.wt - b$t.e) END)").mkString(" * ")
      s"""WITH li AS MATERIALIZED (SELECT
         |    CAST(floor(l_quantity) AS BIGINT) AS qty,
         |    CAST(floor(l_discount * 100) AS BIGINT) AS disc,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |cnt AS (SELECT count(*) AS n FROM li),
         |w0 AS (SELECT qty, disc, y, 1048576 AS w FROM li),
         |${stage(1)},
         |${stage(2)},
         |${stage(3)},
         |acc AS (SELECT (sum(CASE WHEN
         |      (CASE WHEN $lhs > $rhs THEN 1 ELSE 0 END) = r.y
         |      THEN 1 ELSE 0 END) * 10000) // count(*) AS acc_bp
         |  FROM li r, b1, b2, b3)
         |SELECT CAST(t AS INT) AS t, feature, threshold,
         |  CAST(pol AS INT) AS pol, CAST(eps_bp AS BIGINT) AS eps_bp,
         |  CAST(acc.acc_bp AS BIGINT) AS acc_bp,
         |  CAST(cnt.n AS BIGINT) AS n
         |FROM (
         |  SELECT 1 AS t, feature, v AS threshold, pol,
         |    (eraw * 10000) // wt AS eps_bp FROM b1
         |  UNION ALL SELECT 2, feature, v, pol,
         |    (eraw * 10000) // wt FROM b2
         |  UNION ALL SELECT 3, feature, v, pol,
         |    (eraw * 10000) // wt FROM b3
         |) rounds, acc, cnt""".stripMargin
    },

    "q_tree2" ->
      s"""WITH li AS MATERIALIZED (SELECT
        |    CAST(floor(l_quantity) AS BIGINT) AS qty,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS disc,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |f0 AS (SELECT 'quantity' AS feature, qty AS v, y FROM li
        |  UNION ALL SELECT 'discount', disc, y FROM li),
        |h0 AS (SELECT feature, v, count(*) AS n, sum(y) AS pos
        |  FROM f0 GROUP BY 1, 2),
        |c0 AS (SELECT feature, v,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v) AS nl,
        |    sum(pos) OVER (PARTITION BY feature ORDER BY v) AS posl,
        |    sum(n) OVER (PARTITION BY feature) AS nt,
        |    sum(pos) OVER (PARTITION BY feature) AS post
        |  FROM h0),
        |g0 AS (SELECT feature, v, nl, posl, nt, post,
        |    $giniGainSql AS gain
        |  FROM c0 WHERE nl < nt),
        |root AS MATERIALIZED (SELECT * FROM g0
        |  ORDER BY gain DESC, feature, v LIMIT 1),
        |br AS MATERIALIZED (SELECT li.*,
        |    CASE WHEN (CASE WHEN root.feature = 'quantity' THEN li.qty
        |               ELSE li.disc END) <= root.v
        |      THEN 'left' ELSE 'right' END AS branch
        |  FROM li CROSS JOIN root),
        |f1 AS (SELECT branch, 'quantity' AS feature, qty AS v, y FROM br
        |  UNION ALL SELECT branch, 'discount', disc, y FROM br),
        |h1 AS (SELECT branch, feature, v, count(*) AS n, sum(y) AS pos
        |  FROM f1 GROUP BY 1, 2, 3),
        |c1 AS (SELECT branch, feature, v,
        |    sum(n) OVER (PARTITION BY branch, feature ORDER BY v) AS nl,
        |    sum(pos) OVER (PARTITION BY branch, feature ORDER BY v) AS posl,
        |    sum(n) OVER (PARTITION BY branch, feature) AS nt,
        |    sum(pos) OVER (PARTITION BY branch, feature) AS post
        |  FROM h1),
        |g1 AS (SELECT branch, feature, v, nl, posl, nt, post,
        |    $giniGainSql AS gain
        |  FROM c1 WHERE nl < nt),
        |bb AS (SELECT * FROM (SELECT *, row_number() OVER (
        |    PARTITION BY branch ORDER BY gain DESC, feature, v) AS rk
        |  FROM g1) WHERE rk = 1)
        |SELECT 'root' AS node, feature, v AS threshold,
        |  CAST(nl AS BIGINT) AS nl, CAST(nt - nl AS BIGINT) AS nr,
        |  CAST(posl AS BIGINT) AS posl,
        |  CAST(post - posl AS BIGINT) AS posr, gain
        |FROM root
        |UNION ALL
        |SELECT branch, feature, v, CAST(nl AS BIGINT),
        |  CAST(nt - nl AS BIGINT), CAST(posl AS BIGINT),
        |  CAST(post - posl AS BIGINT), gain
        |FROM bb""".stripMargin,

    "q_naive_bayes" ->
      s"""WITH toks AS (SELECT doc_id, lang, unnest(regexp_split_to_array(
        |    text, '\\s+')) AS tok FROM documents),
        |train AS MATERIALIZED (SELECT * FROM toks WHERE doc_id % 5 != 0),
        |test AS (SELECT * FROM toks WHERE doc_id % 5 = 0),
        |vocab AS (SELECT count(DISTINCT tok) AS vn FROM train),
        |classes AS MATERIALIZED (SELECT cls, CAST(row_number()
        |    OVER (ORDER BY cls) - 1 AS BIGINT) AS cls_idx
        |  FROM (SELECT DISTINCT lang AS cls FROM train)),
        |totals AS (SELECT lang AS cls, count(*) AS tot FROM train
        |  GROUP BY 1),
        |priors AS (SELECT lang AS cls, count(*) AS nd
        |  FROM (SELECT DISTINCT doc_id, lang FROM train) GROUP BY 1),
        |ndt AS (SELECT sum(nd) AS ndt FROM priors),
        |model AS MATERIALIZED (SELECT t.cls, t.tok,
        |    CAST(floor(log2(CAST(cnt + 1 AS DOUBLE) / (tot + vn))
        |      * $NbGrain) AS BIGINT) AS q
        |  FROM (SELECT lang AS cls, tok, count(*) AS cnt FROM train
        |        GROUP BY 1, 2) t
        |  JOIN totals USING (cls) CROSS JOIN vocab),
        |cstats AS (SELECT cls,
        |    CAST(floor(log2(1.0 / (tot + vn)) * $NbGrain) AS BIGINT)
        |      AS q_unseen,
        |    CAST(floor(log2(CAST(nd AS DOUBLE) / ndt.ndt) * $NbGrain)
        |      AS BIGINT) AS prior_q
        |  FROM totals CROSS JOIN vocab JOIN priors USING (cls)
        |  CROSS JOIN ndt),
        |tc AS (SELECT doc_id, lang, tok, count(*) AS n FROM test
        |  GROUP BY 1, 2, 3),
        |scored AS (SELECT tc.doc_id, tc.lang,
        |    (70368744177664 - cs.prior_q
        |      - sum(tc.n * coalesce(m.q, cs.q_unseen))) * 8 + cs.cls_idx
        |      AS key
        |  FROM tc CROSS JOIN (SELECT cls, cls_idx, q_unseen, prior_q
        |    FROM cstats JOIN classes USING (cls)) cs
        |  LEFT JOIN model m ON m.cls = cs.cls AND m.tok = tc.tok
        |  GROUP BY tc.doc_id, tc.lang, cs.prior_q, cs.cls_idx),
        |pred AS (SELECT s.doc_id, s.lang, c.cls AS pred
        |  FROM (SELECT doc_id, lang, min(key) % 8 AS cls_idx FROM scored
        |        GROUP BY 1, 2) s
        |  JOIN classes c ON c.cls_idx = s.cls_idx)
        |SELECT lang AS true_lang, pred AS pred_lang, count(*) AS n_docs
        |FROM pred GROUP BY 1, 2""".stripMargin
  )
}
