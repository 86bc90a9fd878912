package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog")   // exact dup of 1
  ).toDF("doc_id", "text")

  test("wordJaccard computes exact set similarity") {
    val j = docs.filter($"doc_id" isin (1L, 3L))
      .agg(collect_list("text")).as[Seq[String]].head()
    val df = Seq((j(0), j(1))).toDF("a", "b")
    val got = df.select(
      Dedup.wordJaccard(split($"a", "\\s+"), split($"b", "\\s+"))).as[Double].head()
    // sets: {the,quick,brown,fox,jumps,over,lazy,dog} vs
    //       {completely,different,content,about,spark,engines} — disjoint
    assert(got === 0.0)
  }

  test("band-bucket cap bounds a planted hot band's candidate yield; " +
      "exact-duplicate pairs bypass the cap") {
    // 40 DISTINCT texts sharing a 120-word boilerplate core: exact
    // collapse cannot help (no two texts equal), and nearly every
    // doc's minhash band values are pinned by the core (P[a doc's
    // unique word displaces a band] ≈ 4/121), so each of the 32 bands
    // is one hot ~38-member bucket — the quadratic shape the cap
    // exists for
    val core = (1 to 120).map(i => f"w$i%03d").mkString(" ")
    val hotDocs = ((1 to 40).map(i => (i.toLong, s"$core unique$i"))
      :+ (100L, "totally different words about spark physical plans")
      :+ (101L, s"$core unique7")) // exact dup of doc 7
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashPairs(hotDocs, "doc_id", "text", 0.6)
    // all C(40,2) core pairs verify at Jaccard 120/122, plus doc 7's
    // exact twin against the other 39 and itself
    assert(uncapped.count() === 780L + 40L, "uncapped is quadratic")
    val capped = Dedup.minhashPairs(hotDocs, "doc_id", "text", 0.6,
      bandCap = 4L)
    val cappedRows = capped.collect()
    assert(cappedRows.length <= 100,
      s"hot buckets must be dropped, got ${cappedRows.length} pairs")
    assert(cappedRows.exists(r => r.getLong(0) === 7L
        && r.getLong(1) === 101L && r.getDouble(2) === 1.0),
      "the exact-duplicate pair rides the text-hash collapse, not the " +
        "bands, so the cap never loses it")
  }

  test("minhashPairs finds the exact and near duplicates") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup must collide in every band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not pass verification")
  }

  test("simhash of identical texts is identical; near-dups are close") {
    val sh = docs.select($"doc_id", Dedup.simhash(split($"text", "\\s+")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(4L))
    val hamming14 = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val hamming13 = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(hamming14 < hamming13, "near-dup must be closer than unrelated doc")
  }

  test("dedup_ngram bigram jaccard is order-sensitive and matches brute force") {
    // brute-force bigram-set Jaccard inside (lang, length-bucket) blocks
    val rows = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", floor($"n_chars" / 100).as("lb"), $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3).split("\\s+").toSeq))
    def bigrams(w: Seq[String]) = w.zip(w.tail).map { case (a, b) => s"$a $b" }.toSet
    val brute = (for {
      (ida, la, ba, wa) <- rows; (idb, lb2, bb, wb) <- rows
      if ida < idb && la == lb2 && ba == bb && wa.size >= 2 && wb.size >= 2
      ga = bigrams(wa); gb = bigrams(wb)
      // HALF_UP to match Spark round() — math.rint is half-to-even and
      // diverges on exact .5 boundary fractions
      j = BigDecimal(ga.intersect(gb).size.toDouble /
        (ga.size + gb.size - ga.intersect(gb).size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.5
    } yield (ida, idb)).toSet
    val got = graft.queries.DedupPack.defs("dedup_ngram")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === brute)
    // order sensitivity: same word multiset, different order → no shared bigrams
    val g1 = bigrams("alpha beta gamma delta epsilon zeta".split(" ").toSeq)
    val g2 = bigrams("zeta epsilon delta gamma beta alpha".split(" ").toSeq)
    assert(g1.intersect(g2).isEmpty, "reversed word order shares no bigrams")
  }

  test("incrementalDedup drops exact and near corpus duplicates, keeps novel docs") {
    val corpus = Seq(
      (10L, "en", 0L, "the quick brown fox jumps over the lazy dog"),
      (11L, "en", 0L, "some established corpus document about databases")
    ).toDF("doc_id", "lang", "lb", "text").withColumn("n_chars", length($"text"))
    val incoming = Seq(
      (20L, "en", 0L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (21L, "en", 0L, "the quick brown fox jumps over the lazy cat"), // near dup
      (22L, "en", 0L, "an entirely novel incoming document about streaming"),
      (23L, "en", 0L, "an entirely novel incoming document about streaming") // dup within batch: both kept (batch-internal dedup is applyDedup's job)
    ).toDF("doc_id", "lang", "lb", "text").withColumn("n_chars", length($"text"))
    val kept = Dedup.incrementalDedup(incoming, corpus, ngramN = 1, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(22L, 23L), s"got $kept")
  }

  test("applyDedupPriority keeps the highest-priority cluster member, " +
    "not the min id") {
    // cluster {1,2,3} where the LONGEST doc (id 2) must win; {7,8} tie
    // on priority → min id 7 wins; 9 is unpaired and passes through
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 30L), (7L, 20L), (8L, 20L), (9L, 5L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = Dedup.applyDedupPriority(docs, "doc_id", "n_chars", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 7L, 9L), s"got $kept")
    // min-id rule on the same input keeps 1 instead of 2
    val minId = Dedup.applyDedup(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(minId === Set(1L, 7L, 9L))
  }

  test("incrementalDedup flags change the plan, never the result") {
    def side(parity: Int) = Tables.documents(spark, sfDir)
      .filter(pmod($"doc_id", lit(2)) === parity)
      .select($"doc_id", $"lang", floor($"n_chars" / 100).as("lb"), $"text")
    val base = Dedup.incrementalDedup(side(1), side(0), 1, 0.6)
      .select("doc_id").as[Long].collect().toSet
    for (bcast <- Seq(true, false); collapse <- Seq(true, false)) {
      val got = Dedup.incrementalDedup(side(1), side(0), 1, 0.6,
        broadcastIncoming = bcast, collapseCorpus = collapse)
        .select("doc_id").as[Long].collect().toSet
      assert(got === base, s"bcast=$bcast collapse=$collapse diverged")
    }
  }

  test("dedup_spans matches brute-force 5-gram doc-frequency; exact dups score 1.0") {
    val got = SparkEntry.queries("dedup_spans")(s, TestSession.sfDir)
      .select($"doc_id", $"n_shared", $"dup_span_frac")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val base = Tables.documents(s, TestSession.sfDir)
      .select($"doc_id", split($"text", "\\s+").as("w"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, w) =>
        id -> w.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSeq.distinct
      }
      .filter(_._2.nonEmpty)
    val dfreq = base.flatMap { case (id, g) => g.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val want = base.map { case (id, g) =>
      val shared = g.count(dfreq(_) >= 2).toLong
      // HALF_UP to match Spark round() — math.rint is half-to-even and
      // diverges on exact .5 boundary fractions
      id -> ((shared, BigDecimal(shared.toDouble / g.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    assert(got === want)
    // exact duplicate texts share every span with their copies
    val byText = Tables.documents(s, TestSession.sfDir)
      .groupBy("text").agg(count(lit(1)).as("n"), collect_list("doc_id").as("ids"))
      .filter($"n" >= 2).select(explode($"ids")).as[Long].collect()
    byText.foreach(id => assert(got(id)._2 === 1.0, s"doc $id"))
  }

  test("simhashPairs blocking is complete for hamming <= 3 (pigeonhole)") {
    // brute-force hamming over all pairs must equal the banded join result
    val sh = Tables.documents(spark, sfDir).limit(200)
      .select($"doc_id", Dedup.simhash(split($"text", "\\s+")).as("s"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ida, sa) <- sh; (idb, sb) <- sh if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    val banded = Dedup.simhashPairs(
      Tables.documents(spark, sfDir).limit(200), "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded === brute)
  }

  test("containment finds the wrapper dup that Jaccard misses") {
    // the boilerplate-wrapper shape: doc 1's words are fully embedded
    // in doc 2 (an article plus navigation chrome); doc 3 is unrelated
    val core = "solar panels convert sunlight into usable electric power efficiently"
    val chrome = "home about contact subscribe newsletter privacy terms sitemap " +
      "login register search menu footer header sidebar advertisement click share"
    val docsDf = Seq(
      (1L, core),
      (2L, core + " " + chrome),
      (3L, "quantum computing relies on entangled qubit states for speedup"))
      .toDF("doc_id", "text")
    val best = Dedup.containmentBestContainer(docsDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(best(1L) === ((2L, 1.0)),
      s"wrapped doc must report full containment in its wrapper, got $best")
    // the same pair under Jaccard: far below any dedup threshold —
    // the operator exists precisely because this pair is invisible there
    val j = Dedup.blockedNgramJaccard(
      docsDf.select($"doc_id", lit("en").as("lang"), lit(0L).as("lb"), $"text"),
      ngramN = 1, threshold = 0.0)
      .filter($"id_a" === 1L && $"id_b" === 2L)
      .select("jaccard").as[Double].collect()
    assert(j.headOption.forall(_ < 0.5),
      s"wrapper pair must be a low-Jaccard pair, got ${j.toSeq}")
    // docs 2 and 3 are below the ≥0.9 completeness bound everywhere
    // (2 is mostly chrome, 3 is disjoint): the prefix filter owes them
    // nothing, and reporting no row for them is the contract working —
    // but IF a row appears it must be low-containment, never spurious
    Seq(2L, 3L).foreach(id =>
      assert(best.get(id).forall(_._2 < 0.5),
        s"doc $id must not report a high-containment container, got $best"))
  }

  test("lshEval separates order-preserving dups (found) from scrambles (missed)") {
    // the eval's defining property: the MinHash index bands TRIGRAM
    // shingles but truth is UNIGRAM Jaccard — an order-preserving
    // near-dup is caught, a word-scramble of the same vocabulary is
    // truth the index structurally cannot see. Corpus: a near-dup
    // pair (1,2) sharing word ORDER, a scramble (3) of doc 1's words,
    // and unrelated docs for ballast.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      1L -> base,
      2L -> (base + " lambda"), // order-preserving near-dup of 1
      3L -> "kappa iota theta eta zeta epsilon delta gamma beta alpha",
      4L -> "one two three four five six seven eight nine ten",
      5L -> "red orange yellow green blue indigo violet black white gray")
      .toDF("doc_id", "text")
    val r = graft.operators.Dedup.lshEval(corpus, "doc_id", "text", 0.5)
      .collect().head
    assert(r.getAs[Long]("n_reps") === 5L)
    // truth: (1,2) unigram j = 10/11, (1,3) and (2,3) j = 1.0 and 10/11
    assert(r.getAs[Long]("n_truth") === 3L,
      s"expected the near-dup and both scramble pairs in truth, got $r")
    // the banding catches the order-preserving pair but cannot catch
    // the scramble (trigram shingle sets are disjoint)
    assert(r.getAs[Long]("n_tp") === 1L, s"got $r")
    assert(r.getAs[Double]("band_recall") === 0.3333, s"got $r")
  }

  test("lshEvalSampled estimates the exact eval's ratios from the " +
      "1/7 id sample, with truth joins only around the sample") {
    // same regime as the exact-eval corpus, ids placed so the sample
    // (id % 7 == 0) holds docs 7 and 14: the order-preserving pair
    // (7,8) and both scramble pairs (7,14), (8,14) all TOUCH the
    // sample, so the estimator sees the exact key's world: recall 1/3
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      7L -> base,
      8L -> (base + " lambda"),
      14L -> "kappa iota theta eta zeta epsilon delta gamma beta alpha",
      4L -> "one two three four five six seven eight nine ten",
      5L -> "red orange yellow green blue indigo violet black white gray")
      .toDF("doc_id", "text")
    val r = graft.operators.Dedup
      .lshEvalSampled(corpus, "doc_id", "text", 0.5).collect().head
    assert(r.getAs[Long]("n_reps") === 5L)
    assert(r.getAs[Long]("n_sample") === 2L)
    assert(r.getAs[Long]("n_truth_s") === 3L, s"got $r")
    assert(r.getAs[Long]("n_tp_s") === 1L, s"got $r")
    assert(r.getAs[Double]("recall_est") === 0.3333, s"got $r")
    assert(r.getAs[Double]("precision_est") === 1.0, s"got $r")
    // and the estimator agrees with the exact key on this corpus
    val exact = graft.operators.Dedup
      .lshEval(corpus, "doc_id", "text", 0.5).collect().head
    assert(r.getAs[Double]("recall_est")
      === exact.getAs[Double]("band_recall"))
  }

  test("q_record_link: planted truth pairs all reach the match zone; " +
      "an off-by-a-cent stranger lands in clerical review") {
    // 20-char distinct-trigram names: dropping one digit keeps trigram
    // jaccard >= 0.75, so every truth pair carries name+balance
    // agreement (score 11962 >= 9000). Balances 10000 cents apart sit
    // in different blocking bands, so no cross-pairs exist except
    // customer 4, planted ONE CENT from customer 1 — the band-edge
    // regime the +-1-cent probes exist for: (d4,c1)/(d1,c4) survive
    // blocking, read balance-only agreement (score 4121) and land in
    // 'possible' with zero true pairs.
    val cl = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRST", 7L, "SEG", 12345L),
      (2L, "UVWXYZABCDEFGHIJKLMN", 7L, "SEG", 22345L),
      (3L, "QRSTUVWXYZ0123456789", 7L, "SEG", 32345L),
      (4L, "JIHGFEDCBA9876543210", 7L, "SEG", 12346L)
    ).toDF("ck", "nm", "nk", "seg", "bc")
    val rows = graft.queries.DedupPack.recordLinkFrom(cl).collect()
    val m = rows.map(r => r.getAs[String]("decision") -> r).toMap
    assert(m("match").getAs[Long]("n_pairs") === 4L)
    assert(m("match").getAs[Long]("n_true") === 4L)
    assert(m("match").getAs[Double]("precision") === 1.0)
    assert(m("match").getAs[Double]("recall") === 1.0)
    assert(m("possible").getAs[Long]("n_pairs") === 2L)
    assert(m("possible").getAs[Long]("n_true") === 0L)
    assert(!m.contains("non_match"))
  }

  test("fsEm recovers the planted mixture parameters from a pattern " +
      "census") {
    // 1000 matches (550 all-agree, 450 name+bal only) + 250
    // non-matches (200 nothing, 50 balance only): truth m = (1, 1,
    // .55), u = (0, .2, 0), p = .8
    val census = Map(7 -> 550L, 6 -> 450L, 0 -> 200L, 2 -> 50L)
    val (p, mm, uu, post) = graft.queries.DedupPack.fsEm(census)
    assert(math.abs(p - 0.8) < 0.05, s"p=$p")
    assert(mm(0) > 0.95 && mm(1) > 0.95, s"m=${mm.toSeq}")
    assert(math.abs(mm(2) - 0.55) < 0.05, s"m=${mm.toSeq}")
    assert(uu(0) < 0.05 && math.abs(uu(1) - 0.2) < 0.05 && uu(2) < 0.05,
      s"u=${uu.toSeq}")
    assert(post(7) > 0.95 && post(6) > 0.95, "match patterns")
    assert(post(0) < 0.05 && post(2) < 0.05, "non-match patterns")
  }

  test("q_record_link_em separates planted truth from strangers with " +
      "fitted posteriors") {
    val cl = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRST", 7L, "SEG", 12345L),
      (2L, "UVWXYZABCDEFGHIJKLMN", 7L, "SEG", 22345L),
      (3L, "QRSTUVWXYZ0123456789", 7L, "SEG", 32345L),
      (4L, "JIHGFEDCBA9876543210", 7L, "SEG", 12346L)
    ).toDF("ck", "nm", "nk", "seg", "bc")
    val rows = graft.queries.DedupPack.recordLinkEmFrom(cl).collect()
    val m = rows.map(r => r.getAs[String]("decision") -> r).toMap
    assert(m("match").getAs[Long]("n_pairs") === 4L)
    assert(m("match").getAs[Long]("n_true") === 4L)
    assert(m("match").getAs[Double]("precision") === 1.0)
    assert(m("match").getAs[Double]("recall") === 1.0)
    // the two one-cent strangers must NOT reach the match zone
    val others = rows.filter(_.getAs[String]("decision") != "match")
    assert(others.map(_.getAs[Long]("n_pairs")).sum === 2L)
    assert(others.map(_.getAs[Long]("n_true")).sum === 0L)
  }

  test("fsThresholds picks the widest admissible zones and tightening " +
      "a target only shrinks its zone") {
    // hand per-field model m=(.9,.8,.7), u=(.1,.2,.3): pattern
    // likelihoods multiply out exactly; ratio order is 7,6,5,3,4,2,1,0
    def lik(a: Seq[Double], g: Int): Double =
      (0 until 3).map(i =>
        if (((g >> (2 - i)) & 1) == 1) a(i) else 1 - a(i)).product
    val mg = (0 until 8).map(g => g -> lik(Seq(0.9, 0.8, 0.7), g)).toMap
    val ug = (0 until 8).map(g => g -> lik(Seq(0.1, 0.2, 0.3), g)).toMap
    val z = graft.queries.DedupPack.fsThresholds(mg, ug, 0.05, 0.05)
    // ratio order 7,6,5,3,4,2,1,0; match prefix: cum u .006 -> .020
    // -> .044, then +u(3)=.054 breaks the .05 budget
    assert(z(7) === "match" && z(6) === "match" && z(5) === "match")
    // non-match suffix: cum m .006 -> .020 -> .044, then +m(4)=.054
    // breaks it; 3 and 4 are exactly the clerical-review middle
    assert(z(0) === "non_match" && z(1) === "non_match"
      && z(2) === "non_match")
    assert(z(3) === "possible" && z(4) === "possible")
    // tightening mu shrinks ONLY the match zone, monotonically
    val tight = graft.queries.DedupPack.fsThresholds(mg, ug, 0.01, 0.05)
    assert(tight(7) === "match" && tight(6) === "possible")
    assert((0 until 8).filter(z(_) == "non_match")
      .forall(tight(_) == "non_match"))
    // fully permissive targets leave no clerical-review zone
    val loose = graft.queries.DedupPack.fsThresholds(mg, ug, 1.0, 1.0)
    assert((0 until 8).forall(g => loose(g) != "possible"))
  }

  test("q_record_link_thresh: the planted corpus meets both error " +
      "targets with measured shares") {
    val cl = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRST", 7L, "SEG", 12345L),
      (2L, "UVWXYZABCDEFGHIJKLMN", 7L, "SEG", 22345L),
      (3L, "QRSTUVWXYZ0123456789", 7L, "SEG", 32345L),
      (4L, "JIHGFEDCBA9876543210", 7L, "SEG", 12346L)
    ).toDF("ck", "nm", "nk", "seg", "bc")
    val rows = graft.queries.DedupPack.recordLinkThreshFrom(cl).collect()
    val m = rows.map(r => r.getAs[String]("decision") -> r).toMap
    // zone pattern counts partition the 8-pattern domain
    assert(rows.map(_.getAs[Long]("n_patterns")).sum === 8L)
    // achieved mu-hat: false share of the match zone within target
    m.get("match").foreach { r =>
      assert(r.getAs[Long]("false_share_q") <= 1000L,
        "match zone must respect the 0.001 false-match target") }
    // achieved lambda-hat: true share lost to the non-match zone
    m.get("non_match").foreach { r =>
      assert(r.getAs[Long]("true_share_q") <= 10000L,
        "non-match zone must respect the 0.01 false-non-match target") }
    // nothing planted-true is auto-rejected, no stranger auto-matched
    assert(m.get("non_match").forall(_.getAs[Long]("n_true") === 0L))
    m.get("match").foreach { r =>
      assert(r.getAs[Long]("n_true") === r.getAs[Long]("n_pairs")) }
  }
}
