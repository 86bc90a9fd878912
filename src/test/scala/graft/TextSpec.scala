package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("bpe-ish pretokenizer splits letter/digit/punct runs with leading space") {
    val df = Seq("Hello, world42 foo-bar  x").toDF("t")
    val got = df.select(expr(
      "regexp_extract_all(t, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+', 0)"))
      .as[Seq[String]].head()
    assert(got === Seq("Hello", ",", " world", "42", " foo", "-", "bar", " x"))
  }

  test("text_bpe_train stops cleanly on a degenerate corpus with no mergeable pair") {
    // every word is a single character → no seq has >= 2 symbols, the
    // round-1 argmax is empty, and the loop must return the merges
    // learned so far (none) instead of ArrayIndexOutOfBounds
    val dir = java.nio.file.Files.createTempDirectory("bpe-degenerate").toString
    Seq((1L, "a b c", "en", "web", 5L), (2L, "d e", "en", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextPack.defs("text_bpe_train")(spark, dir)
    assert(out.count() === 0L, "degenerate corpus yields zero merges, not a crash")
  }

  test("text_bpe_train learns deterministic merges and the delta rewrite preserves them") {
    // a corpus where the greedy order is hand-checkable: 'abab' ×3,
    // 'ab' ×2, 'cd' ×4 → round 1 merges the most frequent adjacent
    // pair; 16 configured rounds stop early once pairs are exhausted
    val dir = java.nio.file.Files.createTempDirectory("bpe-tiny").toString
    Seq((1L, "abab abab abab ab ab cd cd cd cd", "en", "web", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextPack.defs("text_bpe_train")(spark, dir)
      .orderBy("round").collect()
    assert(out.nonEmpty && out.length <= graft.queries.TextPack.BpeTrainRounds)
    // round 1: 'a b' appears 2x in 'abab' (left-to-right, the shared
    // delimiter makes the middle occurrence non-overlapping) ... the
    // exact winner matters less than determinism + greedy consistency:
    // re-running produces the identical merge table
    val again = graft.queries.TextPack.defs("text_bpe_train")(spark, dir)
      .orderBy("round").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // counts are non-increasing in greedy BPE over a fixed corpus
    val cnts = out.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts.zip(cnts.tail).forall { case (a, b) => b <= a },
      s"greedy merge counts must be non-increasing, got $cnts")
  }

  test("triShingles builds overlapping word 3-grams") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(triShingles(words($"t"))).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("fingerprint is stable and equal for equal texts") {
    val df = Seq("x y z w", "x y z w", "different words here now").toDF("t")
    val fps = df.select(fingerprint(words($"t"))).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("hitCount counts multiset occurrences") {
    val df = Seq("the cat and the dog").toDF("t")
    val n = df.select(hitCount(words($"t"), Seq("the", "and"))).as[Int].head()
    assert(n === 3)
  }

  test("text_contamination matches a brute-force string-3-gram overlap") {
    val got = SparkEntry.queries("text_contamination")(s, TestSession.sfDir)
      .select($"doc_id", $"n_contam").as[(Long, Long)].collect().toMap
    val docs = Tables.documents(s, TestSession.sfDir)
      .select($"doc_id", triShingles(words($"text")).as("g"))
      .filter(size($"g") > 0)
      .as[(Long, Seq[String])].collect()
    val bench = docs.filter(_._1 % 20 == 0).flatMap(_._2).toSet
    val want = docs.filter(_._1 % 20 != 0)
      .map { case (id, g) => id -> g.distinct.count(bench.contains).toLong }.toMap
    assert(got === want)
  }

  test("text_quality_learned distills the rule score: held-out AUC floor") {
    val out = graft.queries.TextPack.defs("text_quality_learned")(spark, sfDir)
      .filter(pmod($"doc_id", lit(2)) === 1) // odd ids never saw training
      .select($"above_med", $"p_keep").as[(Long, Double)].collect()
    assert(out.nonEmpty && out.forall(r => r._2 >= 0.0 && r._2 <= 1.0))
    val pos = out.filter(_._1 == 1L).map(_._2)
    val neg = out.filter(_._1 == 0L).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty, "both classes must appear held-out")
    val auc = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      .sum / (pos.length.toDouble * neg.length)
    assert(auc > 0.85, s"held-out AUC was $auc — the distilled filter is not separating")
  }

  test("nfcNormalize composes decomposed sequences and is identity on NFC text") {
    import graft.functions.NormalizeExpression.nfcNormalize
    // e + COMBINING ACUTE (U+0065 U+0301) must compose to é (U+00E9);
    // already-composed and plain-ASCII inputs pass through; null stays null
    val df = Seq(
      ("a", "café"), ("b", "café"), ("c", "plain ascii"),
      ("d", "ḍ̇") // ḋ + dot-below → NFC reorders/composes to ḍ + dot-above
    ).toDF("id", "t")
    val got = df.select($"id", nfcNormalize($"t")).as[(String, String)]
      .collect().toMap
    assert(got("a") === "café")
    assert(got("b") === "café")
    assert(got("c") === "plain ascii")
    assert(got("d") === java.text.Normalizer.normalize(
      "ḍ̇", java.text.Normalizer.Form.NFC))
    val n = df.select(nfcNormalize(lit(null).cast("string"))).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("nfcNormalize stays inside whole-stage codegen (no fallback severing)") {
    import graft.functions.NormalizeExpression.nfcNormalize
    val df = spark.range(10).select(
      md5(nfcNormalize(lower(concat(lit("x"), $"id".cast("string"))))).as("h"))
    val plan = df.queryExecution.executedPlan
    val wsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "expected a WholeStageCodegen stage")
    // the project with the normalize chain must sit INSIDE a codegen
    // stage, not dangle outside it the way CodegenFallback exprs do
    val inCodegen = wsc.exists(_.collect {
      case p: org.apache.spark.sql.execution.ProjectExec
        if p.projectList.exists(_.find {
          case _: graft.functions.NormalizeNFC => true; case _ => false
        }.isDefined) => p
    }.nonEmpty)
    assert(inCodegen, "NormalizeNFC fell out of the codegen stage")
    assert(df.as[String].collect().length === 10)
  }

  test("predictedLang picks max-scoring profile with alphabetical ties") {
    val df = Seq(
      "the cat of the house",  // en hits
      "der hund und die katze", // de hits
      "xyzzy plugh"             // no hits anywhere → tie → 'de' (alphabetical)
    ).toDF("t")
    val got = df.select(predictedLang(words($"t"))).as[String].collect()
    assert(got(0) === "en")
    assert(got(1) === "de")
    assert(got(2) === "de")
  }

  test("text_vocab_growth: cumulative curves are monotone, vocab <= tokens, and sub-linear") {
    val rows = SparkEntry.queries("text_vocab_growth")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, cumToks, vocab) =>
      assert(vocab >= 1 && vocab <= cumToks && nDocs >= 1)
    }
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b._2 > a._2 && b._3 > a._3 && b._4 >= a._4, s"non-monotone: $a -> $b")
    }
    // Heaps sub-linearity on the shared-vocab synthetic corpus: the
    // second half of the corpus must add fewer NEW words than the first
    if (rows.length >= 2) {
      val mid = rows(rows.length / 2 - 1)._4
      assert(rows.last._4 - mid <= mid,
        s"vocabulary still growing linearly: ${rows.map(_._4).mkString(",")}")
    }
  }

  test("text_ppl_bigram: scrambled word order scores worse than natural text") {
    // a synthetic corpus of one repeated natural sentence + one
    // scramble of the same words: unigram statistics are nearly
    // identical, but the scramble's CONDITIONAL transitions are unseen
    // — only a bigram model separates them
    val natural = "the cat sat on the mat and the dog sat on the rug"
    val scramble = "mat the on dog the and sat rug the cat on sat the"
    val docs = ((0 until 20).map(i => (i.toLong, natural)) :+
      (100L, scramble)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pplbg").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextPack.defs("text_ppl_bigram")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("nll_bits"))).toMap
    assert(got(0L)._1 === 12L && got(100L)._1 === 12L)
    assert(got(100L)._2 > got(0L)._2 + 1.0,
      s"scramble must score clearly worse: ${got(100L)._2} vs ${got(0L)._2}")
  }

  test("rakeFrom scores a hand document per the RAKE paper's formula") {
    // stopwords here: "the", "of" (both in the en profile). Candidate
    // runs: "deep learning" x2, "neural nets" x1.
    // freq: deep 2, learning 2, neural 1, nets 1
    // deg (sum of phrase length over occurrences): deep 4, learning 4,
    //   neural 2, nets 2 → every ratio = 2.0 exactly
    // phrase scores: "deep learning" = 4.0 (2 occ), "neural nets" = 4.0
    // (1 occ) — tie broken by phrase text asc
    val docs = Seq(
      (1L, Seq("deep", "learning", "of", "deep", "learning",
        "the", "neural", "nets"))
    ).toDF("doc_id", "w")
    val rows = graft.queries.TextPack.rakeFrom(docs).collect()
      .sortBy(_.getAs[Int]("rk"))
    val got = rows.map(r => (r.getAs[String]("phrase"),
      r.getAs[Long]("n_occ"), r.getAs[Double]("score")))
    assert(got.toSeq === Seq(("deep learning", 2L, 4.0),
      ("neural nets", 1L, 4.0)))
  }

  test("featureHashFrom matches a driver-side hash replay with sign cancellation") {
    def u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def dim(t: String) = u32(s"fh:$t") % 64
    def sgn(t: String) = if (u32(s"fhs:$t") % 2 == 0) 1L else -1L
    val toks = Seq("alpha", "beta", "gamma", "alpha", "delta", "epsilon")
    val docs = Seq((7L, toks)).toDF("doc_id", "w")
    val got = graft.queries.TextPack.featureHashFrom(docs).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("v")).toMap
    val want = toks.groupBy(dim).view
      .mapValues(_.map(sgn).sum).toMap.filter(_._2 != 0L)
    assert(got === want, s"got $got want $want")
    // the signed-cancellation property: opposite-sign tokens forced
    // into one bucket produce a ZERO (dropped) coordinate
    val (tA, tB) = (
      (1 to 1000).map(i => s"w$i").find(t => sgn(t) == 1L).get,
      (1 to 1000).map(i => s"w$i")
        .find(t => sgn(t) == -1L && dim(t) == dim(
          (1 to 1000).map(i => s"w$i").find(x => sgn(x) == 1L).get)).get)
    val canc = graft.queries.TextPack.featureHashFrom(
      Seq((8L, Seq(tA, tB))).toDF("doc_id", "w")).collect()
    assert(canc.isEmpty, s"colliding opposite signs must cancel: " +
      s"${canc.toSeq} ($tA/$tB at dim ${dim(tA)})")
  }

  test("feature-hash vectors preserve similarity: near-dup docs stay close") {
    // the bridge property the hashing trick promises (E[x·x'] is
    // preserved): a one-word edit keeps the hashed vectors nearly
    // parallel while unrelated text lands nearly orthogonal — which
    // is exactly what lets hashed vectors feed the cosine/semdedup
    // machinery with no trained vocabulary
    val base = "the quick brown fox jumps over the lazy dog carrying " +
      "seventeen bright green apples toward the distant river crossing"
    val near = base.replace("dog", "cat")
    val far = "completely unrelated content describing database query " +
      "optimization plans and shuffle partition sizing strategies"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
      .withColumn("w", split(col("text"), "\\s+"))
    val sparse = graft.queries.TextPack.featureHashFrom(docs).collect()
    def dense(id: Long): Array[Double] = {
      val v = new Array[Double](64)
      sparse.filter(_.getAs[Long]("doc_id") == id).foreach(r =>
        v(r.getAs[Long]("dim").toInt) = r.getAs[Long]("v").toDouble)
      v
    }
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (dense(a), dense(b))
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(q => q * q).sum))
    }
    assert(cos(1L, 2L) > 0.8, s"near-dup cosine ${cos(1L, 2L)}")
    assert(cos(1L, 3L) < 0.5, s"unrelated cosine ${cos(1L, 3L)}")
    assert(cos(1L, 2L) > cos(1L, 3L) + 0.3)
  }

  test("hashedAnnRecallFrom: planted identical twins give recall 1.0 at every knob") {
    // 6 groups of one query doc (ids 0..5) + 3 identical corpus twins
    // each (ids 100+): twins hash to IDENTICAL vectors, so cosine 1.0
    // fills every truth slot (k=3) and every LSH bucket contains them
    // at any bit width — all five frontier rows must read recall 1.0
    val texts = (0 until 6).map(g =>
      s"alpha$g beta$g gamma$g delta$g alpha$g epsilon$g zeta$g")
    val docs = (texts.zipWithIndex.map { case (t, g) => (g.toLong, t) } ++
      (for (g <- 0 until 6; j <- 0 until 3)
        yield ((100 + 3 * g + j).toLong, texts(g))))
      .toDF("doc_id", "text")
      .withColumn("w", split(col("text"), "\\s+"))
    val rows = graft.queries.TextPack.hashedAnnRecallFrom(docs).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("recall") === 1.0,
        s"${r.getAs[String]("family")}/${r.getAs[Int]("knob")}: $r")
    }
  }

  test("ann_hashed_recall: banding is a candidate superset, so recall is monotone") {
    // exact construction facts, not tendencies: lsh_banded L=2 uses
    // tables over bits 0..15 whose table 0 IS lsh_hashed knob 8's only
    // table, and L=4's tables extend L=2's — candidate supersets, and
    // matched-truth counts are monotone under candidate supersets
    // (a truth row in the subset's top-3 has <= 2 global betters, so
    // it survives any superset's top-3)
    val rows = SparkEntry.queries("ann_hashed_recall")(s, TestSession.sfDir)
      .collect()
      .map(r => (r.getAs[String]("family"), r.getAs[Int]("knob")) ->
        ((r.getAs[Long]("n_cand"), r.getAs[Double]("recall")))).toMap
    assert(rows.size === 5)
    rows.values.foreach { case (nc, rec) =>
      assert(nc >= 0 && rec >= 0.0 && rec <= 1.0)
    }
    val h8 = rows(("lsh_hashed", 8))
    val b2 = rows(("lsh_banded", 2))
    val b4 = rows(("lsh_banded", 4))
    assert(b2._1 >= h8._1 && b2._2 >= h8._2, s"b2=$b2 h8=$h8")
    assert(b4._1 >= b2._1 && b4._2 >= b2._2, s"b4=$b4 b2=$b2")
  }

  test("textrankFrom ranks the hub word first and replays the integer trajectory") {
    // star word graph: "alpha" is adjacent to four distinct words
    // (each once), the leaves only to alpha — centrality must put
    // alpha first even though every token has the same frequency
    // regime; "the" (stopword) must never appear
    val docs = Seq(
      (1L, Seq("alpha", "beta", "the", "alpha", "gamma")),
      (2L, Seq("alpha", "delta")),
      (3L, Seq("epsilon", "alpha"))
    ).toDF("doc_id", "w")
    val rows = graft.queries.TextPack.textrankFrom(docs).collect()
      .sortBy(_.getAs[Int]("rk"))
    val toks = rows.map(_.getAs[String]("token"))
    assert(!toks.contains("the"))
    assert(toks.head === "alpha", s"hub must rank first: ${toks.toSeq}")
    // driver-side integer replay of the 3 fixed rounds; doc 1's
    // content sequence alpha-beta-alpha-gamma yields (alpha,beta)
    // twice (both directions canonicalize to one undirected pair)
    val und = Seq(("alpha", "beta", 2L), ("alpha", "gamma", 1L),
      ("alpha", "delta", 1L), ("alpha", "epsilon", 1L))
    val edges = und.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
    val s = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    var pr = s.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to graft.queries.TextPack.TextRankRounds) {
      val cin = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => pr(src) * w / s(src) }.sum
      }
      pr = cin.map { case (n, c) => n -> (150000000L + 85L * c / 100L) }
    }
    val want = rows.map(r => r.getAs[String]("token") ->
      r.getAs[Long]("mass")).toMap
    pr.foreach { case (n, m) =>
      assert(want(n) === m, s"node $n: engine ${want(n)} vs replay $m")
    }
  }

  test("text_zipf matches a driver-side quantized OLS replay; near -1 on a planted Zipf corpus") {
    // exact replay on the real corpus
    val got = SparkEntry.queries("text_zipf")(spark, sfDir).collect().head
    val freqs = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect()
    val top = freqs.sortBy { case (t, f) => (-f, t) }.take(100)
    val q = top.zipWithIndex.map { case ((_, f), i) =>
      (math.floor(math.log(i + 1.0) * 1048576L).toLong,
        math.floor(math.log(f.toDouble) * 1048576L).toLong)
    }
    val n = q.length.toLong
    val (sx, sy) = (q.map(_._1).sum, q.map(_._2).sum)
    val sxy = q.map(p => p._1 * p._2).sum
    val sxx = q.map(p => p._1 * p._1).sum
    val num = (n * sxy - sx * sy).toDouble
    val denx = n * sxx - sx * sx
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Long]("n") === n)
    assert(got.getAs[Double]("slope") === r4(num / denx))
    assert(got.getAs[Double]("r2") > 0.0 && got.getAs[Double]("r2") <= 1.0)
    // planted corpus with freq(token_i) = ceil(60/i): slope ≈ -1
    val planted = (1 to 20).flatMap(i =>
      Seq.fill(math.ceil(60.0 / i).toInt)(f"tok$i%02d"))
      .map(Tuple1(_)).toDF("tok")
    val ps = graft.queries.TextPack.zipfFrom(planted).collect().head
    assert(math.abs(ps.getAs[Double]("slope") + 1.0) < 0.1,
      s"planted 1/rank corpus must fit slope ~ -1: ${ps.getAs[Double]("slope")}")
  }

  test("dsirFrom selects exactly the target-like raw docs: positive " +
      "log-ratios on target vocabulary, negative off it") {
    // target (src0) speaks alpha/beta; raw pool: srcA docs speak the
    // target vocabulary, srcB docs speak junk the target never uses.
    // DSIR must give srcA positive mean log-ratio, srcB negative, and
    // the P75 cut (8 raw docs -> top 2) must land entirely in srcA.
    val docs = (
      (1 to 6).map(i => (i.toLong, "alpha beta alpha beta", "src0")) ++
      (11 to 14).map(i => (i.toLong, "alpha beta alpha", "srcA")) ++
      (21 to 24).map(i => (i.toLong, "zzz yyy xxx", "srcB"))
    ).toDF("doc_id", "text", "source")
      .withColumn("w", words(col("text")))
    val got = graft.queries.TextPack.dsirFrom(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet === Set("srcA", "srcB"))
    assert(got("srcA").getAs[Double]("avg_logratio") > 0.0)
    assert(got("srcB").getAs[Double]("avg_logratio") < 0.0)
    // identical weights within each source: the P75 threshold over
    // {4x wA, 4x wB} interpolates between sorted ranks 6 and 7 (both
    // wA), so selection is exactly the srcA quartet and none of srcB
    assert(got("srcA").getAs[Long]("n_sel") === 4L)
    assert(got("srcB").getAs[Long]("n_sel") === 0L)
  }

  test("coverageGreedyFrom skips the near-duplicate long doc a " +
      "top-k-by-size pick would waste budget on") {
    import graft.queries.TextPack
    // doc 1: t1..t10; doc 2: t1..t9 + t11 (a 10-token NEAR-DUP of 1);
    // doc 3: t20..t25 (6 fresh tokens). Top-2-by-size takes {1, 2}
    // and covers 11; greedy takes {1, 3} and covers 16 — the whole
    // point of marginal-gain selection on redundant corpora
    val pairs =
      (1 to 10).map(i => (1L, s"t$i")) ++
        ((1 to 9).map(i => (2L, s"t$i")) :+ ((2L, "t11"))) ++
        (20 to 25).map(i => (3L, s"t$i"))
    val got = TextPack.coverageGreedyFrom(pairs.toDF("doc_id", "tok"),
      k = 3).collect().sortBy(_.getInt(0))
    assert(got.map(r => (r.getInt(0), r.getAs[Long]("doc_id"),
        r.getAs[Long]("gain"), r.getAs[Long]("covered"))).toSeq ===
      Seq((1, 1L, 10L, 10L), (2, 3L, 6L, 16L), (3, 2L, 1L, 17L)),
      s"greedy trajectory: ${got.toSeq}")
  }
}
