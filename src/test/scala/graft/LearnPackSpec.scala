package graft

import org.apache.spark.sql.functions._
import graft.queries.LearnPack

/** Learned-model kernels: NB on a separable hand corpus, item-item CF
  * and the stump search against driver-side recounts on sf0.001. */
class LearnPackSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("naiveBayesFrom classifies a separable hand corpus perfectly") {
    // two languages with DISJOINT vocabularies; ids ending in 0/5 are
    // the held-out test rows (doc_id % 5 == 0)
    val docs = Seq(
      (1L, "aa", "alpha beta alpha"), (2L, "aa", "beta beta gamma0"),
      (3L, "aa", "alpha alpha"), (5L, "aa", "beta alpha beta"),
      (10L, "aa", "alpha beta"),
      (11L, "bb", "delta epsilon"), (12L, "bb", "epsilon delta delta"),
      (13L, "bb", "delta zeta"), (15L, "bb", "epsilon zeta"),
      (20L, "bb", "delta delta epsilon")
    ).toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        split(col("text"), "\\s+").as("w"))
    val got = LearnPack.naiveBayesFrom(docs).collect()
      .map(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang"))
        -> r.getAs[Long]("n_docs")).toMap
    // test docs: 5, 10 (aa) and 15, 20 (bb) — all on the diagonal
    assert(got === Map(("aa", "aa") -> 2L, ("bb", "bb") -> 2L))
  }

  test("naiveBayes prior breaks ties for unseen-vocab documents") {
    // class "big" has 3 train docs, "sml" has 1, but both have SIX
    // train tokens, so the Laplace unseen-token likelihood
    // 1/(tot+V) is identical and a test doc of entirely unseen
    // tokens must fall to the higher prior (and the integer-key
    // argmax must not overflow)
    val docs = Seq(
      (1L, "big", "x y"), (2L, "big", "x z"), (3L, "big", "y z"),
      (4L, "sml", "q r q r q r"),
      (5L, "big", "unseen1 unseen2 unseen3")
    ).toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        split(col("text"), "\\s+").as("w"))
    val got = LearnPack.naiveBayesFrom(docs).collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("pred_lang") === "big")
  }

  test("q_naive_bayes confusion matrix covers exactly the held-out docs") {
    val rows = SparkEntry.queries("q_naive_bayes")(s, sfDir).collect()
    val nTest = Tables.documents(s, sfDir)
      .where(col("doc_id") % 5 === 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nTest)
    // predictions are train-class languages only
    val trainLangs = Tables.documents(s, sfDir)
      .where(col("doc_id") % 5 =!= 0).select("lang").distinct()
      .as[String].collect().toSet
    assert(rows.map(_.getAs[String]("pred_lang")).toSet.subsetOf(trainLangs))
  }

  test("q_recs_itemitem matches a driver-side cosine recount on sf0.001") {
    val got = SparkEntry.queries("q_recs_itemitem")(s, sfDir).collect()
    val baskets = Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(Tables.lineitem(s, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey").as("p")),
        "o_orderkey")
      .select("c", "p").distinct().as[(Long, Long)].collect()
    val byC = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .filter(_._2.size <= 256).toMap
    val cnt = byC.values.toSeq.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val co = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    byC.values.foreach { ps =>
      val v = ps.toSeq.sorted
      for (i <- v.indices; j <- i + 1 until v.size)
        co((v(i), v(j))) += 1
    }
    val anchors = cnt.toSeq.map { case (p, n) => (-n, p) }.sorted.take(10)
      .map(_._2)
    val wantRows = anchors.flatMap { a =>
      val neigh = co.toSeq.collect {
        case ((u, v), c) if c >= 2 && u == a => (v, c)
        case ((u, v), c) if c >= 2 && v == a => (u, c)
      }.map { case (r, c) =>
        val score = BigDecimal(c / math.sqrt(cnt(a).toDouble * cnt(r)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        (r, c, score)
      }
      neigh.sortBy { case (r, _, sc) => (-sc, r) }.take(5)
        .zipWithIndex.map { case ((r, c, sc), i) => (a, i + 1, r, c, sc) }
    }.toSet
    val gotRows = got.map(r => (r.getAs[Long]("anchor"), r.getAs[Int]("rk"),
      r.getAs[Long]("rec"), r.getAs[Long]("co"),
      BigDecimal(r.getAs[Double]("score")))).toSet
    assert(gotRows === wantRows)
  }

  test("tree2From recovers a planted depth-2 tree") {
    // root must split on quantity at 5 (gain .125): the global discount
    // histogram is engineered flat (disc=3 carries 6 pos + 6 neg,
    // disc=8 carries 2+2 -> zero root gain) while each branch's
    // discount split is PURE (gain .375) -- the pattern a stump cannot
    // see and a depth-2 tree exists for
    val rows =
      Seq.fill(6)((5L, 3L, 1L)) ++ Seq.fill(2)((5L, 8L, 0L)) ++
      Seq.fill(2)((15L, 8L, 1L)) ++ Seq.fill(6)((15L, 3L, 0L))
    val got = LearnPack.tree2From(rows.toDF("qty", "disc", "y"))
      .collect()
      .map(r => r.getAs[String]("node") ->
        ((r.getAs[String]("feature"), r.getAs[Long]("threshold"),
          r.getAs[Long]("nl"), r.getAs[Long]("nr"),
          r.getAs[Long]("posl"), r.getAs[Long]("posr"),
          r.getAs[Double]("gain")))).toMap
    assert(got.keySet === Set("root", "left", "right"))
    assert(got("root") === (("quantity", 5L, 8L, 8L, 6L, 2L, 0.125)))
    assert(got("left") === (("discount", 3L, 6L, 2L, 6L, 0L, 0.375)))
    assert(got("right") === (("discount", 3L, 6L, 2L, 0L, 2L, 0.375)))
  }

  test("treeDeepFrom at depth 3: planted depth-2 tree + pure leaves absent") {
    // same planted corpus as the tree2 gate: levels 0/1 must reproduce
    // tree2's picks under path labels, and level 2 must be EMPTY —
    // every depth-2 branch is pure or single-valued, so no 'LL'..'RR'
    // row may appear (leaves are the absent paths)
    val rows =
      Seq.fill(6)((5L, 3L, 1L)) ++ Seq.fill(2)((5L, 8L, 0L)) ++
      Seq.fill(2)((15L, 8L, 1L)) ++ Seq.fill(6)((15L, 3L, 0L))
    val got = LearnPack.treeDeepFrom(rows.toDF("qty", "disc", "y"), 3)
      .collect()
      .map(r => r.getAs[String]("node") ->
        ((r.getAs[String]("feature"), r.getAs[Long]("threshold"),
          r.getAs[Long]("nl"), r.getAs[Long]("nr"),
          r.getAs[Long]("posl"), r.getAs[Long]("posr"),
          r.getAs[Double]("gain")))).toMap
    assert(got.keySet === Set("root", "L", "R"))
    assert(got("root") === (("quantity", 5L, 8L, 8L, 6L, 2L, 0.125)))
    assert(got("L") === (("discount", 3L, 6L, 2L, 6L, 0L, 0.375)))
    assert(got("R") === (("discount", 3L, 6L, 2L, 0L, 2L, 0.375)))
  }

  test("q_tree3 matches a driver-side recursive greedy search on sf0.001") {
    val got = SparkEntry.queries("q_tree3")(s, sfDir).collect()
      .map(r => r.getAs[String]("node") ->
        ((r.getAs[String]("feature"), r.getAs[Long]("threshold"),
          r.getAs[Long]("nl"), r.getAs[Long]("nr"),
          r.getAs[Long]("posl"), r.getAs[Long]("posr")))).toMap
    val li = Tables.lineitem(s, sfDir)
      .select(floor(col("l_quantity")).cast("long"),
        floor(col("l_discount") * 100).cast("long"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L))
      .as[(Long, Long, Long)].collect().toSeq
    def gini(p: Double, m: Double) =
      1.0 - (p / m) * (p / m) - ((m - p) / m) * ((m - p) / m)
    // best (feature, threshold) under the exact tie-break (gain desc
    // rounded to 8, feature asc, v asc) — None when no nl<nt candidate
    def bestSplit(rs: Seq[(Long, Long, Long)])
        : Option[(String, Long, Long, Long, Long, Long)] = {
      val n = rs.size.toDouble
      val pos = rs.map(_._3).sum.toDouble
      val cands = Seq("discount", "quantity").flatMap { f =>
        val vs = rs.map(r => (if (f == "quantity") r._1 else r._2, r._3))
        vs.map(_._1).distinct.sorted.map { t =>
          val l = vs.filter(_._1 <= t)
          (f, t, l.size.toLong, l.map(_._2).sum)
        }.filter(_._3 < rs.size)
      }
      if (cands.isEmpty) None
      else Some {
        val (f, t, nl, pl) = cands.minBy { case (f, t, nl, pl) =>
          val g = gini(pos, n) - nl / n * gini(pl.toDouble, nl.toDouble) -
            (n - nl) / n * gini(pos - pl, (rs.size - nl).toDouble)
          (-BigDecimal(g).setScale(8, BigDecimal.RoundingMode.HALF_UP), f, t)
        }
        (f, t, nl, rs.size - nl, pl, rs.map(_._3).sum - pl)
      }
    }
    def grow(rs: Seq[(Long, Long, Long)], path: String, depth: Int)
        : Map[String, (String, Long, Long, Long, Long, Long)] =
      if (depth == 0) Map.empty
      else bestSplit(rs) match {
        case None => Map.empty
        case Some(pick @ (f, t, _, _, _, _)) =>
          val (l, r) = rs.partition(row =>
            (if (f == "quantity") row._1 else row._2) <= t)
          val pfx = if (path == "root") "" else path
          Map(path -> pick) ++
            grow(l, pfx + "L", depth - 1) ++ grow(r, pfx + "R", depth - 1)
      }
    assert(got === grow(li, "root", 3))
  }

  test("q_stump best split matches a driver-side exhaustive search") {
    val got = SparkEntry.queries("q_stump")(s, sfDir).collect()
      .sortBy(_.getAs[Int]("rk"))
    val li = Tables.lineitem(s, sfDir)
      .select(floor(col("l_quantity")).cast("long"),
        floor(col("l_discount") * 100).cast("long"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L))
      .as[(Long, Long, Long)].collect()
    def bestGain(vals: Seq[(Long, Long)]): Double = {
      val n = vals.size.toDouble
      val pos = vals.map(_._2).sum.toDouble
      def gini(p: Double, m: Double) =
        1.0 - (p / m) * (p / m) - ((m - p) / m) * ((m - p) / m)
      val parent = gini(pos, n)
      vals.map(_._1).distinct.sorted.dropRight(1).map { t =>
        val l = vals.filter(_._1 <= t)
        val nl = l.size.toDouble
        val pl = l.map(_._2).sum.toDouble
        parent - nl / n * gini(pl, nl) -
          (n - nl) / n * gini(pos - pl, n - nl)
      }.max
    }
    val want = math.max(
      bestGain(li.map(r => (r._1, r._3))),
      bestGain(li.map(r => (r._2, r._3))))
    assert(math.abs(got.head.getAs[Double]("gain") - want) < 1e-6)
    // every candidate's children partition the node, and gain >= 0
    // (Gini is concave: no split can increase weighted impurity)
    got.foreach { r =>
      assert(r.getAs[Long]("nl") + r.getAs[Long]("nr") === li.size.toLong)
      assert(r.getAs[Double]("gain") >= 0.0)
    }
  }

  test("knnClassifyGrid: separable blobs classify perfectly, an " +
      "isolated rim abstains") {
    // two tight blobs (diameter < eps) far apart, labels 1 and 2 —
    // every held-out point's k neighbors are same-blob, so the census
    // must be exactly {(1,1), (2,2)}; a far-away scatter of label-9
    // points has NO in-radius neighbors, so its held-out members must
    // all abstain (pred = -1, the radius-cap rim semantics)
    val blob = (0 until 40).map { i =>
      (i.toLong, 0.001 * (i % 7), 0.001 * (i / 7), 1)
    } ++ (0 until 40).map { i =>
      (100L + i, 1.0 + 0.001 * (i % 7), 1.0 + 0.001 * (i / 7), 2)
    } ++ (0 until 30).map { i =>
      (1000L + i, 5.0 + 10.0 * i, 5.0, 9)
    }
    val pts = blob.toDF("id", "x", "y", "label")
    val rows = graft.queries.LearnPack.knnClassifyGrid(pts).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("pred"),
        r.getAs[Long]("n")))
    val byLabel = rows.groupBy(_._1)
    assert(byLabel(1L).forall(_._2 === 1L), s"blob 1 misread: ${rows.toSeq}")
    assert(byLabel(2L).forall(_._2 === 2L), s"blob 2 misread: ${rows.toSeq}")
    assert(byLabel.contains(9L) && byLabel(9L).forall(_._2 === -1L),
      s"isolated points must abstain: ${rows.toSeq}")
    assert(rows.map(_._3).sum > 0)
  }

  test("q_ndcg: a planted co-purchase pattern evaluates at rank 1, " +
      "exhausted-catalog customers miss") {
    // users 1..10: early order {1,2}, last order {3}; users 11..15:
    // early order {1,2,3}, last order {99}. The model trains on
    // earlier baskets only, so (1,3)/(2,3) similarity comes from the
    // second cohort and item 3 is the rank-1 rec for cohort one (10
    // hits at gain 1.0); cohort two's novel item 99 appears in NO
    // train basket, and their whole neighbor set is owned, so they
    // miss. NDCG = 10/15.
    val D = 86400000000L
    val orders = ((1 to 10).flatMap(u => Seq(
      (u * 10L, u.toLong, new java.sql.Timestamp(D / 1000)),
      (u * 10L + 1, u.toLong, new java.sql.Timestamp(5 * D / 1000)))) ++
      (11 to 15).flatMap(u => Seq(
        (u * 10L, u.toLong, new java.sql.Timestamp(D / 1000)),
        (u * 10L + 1, u.toLong, new java.sql.Timestamp(5 * D / 1000)))))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = ((1 to 10).flatMap(u => Seq((u * 10L, 1L), (u * 10L, 2L),
      (u * 10L + 1, 3L))) ++
      (11 to 15).flatMap(u => Seq((u * 10L, 1L), (u * 10L, 2L),
        (u * 10L, 3L), (u * 10L + 1, 99L))))
      .toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("ndcg").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_ndcg")(spark, dir).collect().head
    assert(r.getAs[Long]("n_eval") === 15L)
    assert(r.getAs[Long]("n_hit") === 10L)
    assert(r.getAs[Double]("hit_rate") === 0.6667)
    assert(r.getAs[Double]("ndcg") === 0.666667)
  }

  test("aucFrom: perfect ranking reads 1, inverted 0, all-tied 0.5") {
    def auc(rows: Seq[(Double, Long)]): Double =
      graft.queries.LearnPack.aucFrom(rows.toDF("score", "pos"))
        .collect().head.getAs[Double]("auc")
    val perfect = (1 to 10).map(i => (i.toDouble, if (i > 5) 1L else 0L))
    assert(auc(perfect) === 1.0)
    assert(auc(perfect.map { case (s, p) => (-s, p) }) === 0.0)
    // every score identical: U is all mid-rank ties, AUC exactly 1/2
    assert(auc((1 to 10).map(i => (7.0, if (i > 5) 1L else 0L))) === 0.5)
  }

  test("calibrationFrom: a perfectly calibrated bin reads gap 0; the " +
      "hand ECE weights bins by count") {
    // Exact-binary p̂ so the 2²⁰ quantization is lossless: bin 2
    // (p̂=0.25, 1 of 4 positive) is perfectly calibrated; bin 9
    // (p̂=0.9375 = 15/16, 0 of 4 positive) gaps by exactly 0.9375.
    val rows = Seq((0.25, 1L), (0.25, 0L), (0.25, 0L), (0.25, 0L),
      (0.9375, 0L), (0.9375, 0L), (0.9375, 0L), (0.9375, 0L))
    val got = graft.queries.LearnPack.calibrationFrom(
      rows.toDF("phat", "pos")).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(got.keySet === Set(2L, 9L))
    assert(got(2L).getAs[Double]("conf") === 0.25)
    assert(got(2L).getAs[Double]("acc") === 0.25)
    assert(got(2L).getAs[Double]("gap") === 0.0)
    assert(got(9L).getAs[Double]("gap") === 0.9375)
    // ECE = (4/8)·0 + (4/8)·0.9375 = 0.46875, same value on every row
    assert(got(2L).getAs[Double]("ece") === 0.46875)
    assert(got(9L).getAs[Double]("ece") === 0.46875)
  }

  test("logregFrom: the integer hard-sigmoid trajectory matches a " +
      "driver replay exactly and separates a planted corpus") {
    // 40 rows, linearly separable on x1 (positives high, negatives
    // low), one constant feature (x3) the trainer must zero out
    val feats = (0 until 40).map { i =>
      val y = if (i % 2 == 0) 1L else 0L
      val x1 = if (y == 1) 3000L + (i % 5) * 10 else 500L + (i % 7) * 10
      (y, 1024L, x1, 200L + (i % 3) * 50, 777L)
    }
    val df = feats.toDF("y", "x0", "x1", "x2", "x3")
    val rows = LearnPack.logregFrom(df, rounds = 8).collect()
      .sortBy(_.getAs[Int]("round"))
    // driver replay of the exact integer recurrence (centering, hard
    // sigmoid, truncating divisions, eta = 1/8)
    val n = feats.length.toLong
    val mus = (2 to 4).map(j => feats.map(_.productElement(j)
      .asInstanceOf[Long]).sum / n)
    val c = feats.map { case (y, x0, x1, x2, x3) =>
      (y, Array(x0, x1 - mus(0), x2 - mus(1), x3 - mus(2))) }
    var w = Array(0L, 0L, 0L, 0L)
    for (r <- 1 to 8) {
      val g = Array.fill(4)(0L)
      c.foreach { case (y, x) =>
        val m = (0 to 3).map(j => w(j) * x(j)).sum
        val p = math.max(0L, math.min(1048576L, 524288L + m / 4096L))
        (0 to 3).foreach(j => g(j) += (p - y * 1048576L) * x(j))
      }
      w = w.indices.map(j => w(j) - ((g(j) / n) / 8192L)).toArray
      val row = rows(r - 1)
      assert((0 to 3).forall(j =>
        row.getAs[Long](s"w${j}_q") == w(j)),
        s"round $r weights: got ${(0 to 3).map(j =>
          row.getAs[Long](s"w${j}_q"))}, want ${w.toSeq}")
    }
    // the constant feature centers to zero and stays at weight 0
    assert(rows.last.getAs[Long]("w3_q") === 0L)
    // separable corpus: perfect accuracy, loss strictly decreasing
    assert(rows.last.getAs[Long]("acc_q") === 1000000L)
    val losses = rows.map(_.getAs[Long]("loss_q"))
    assert(losses.zip(losses.tail).forall { case (a, b) => b < a },
      s"loss must descend every round: ${losses.toSeq}")
  }

  test("adaboostFrom equals an exact BigInt driver replay on a " +
      "planted interval and every stump stays a weak learner") {
    // y = 1 iff qty ∈ [10, 19] over qty 0..29 ×10 rows — an interval
    // no single stump can express (best single stump = 2/3), so the
    // reweighting must move rounds 2..3 onto the uncovered side
    val data = for (q <- 0 until 30; r <- 0 until 10)
      yield (q.toLong, 0L, if (q >= 10 && q <= 19) 1L else 0L)
    val got = LearnPack.adaboostFrom(data.toDF("qty", "disc", "y"))
      .collect().sortBy(_.getInt(0))
    // --- driver replay: same rules, exact BigInt arithmetic ---
    val W0 = BigInt(1048576)
    val n = data.size
    val renorm = W0 * n
    var w = data.map(_ => W0)
    final case class P(feat: String, thr: Long, pol: Int, eRaw: BigInt,
      e: BigInt, wt: BigInt)
    var picks = Vector.empty[P]
    def fv(row: (Long, Long, Long), f: String) =
      if (f == "quantity") row._1 else row._2
    for (_ <- 1 to 3) {
      val wt = w.sum
      val cands = for {
        f <- Seq("discount", "quantity")
        v <- data.map(fv(_, f)).distinct.sorted.dropRight(1)
      } yield {
        val errPos = data.zip(w).map { case (r, wi) =>
          val h = if (fv(r, f) <= v) 1L else 0L
          if (h != r._3) wi else BigInt(0)
        }.sum
        val (e, pol) = if (errPos * 2 <= wt) (errPos, 1)
          else (wt - errPos, 0)
        (e, f, v, pol)
      }
      val best = cands.minBy(c => (c._1, c._2, c._3))
      val e = best._1.max(BigInt(1))
      picks :+= P(best._2, best._3, best._4, best._1, e, wt)
      val upd = data.zip(w).map { case (r, wi) =>
        val hLeft = fv(r, best._2) <= best._3
        val h = if (best._4 == 1) (if (hLeft) 1L else 0L)
          else (if (hLeft) 0L else 1L)
        if (h != r._3) wi * (wt - e) / e else wi
      }
      val sw = upd.sum
      w = upd.map(wi => wi * renorm / sw)
    }
    val accBp = BigInt(data.count { r =>
      val (lhs, rhs) = picks.map { p =>
        val hLeft = fv(r, p.feat) <= p.thr
        val h = if (p.pol == 1) (if (hLeft) 1L else 0L)
          else (if (hLeft) 0L else 1L)
        if (h == 1L) (p.wt - p.e, p.e) else (p.e, p.wt - p.e)
      }.reduce((a, b) => (a._1 * b._1, a._2 * b._2))
      (if (lhs > rhs) 1L else 0L) == r._3
    }) * 10000 / n
    got.zip(picks).foreach { case (row, p) =>
      assert(row.getString(1) === p.feat &&
        row.getAs[Long]("threshold") === p.thr &&
        row.getAs[Int]("pol") === p.pol &&
        row.getAs[Long]("eps_bp") === (p.eRaw * 10000 / p.wt).toLong,
        s"round ${row.getInt(0)}: got $row, want $p")
      // weak-learner guarantee: every picked stump beats chance on
      // its OWN round's weights
      assert(row.getAs[Long]("eps_bp") < 5000L)
    }
    assert(got.head.getAs[Long]("acc_bp") === accBp.toLong,
      s"ensemble accuracy ${got.head.getAs[Long]("acc_bp")} vs " +
        s"replay $accBp")
  }
}
