package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates — the rows-only queries'
  * semantic gate: the sketches must track their exact counterparts
  * within the error the sketch parameters promise. */
class StatsSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("approx_count_distinct (rsd=0.02) tracks exact distinct within 10%") {
    val got = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .select($"l_returnflag", $"approx_parts").as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet === exact.keySet)
    got.foreach { case (k, approx) =>
      val e = exact(k).toDouble
      assert(math.abs(approx - e) / e < 0.10,
        s"$k: HLL estimate $approx vs exact $e drifted past 10%")
    }
  }

  test("q_quantile_sketch: partial registers merge by elementwise add " +
      "and the readout error never exceeds one bucket width") {
    import graft.queries.StatsPack
    // synthetic two-group corpus with a skewed tail
    val rows = ((0 until 3000).map(i =>
        ("a", ((i * 7919) % 10007).toLong)) ++
      (0 until 2000).map(i => ("b", ((i * i) % 4001).toLong)))
      .toDF("g", "vq").localCheckpoint(true)
    val frame = StatsPack.qsketchFrame(rows)
    // mergeability: sketch(A) ⊎ sketch(B) ≡ sketch(A ∪ B) against the
    // SHARED frame — the property that lets every partition build its
    // own registers and the reduce add them
    val half = rows.withColumn("h", pmod(col("vq") * 37, lit(2)))
    val cA = StatsPack.qsketchCounts(half.where($"h" === 0)
      .select("g", "vq"), frame)
    val cB = StatsPack.qsketchCounts(half.where($"h" === 1)
      .select("g", "vq"), frame)
    val merged = cA.unionByName(cB).groupBy("g", "b")
      .agg(sum("cb").as("cb"))
    val whole = StatsPack.qsketchCounts(rows, frame)
    val mSet = merged.as[(String, Long, Long)].collect().toSet
    val wSet = whole.as[(String, Long, Long)].collect().toSet
    assert(mSet === wSet, "register merge must be elementwise add")
    // ...and the merged readout IS the single-shot readout
    val rm = StatsPack.qsketchReadout(merged, frame, Seq(50, 90, 99))
      .collect().map(_.toString).sorted.toSeq
    val rw = StatsPack.qsketchReadout(whole, frame, Seq(50, 90, 99))
      .collect().map(_.toString).sorted.toSeq
    assert(rm === rw)
    // provable error bound: est and exact share a bucket, so the
    // measured error is < one bucket width on EVERY quantile
    val audit = StatsPack.quantileSketchFrom(rows).collect()
    assert(audit.length === 6)
    audit.foreach { r =>
      assert(r.getAs[Long]("abs_err_cq") <= r.getAs[Long]("max_err_cq"),
        s"bucket-width bound violated: $r")
    }
  }

  test("q_mixture rebalances every stratum to the smallest stratum's size, deterministically") {
    def run() = SparkEntry.queries("q_mixture")(spark, sfDir)
      .as[(Long, String)].collect().toSet
    val got = run()
    val counts = Tables.documents(spark, sfDir).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val target = counts.values.min
    // exact-n per stratum
    val perLang = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(perLang.keySet === counts.keySet)
    perLang.foreach { case (lang, n) => assert(n === target, s"lang $lang") }
    // a subset of the corpus, stable across runs
    val ids = Tables.documents(spark, sfDir).select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).subsetOf(ids))
    assert(run() === got)
  }

  test("approx_percentile tracks exact percentiles within the accuracy bound") {
    val got = SparkEntry.queries("q_approx_percentile")(spark, sfDir)
      .select($"event_type", $"p50", $"p90").as[(String, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === exact.keySet)
    got.foreach { case (k, (a50, a90)) =>
      val (e50, e90) = exact(k)
      val spread = math.max(1e-9, e90 - e50)
      assert(math.abs(a50 - e50) / spread < 0.25,
        s"$k: approx p50 $a50 vs exact $e50 drifted past the sketch bound")
      assert(math.abs(a90 - e90) / spread < 0.25,
        s"$k: approx p90 $a90 vs exact $e90 drifted past the sketch bound")
    }
  }

  test("q_drift PSI is non-negative everywhere and near zero for stationary types") {
    // every PSI term (q-p)·ln(q/p) is ≥ 0, so any negative value is an
    // implementation bug, and the synthetic events are time-stationary,
    // so drift between the two halves must sit near the smoothing floor
    val psi = SparkEntry.queries("q_drift")(spark, sfDir)
      .as[(String, Double)].collect().toMap
    assert(psi.nonEmpty)
    psi.foreach { case (t, v) =>
      assert(v >= 0.0, s"$t: PSI must be non-negative, got $v")
      assert(v < 0.25, s"$t: stationary synthetic data should not read as " +
        s"drifted (PSI >= 0.25), got $v — binning or windowing is broken")
    }
  }

  test("q_gini reads 0 on uniform spend and the exact whale value") {
    def run(spend: Seq[Double]) = {
      val ords = spend.zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, (i + 1).toLong, v)
      }.toDF("o_orderkey", "o_custkey", "o_totalprice")
      val dir = java.nio.file.Files.createTempDirectory("gini").toString
      ords.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      SparkEntry.queries("q_gini")(spark, dir).collect().head
    }
    val flat = run(Seq.fill(10)(5.0))
    assert(flat.getAs[Double]("gini") === 0.0,
      "uniform spend is exactly zero inequality under the rank formula")
    // spends {1,1,1,1,96}: sum(i*x) = 1+2+3+4+480 = 490,
    // G = 2*490/(5*100) - 6/5 = 0.76; top decile = rank 5 alone = 0.96
    val whale = run(Seq(1.0, 1.0, 1.0, 1.0, 96.0))
    assert(whale.getAs[Double]("gini") === 0.76, s"$whale")
    assert(whale.getAs[Double]("top_decile_share") === 0.96)
  }

  test("q_mann_whitney matches hand-computed U on separated and tied arms") {
    def run(vals: Seq[(Long, Double)]) = {
      val ev = vals.zipWithIndex.map { case ((u, v), i) =>
        (i.toLong, u, "purchase", v)
      }.toDF("event_id", "user_id", "event_type", "value")
        .withColumn("ts",
          timestamp_micros(lit(1700000000000000L) + col("event_id")))
      val dir = java.nio.file.Files.createTempDirectory("mw").toString
      ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
      SparkEntry.queries("q_mann_whitney")(spark, dir).collect().head
    }
    // arm A (even users) = {1,2,3} fully below arm B = {10,11,12,13}:
    // R_a = 6, U_a = 0, z = -6/sqrt(8) = -2.1213 -> significant
    val sep = run(Seq((2L, 1.0), (4L, 2.0), (6L, 3.0),
      (1L, 10.0), (3L, 11.0), (5L, 12.0), (7L, 13.0)))
    assert(sep.getAs[Long]("n_a") === 3L && sep.getAs[Long]("n_b") === 4L)
    assert(sep.getAs[Double]("u_a") === 0.0)
    assert(sep.getAs[Double]("z") === -2.1213)
    assert(sep.getAs[Boolean]("significant"))
    // fully tied sample: U_a = n_a*n_b/2 exactly, z undefined (NULL)
    val tied = run(Seq((2L, 5.0), (4L, 5.0), (1L, 5.0), (3L, 5.0)))
    assert(tied.getAs[Double]("u_a") === 2.0)
    assert(tied.isNullAt(tied.fieldIndex("z")))
  }

  test("q_quantile_sample: a sub-k universe estimates exactly, ranks " +
      "follow the pinned rule") {
    // 10 events of one type, values 1..10: the 256-row sample IS the
    // set, so estimates must EQUAL the exact quantiles; the shared
    // rank rule reads p50 at rank (9*50) div 100 + 1 = 5 -> value 5,
    // p95 at rank (9*95) div 100 + 1 = 9 -> value 9
    val ev = (1 to 10).map(i => (i.toLong, 1L, "view", i.toDouble))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts",
        timestamp_micros(lit(1700000000000000L) + col("event_id")))
    val dir = java.nio.file.Files.createTempDirectory("qs").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_quantile_sample")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n") === 10L && r.getAs[Long]("n_sample") === 10L)
    assert(r.getAs[Double]("p50_exact") === 5.0)
    assert(r.getAs[Double]("p50_est") === 5.0)
    assert(r.getAs[Double]("p95_exact") === 9.0)
    assert(r.getAs[Double]("p95_est") === 9.0)
  }

  test("q_chi2: a product table reads exactly 0, a diagonal 2x2 reads " +
      "20 with V = 1") {
    val D = 86400000000L
    def run(cells: Seq[(String, Int, Int)]) = {
      // (type, dayOffset, count); day 0 epoch is a Thursday — offsets
      // only need to be DISTINCT dows, which 0..6 are
      val ev = cells.flatMap { case (t, day, n) =>
        (0 until n).map(i => (t, day))
      }.zipWithIndex.map { case ((t, day), i) =>
        (i.toLong, 1L, t, 1.0,
          new java.sql.Timestamp((day * D + 1000000L * i) / 1000))
      }.toDF("event_id", "user_id", "event_type", "value", "ts")
      val dir = java.nio.file.Files.createTempDirectory("chi").toString
      ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
      SparkEntry.queries("q_chi2")(spark, dir).collect().head
    }
    // independent by construction: O(t_i, d_j) = w_i · v_j factors, so
    // O·N = r·c exactly in every cell and chi2 is integer-exact 0
    val ind = run(for (d <- 0 to 6; (t, w) <- Seq(("a", 1), ("b", 2)))
      yield (t, d, w))
    assert(ind.getAs[Double]("chi2") === 0.0)
    assert(ind.getAs[Double]("cramers_v") === 0.0)
    // perfect 2x2 association: E = 5 per cell, chi2 = 4·(5²/5) = 20,
    // V = sqrt(20/(20·1)) = 1
    val dep = run(Seq(("a", 0, 10), ("b", 1, 10)))
    assert(dep.getAs[Long]("dof") === 1L)
    assert(dep.getAs[Double]("chi2") === 20.0)
    assert(dep.getAs[Double]("cramers_v") === 1.0)
  }

  test("q_t_closeness: a global-matching group reads emd 0, a " +
      "one-extreme-band group reads the hand EMD and trips at_risk") {
    // global bands over 3 groups of 10: group a mirrors the global
    // mix exactly, group c sits entirely on the top band.
    // bands 0/1/2; global = a(4,3,3)+b(4,3,3)+c(0,0,10) = (8,6,16).
    val rows =
      Seq.fill(4)(("a", 0L)) ++ Seq.fill(3)(("a", 1L)) ++
        Seq.fill(3)(("a", 2L)) ++
      Seq.fill(4)(("b", 0L)) ++ Seq.fill(3)(("b", 1L)) ++
        Seq.fill(3)(("b", 2L)) ++
      Seq.fill(10)(("c", 2L))
    val bands = rows.toDF("c_mktsegment", "band")
      .withColumn("c_nationkey", lit(1))
    val got = graft.queries.StatsPack.tClosenessFrom(bands)
      .collect().map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Double]("emd"), r.getAs[Boolean]("at_risk"))).toMap
    // c: p=(0,0,1), q=(8,6,16)/30 → cum diffs -8/30, -14/30, 0
    //    emd = (8+14)/30/2 = 11/30
    assert(got("c")._1 === math.floor(11.0 / 30 * 1e6) / 1e6 ||
      got("c")._1 === BigDecimal(11.0 / 30).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got("c")._2)
    // a and b: p=(.4,.3,.3) vs q=(.2667,.2,.5333): cum diffs 4/30,
    //    7/30, 0 → emd = (11/30)/2 = 11/60 < 0.2
    assert(got("a")._1 === got("b")._1)
    assert(math.abs(got("a")._1 - 11.0 / 60) < 1e-6 && !got("a")._2)
  }

  private def writeEvents(vals: Seq[(String, Double)]): String = {
    val ev = vals.zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, 1L, t, v)
    }.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts",
        timestamp_micros(lit(1700000000000000L) + col("event_id")))
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_ks_test: disjoint arms read D = 1, a spread change invisible " +
      "to the rank test reads the hand D with the min-value argmax") {
    def run(vals: Seq[(String, Double)]) =
      SparkEntry.queries("q_ks_test")(spark, writeEvents(vals))
        .collect().head
    // all purchases strictly below all views: D = 1 exactly at the
    // last purchase value; arms of 10 so the asymptotic critical
    // value 1.358·sqrt(20/100) ≈ 0.607 sits below 1 and trips (at
    // 3-vs-3 crit is 1.109 — no D can be significant, by design)
    val sep = run((1 to 10).map(i => "purchase" -> i.toDouble) ++
      (21 to 30).map(i => "view" -> i.toDouble))
    assert(sep.getAs[Long]("n1") === 10L && sep.getAs[Long]("n2") === 10L)
    assert(sep.getAs[Double]("d") === 1.0)
    assert(sep.getAs[Double]("d_loc") === 10.0)
    assert(sep.getAs[Boolean]("significant"))
    // equal medians, different spread — U sees nothing, KS sees the
    // tails: purchases {5,5,5,5} vs views {1,5,9}; scaled gaps at
    // values 1/5/9 are 4/4/0 over n1·n2 = 12 → D = 1/3, and the
    // argmax tie (values 1 and 5 both at gap 4) breaks to the
    // SMALLEST value
    val spread = run(Seq("purchase" -> 5.0, "purchase" -> 5.0,
      "purchase" -> 5.0, "purchase" -> 5.0,
      "view" -> 1.0, "view" -> 5.0, "view" -> 9.0))
    assert(spread.getAs[Double]("d") === 0.333333)
    assert(spread.getAs[Double]("d_loc") === 1.0)
    // identical samples: D = 0, nothing significant
    val same = run(Seq("purchase" -> 1.0, "purchase" -> 2.0,
      "view" -> 1.0, "view" -> 2.0))
    assert(same.getAs[Double]("d") === 0.0)
    assert(!same.getAs[Boolean]("significant"))
  }

  test("q_neyman allocates the budget by N·sigma and starves a " +
      "zero-variance stratum") {
    // a = constant (σ=0 → weight 0 → allocation 0: a stratum the
    // estimator already knows exactly gets NOTHING — the operator's
    // defining behavior); b/c have σ ratio 1:2 at equal n, so the
    // floor allocations are (500·28284) div 84852 = 166 and
    // (500·56568) div 84852 = 333, and the one leftover seat goes to
    // b's larger remainder (56568 vs 28284) — allocations sum to the
    // full 500 budget
    val rows = SparkEntry.queries("q_neyman")(spark, writeEvents(
      Seq("a" -> 5.0, "a" -> 5.0, "a" -> 5.0, "a" -> 5.0,
        "b" -> 0.0, "b" -> 2.0, "c" -> 0.0, "c" -> 4.0))).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    assert(!byType.contains("a"), "zero-variance stratum must draw 0")
    assert(byType("b").length === 2 && byType("c").length === 2,
      "allocations exceed tiny stratum sizes, so both draw fully")
    assert(byType("b").head.getAs[Long]("alloc") === 167L)
    assert(byType("c").head.getAs[Long]("alloc") === 333L)
    // ranks are contiguous from 1 within each stratum
    assert(byType("b").map(_.getAs[Long]("rn")).sorted.toSeq === Seq(1L, 2L))
  }

  test("q_anova matches the hand F on two separated groups and reads " +
      "0 on identical ones") {
    def run(vals: Seq[(String, Double)]) =
      SparkEntry.queries("q_anova")(spark, writeEvents(vals))
        .collect().head
    // a = {1,3}, b = {5,7}: means 2/6, grand 4 → SSB = 16, SSW = 4,
    // F = (16/1)/(4/2) = 8, eta² = 16/20 = 0.8 — all exact in the
    // quantized integer units, so the doubles are exact too
    val sepd = run(Seq("a" -> 1.0, "a" -> 3.0, "b" -> 5.0, "b" -> 7.0))
    assert(sepd.getAs[Long]("n") === 4L && sepd.getAs[Long]("k") === 2L)
    assert(sepd.getAs[Double]("ssb") === 16.0)
    assert(sepd.getAs[Double]("ssw") === 4.0)
    assert(sepd.getAs[Double]("f") === 8.0)
    assert(sepd.getAs[Double]("eta2") === 0.8)
    // identical group distributions: SSB = 0 → F = 0, eta² = 0
    val same = run(Seq("a" -> 1.0, "a" -> 3.0, "b" -> 1.0, "b" -> 3.0))
    assert(same.getAs[Double]("ssb") === 0.0)
    assert(same.getAs[Double]("f") === 0.0)
    assert(same.getAs[Double]("eta2") === 0.0)
  }
}
