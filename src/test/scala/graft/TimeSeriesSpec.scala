package graft

/** Semantic gates for the round-11 time-series keys (the oracle gate
  * is the exact check; these pin the statistical invariants). */
class TimeSeriesSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("motifFrom: a constant series is all-'dddd' with a dist-0 first pair") {
    // flat windows have sigma = 0, so every segment compare lands in
    // the ELSE branch — the documented flat-window convention — and
    // every non-overlapping pair is an exact dist-0 motif occurrence
    val daily = (0L until 20L).map(d => ("t", d, 1000L))
      .toDF("event_type", "day", "dq")
    val rows = graft.queries.AnalyticsPack.motifFrom(daily).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("word") === "dddd")
    assert(r.getAs[Long]("n_win") === 13L) // 20 - 8 + 1 windows
    assert(r.getAs[Long]("d1") === 0L)
    assert(r.getAs[Long]("d2") === 8L) // first non-overlapping partner
    assert(r.getAs[Double]("dist") === 0.0)
  }

  test("motifFrom finds a planted repeated pattern as an exact-match pair") {
    // the same 8-day shape planted at days 2 and 20 over a flat
    // baseline: the two aligned windows symbolize to the same word and
    // their exact distance is 0 at offset 18 (partial-overlap windows
    // repeat at the same offset, so assert on d2 - d1, not d1 itself)
    val pat = Seq(1010L, 1010L, 1900L, 1900L, 1010L, 1010L, 1400L, 1400L)
    val vals = (0 until 30).map { d =>
      if (d >= 2 && d < 10) pat(d - 2)
      else if (d >= 20 && d < 28) pat(d - 20)
      else 1000L
    }
    val daily = vals.zipWithIndex.map { case (v, d) => ("t", d.toLong, v) }
      .toDF("event_type", "day", "dq")
    val rows = graft.queries.AnalyticsPack.motifFrom(daily).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getAs[Int]("rk") <= 5))
    val exact = rows.filter(r => !r.isNullAt(r.fieldIndex("dist")) &&
      r.getAs[Double]("dist") === 0.0 &&
      r.getAs[Long]("d2") - r.getAs[Long]("d1") === 18L)
    assert(exact.nonEmpty, rows.mkString("\n"))
  }

  test("motifIsaxFrom equals motifFrom row-for-row and the grid index " +
      "MEASURABLY prunes: cell-pair probes ≪ the brute-force pair scan") {
    // one shape at 8 amplitudes (two identical — the seed collision),
    // 8-day blocks: every aligned window symbolizes to the SAME word
    // (z-normalization is scale-invariant) while the amplitudes spread
    // the raw-PAA cells far apart, so the bsf = 0 seed pair prunes
    // every cross-amplitude cell pair via the integer lower bound
    val pat = Seq(1000L, 1000L, 1900L, 1900L, 1000L, 1000L, 1400L, 1400L)
    val amps = Seq(1L, 1L, 40L, 80L, 120L, 160L, 200L, 240L)
    val vals = amps.flatMap(c => pat.map(_ * c))
    val daily = vals.zipWithIndex.map { case (v, d) => ("t", d.toLong, v) }
      .toDF("event_type", "day", "dq")
    val brute = graft.queries.AnalyticsPack.motifFrom(daily)
      .collect().sortBy(r => (r.getAs[String]("event_type"),
        r.getAs[Int]("rk"))).toSeq
    val indexed = graft.queries.AnalyticsPack.motifIsaxFrom(daily)
      .collect().sortBy(r => (r.getAs[String]("event_type"),
        r.getAs[Int]("rk"))).toSeq
    assert(indexed === brute,
      "the index probe must reproduce the brute-force rows exactly")
    // measured pruning on the aligned-block word (8 windows → 28
    // brute pairs): the seed's exact-dup pair drives bsf to 0, so only
    // lb = 0 cell pairs expand
    val (cand, _, top) = graft.queries.AnalyticsPack.motifIsaxParts(daily)
    import org.apache.spark.sql.functions.{col, desc}
    val topWord = top.orderBy(desc("n_win"), col("word"))
      .select("word").head.getString(0)
    val probed = cand.filter(col("word") === topWord).count()
    assert(probed >= 1, "the seed pair itself must be probed")
    assert(probed <= 10,
      s"expected ≪ 28 brute pairs through the pruned index, got $probed")
  }

  test("q_dtw_barycenter_iter: Fréchet² descends across the three " +
      "re-marking passes and every index aligns at least one cell per pass") {
    // the round-14 honest-math find gates SQUARED descent, not L1 —
    // this key runs squared local costs end to end, so the published
    // DBA descent property is MEASURED here on the gate corpus
    val rows = SparkEntry.queries("q_dtw_barycenter_iter")(s, sfDir)
      .collect()
    val byPass = rows.groupBy(_.getAs[Int]("pass"))
    assert(byPass.keySet === Set(1, 2, 3))
    val f = (1 to 3).map(p => byPass(p).head.getAs[Long]("frechet2"))
    assert(f(0) >= f(1) && f(1) >= f(2),
      s"Fréchet² must be non-increasing across passes, got $f")
    assert(f(0) > f(2), "three passes on real data must actually improve")
    byPass.values.foreach { rs =>
      assert(rs.length === 30, "one row per barycenter index")
      assert(rs.forall(_.getAs[Long]("n_align") >= 1L))
    }
  }

  test("q_acf: 7 lags per type, every r in [-1, 1]") {
    val rows = SparkEntry.queries("q_acf")(s, sfDir)
      .as[(String, Int, Double)].collect()
    val byType = rows.groupBy(_._1)
    assert(byType.nonEmpty)
    byType.foreach { case (t, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to 7), s"type $t lag set")
      // Cauchy-Schwarz bounds the true ACF by 1; the lag-k partial sum
      // can exceed it only by the missing-terms margin, tiny here
      rs.foreach { case (_, k, r) =>
        assert(r >= -1.05 && r <= 1.05, s"type $t lag $k r=$r")
      }
    }
  }

  test("q_seasonality: per-type index mass sums to 7") {
    val rows = SparkEntry.queries("q_seasonality")(s, sfDir)
      .as[(String, Int, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.map(_._2).toSet.subsetOf((0 to 6).toSet))
      val mass = rs.map(_._4).sum
      assert(math.abs(mass - 7.0) < 0.01, s"type $t index mass $mass")
    }
  }

  test("q_theilsen: n_pairs = C(days,2) and slope is the pair median") {
    val rows = SparkEntry.queries("q_theilsen")(s, sfDir)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, nPairs, slope) =>
      // n_pairs must be a binomial coefficient C(d,2) for some d
      val d = (1 + math.sqrt(1 + 8.0 * nPairs)) / 2
      assert(math.abs(d - math.round(d)) < 1e-9, s"type $t n_pairs $nPairs")
      assert(!slope.isNaN && !slope.isInfinite)
    }
  }

  test("q_xcorr recovers a planted one-day lead-lag") {
    // type "a": bursts on even days; type "b": the same bursts one day
    // LATER (b(t+1) = a(t)) plus a flat floor — the pair's r must peak
    // exactly at lag +1 and the peak must be strong
    import org.apache.spark.sql.functions._
    val rows = (0 until 40).flatMap { day =>
      val burst = if (day % 2 == 0) 5 else 1
      Seq.fill(burst)(("a", day.toLong)) ++
        Seq.fill(if ((day - 1) % 2 == 0) 5 else 1)(("b", day.toLong))
    }
    val ev = rows.toDF("event_type", "dayno")
      .select(col("event_type"),
        timestamp_micros(col("dayno") * 86400000000L + 1000L).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("xcorr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_xcorr")(s, dir)
      .collect().map(r => (r.getAs[Int]("lag"),
        (r.getAs[Long]("n_days"), r.getAs[Double]("r")))).toMap
    assert(got.keySet === (-3 to 3).toSet)
    // a(t) vs b(t+l): the planted relation is b(t+1) = a(t) → lag +1
    assert(got(1)._2 > 0.95, s"planted lag must read r~1: ${got.toSeq.sortBy(_._1)}")
    assert(got(0)._2 < -0.5, s"aligned days anti-correlate: ${got(0)._2}")
    assert(got.values.map(_._2).max === got(1)._2, "peak must sit at lag +1")
  }

  test("q_survival matches a hand-computed Kaplan-Meier curve") {
    import org.apache.spark.sql.functions._
    // 10 users: 5 convert at t=2, 3 at t=5, 2 never purchase (censored
    // at span end - first day = 9). Hand KM:
    //   t=2: S = 1 - 5/10            = 0.5
    //   t=5: S = 0.5 * (1 - 3/5)     = 0.2
    //   t=9: censored only, S stays    0.2
    val rows =
      (1 to 5).flatMap(u => Seq((u.toLong, 0L, "view"), (u.toLong, 2L, "purchase"))) ++
        (6 to 8).flatMap(u => Seq((u.toLong, 0L, "view"), (u.toLong, 5L, "purchase"))) ++
        (9 to 10).flatMap(u => Seq((u.toLong, 11L, "view"), (u.toLong, 20L, "view")))
    val ev = rows.toDF("user_id", "dayno", "event_type")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("dayno") * 86400000000L + 1000L).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("surv").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_survival")(s, dir)
      .collect().map(r => (r.getAs[Long]("t_days"),
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_death"),
          r.getAs[Long]("n_censored"), r.getAs[Double]("surv")))).toMap
    assert(got.keySet === Set(2L, 5L, 9L))
    assert(got(2L) === ((10L, 5L, 0L, 0.5)))
    assert(got(5L) === ((5L, 3L, 0L, 0.2)))
    assert(got(9L) === ((2L, 0L, 2L, 0.2)))
  }

  test("q_attribution allocates hand-computed credit under all four models") {
    // u1: view d4, click d5, signup d9 -> purchase d10  (3 touches)
    // u2: click d9 -> purchase d10                      (1 touch)
    // u3: view d1 -> purchase d10   (outside the 7-day lookback)
    // u4: view d2, no purchase      (never credited)
    // u5: view d5, click d6 -> purchase d10             (2 touches)
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, 1L, 4L, "view"), (2L, 1L, 5L, "click"), (3L, 1L, 9L, "signup"),
      (4L, 1L, 10L, "purchase"),
      (5L, 2L, 9L, "click"), (6L, 2L, 10L, "purchase"),
      (7L, 3L, 1L, "view"), (8L, 3L, 10L, "purchase"),
      (9L, 4L, 2L, "view"),
      (10L, 5L, 5L, "view"), (11L, 5L, 6L, "click"),
      (12L, 5L, 10L, "purchase"))
    val ev = rows.toDF("event_id", "user_id", "dayno", "event_type")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("dayno") * 86400000000L + col("user_id"))
          .as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("attrib").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_attribution")(s, dir)
      .collect().map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Double]("first_touch"),
          r.getAs[Double]("last_touch"), r.getAs[Double]("linear"),
          r.getAs[Double]("u_shaped")))).toMap
    assert(got.keySet === Set("view", "click", "signup"))
    assert(got("view") === ((2L, 2.0, 0.0, 0.833, 0.9)))
    assert(got("click") === ((3L, 1.0, 2.0, 1.833, 1.7)))
    assert(got("signup") === ((1L, 0.0, 1.0, 0.333, 0.4)))
  }

  test("q_forecast recovers level exactly and trend at the kernel lag on a linear series") {
    import org.apache.spark.sql.functions._
    // one event per day, value = 100 + 10*day: on a linear series the
    // smoothing lags cancel in level = 2*s1 - s2 (exactly x_t), and
    // trend reads m*L with the truncated-kernel lag L = 247/255
    val rows = (0 until 30).map(day => (day.toLong, 100.0 + 10.0 * day))
    val ev = rows.toDF("dayno", "value")
      .select(lit("a").as("event_type"), col("value"),
        timestamp_micros(col("dayno") * 86400000000L + 1000L).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("fc").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_forecast")(s, dir).collect().head
    assert(r.getAs[Long]("n_days") === 30L)
    val level = r.getAs[Double]("level")
    val trend = r.getAs[Double]("trend")
    assert(math.abs(level - 390.0) < 0.01, s"level $level vs x_29 = 390")
    val expectTrend = 10.0 * 247.0 / 255.0
    assert(math.abs(trend - expectTrend) < 0.05, s"trend $trend vs $expectTrend")
    assert(math.abs(r.getAs[Double]("fc_1") - (level + trend)) < 0.01)
    assert(math.abs(r.getAs[Double]("fc_7") - (level + 7 * trend)) < 0.01)
  }

  test("decomposeFrom: a pure weekly cycle is all season, zero residual") {
    // y has period 7, so every centered 7-day window sums to the same
    // period total: trend7 is constant, the per-dow seasonal absorbs
    // the whole cycle, and the residual is exactly zero on every
    // interior day
    val cycle = Seq(100L, 250L, 250L, 250L, 250L, 250L, 400L)
    val daily = (0L until 28L).map(d => ("t", d, cycle((d % 7).toInt)))
      .toDF("event_type", "day", "y")
    val rows = graft.queries.AnalyticsPack.decomposeFrom(daily).collect()
    assert(rows.length === 22) // 28 - 6 edge days
    val period = cycle.sum
    rows.foreach { r =>
      assert(r.getAs[Long]("t7") === period)
      assert(r.getAs[Long]("seas7") ===
        7L * r.getAs[Long]("y") - period)
      assert(r.getAs[Long]("resid7") === 0L)
    }
  }

  test("decomposeFrom: a one-day spike lands in the residual, not the " +
      "season") {
    // flat series + one +70 spike: the spike's own residual carries
    // ~the full 7x-scaled deviation (minus what the 4-week dow mean
    // absorbs), while days outside the spike's 7-day window stay small
    val daily = (0L until 28L).map(d =>
      ("t", d, if (d == 14L) 170L else 100L)).toDF("event_type", "day", "y")
    val rows = graft.queries.AnalyticsPack.decomposeFrom(daily)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("resid7"))
      .toMap
    // exact replay: detr7(14) = 7·170 − 770 = 420; its dow mean over
    // the 3 interior occurrences (days 7/14/21) = 420 div 3 = 140 →
    // resid 280. Days 7 and 21 share that dow with detr7 = 0 → resid
    // −140; the spike's window neighbors carry detr7 = −70, dow mean
    // −23 or −17 (3- vs 4-occurrence dow groups) → resid magnitudes
    // capped by the ±70 window deviation. Spike dominates 2×.
    assert(rows(14L) === 280L)
    assert(rows(7L) === -140L && rows(21L) === -140L)
    rows.filterNot(r => Set(7L, 14L, 21L)(r._1)).foreach { case (d, r) =>
      assert(math.abs(r) <= 70L, s"day $d residual $r")
    }
  }

  test("q_concurrency: overlap peaks count, midnight-crossing sessions " +
      "clip into both days") {
    val D = 86400000000L
    def ev(id: Long, user: Long, us: Long) = (id, user,
      new java.sql.Timestamp(us / 1000), "view", 1.0)
    // user 1: one session 00:05–00:10; user 2: one event at 00:07
    // (inside 1's span → peak 2); user 3: 23:50 + next-day 00:10 =
    // ONE session crossing midnight (20-min gap < 30)
    val rows = Seq(
      ev(1, 1L, 5L * 60000000), ev(2, 1L, 10L * 60000000),
      ev(3, 2L, 7L * 60000000),
      ev(4, 3L, 23L * 3600000000L + 50L * 60000000),
      ev(5, 3L, D + 10L * 60000000))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("conc").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_concurrency")(s, dir).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("peak"))).toMap
    assert(out(0L) === ((3L, 2L)), s"day 0: ${out.toSeq.sorted}")
    assert(out(1L) === ((1L, 1L)), s"day 1: ${out.toSeq.sorted}")
  }

  test("markovStationaryFrom: a 2-cycle keeps uniform mass exactly, " +
      "an absorbing end leaks it") {
    def run(pairs: Seq[(String, String)]) =
      graft.queries.AnalyticsPack.markovStationaryFrom(
        pairs.toDF("from_type", "to_type")).collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("pi9"), r.getAs[Long]("delta9"))).toMap
    // A <-> B with equal flow: uniform is stationary, every round is a
    // fixpoint — exact halves, delta exactly 0
    val cyc = run(Seq(("a", "b"), ("b", "a")))
    assert(cyc("a") === ((500000000L, 0L)))
    assert(cyc("b") === ((500000000L, 0L)))
    // a -> b only, and b never emits: b is not a state, so the whole
    // unit drains out of the chain — the documented absorbing-end leak
    val leak = run(Seq(("a", "b")))
    assert(leak.keySet === Set("a"))
    assert(leak("a")._1 === 0L)
  }

  test("dtwFrom matches a driver-side reference DP on identical, " +
      "shifted and bumpy 30-day series") {
    def refDtw(a: Seq[Long], b: Seq[Long]): Long = {
      val (n, m) = (a.length, b.length)
      val dp = Array.fill(n, m)(0L)
      for (i <- 0 until n; j <- 0 until m) {
        val c = math.abs(a(i) - b(j))
        dp(i)(j) = c + ((i, j) match {
          case (0, 0) => 0L
          case (0, _) => dp(0)(j - 1)
          case (_, 0) => dp(i - 1)(0)
          case _ => math.min(dp(i - 1)(j),
            math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
        })
      }
      dp(n - 1)(m - 1)
    }
    val n = graft.queries.AnalyticsPack.DtwDays
    val sa = (0 until n).map(i => ((i * 13) % 7).toLong)
    val sb = (0 until n).map(i => sa((i + 1) % n)) // locally shifted
    val sc = sa                                    // identical
    val daily = (for ((ser, t) <- Seq((sa, "a"), (sb, "b"), (sc, "c"));
        i <- 0 until n) yield (t, 100L + i, ser(i)))
      .toDF("event_type", "day", "n")
    val got = graft.queries.AnalyticsPack.dtwFrom(daily).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        -> r.getAs[Long]("dtw")).toMap
    assert(got(("a", "c")) === 0L, "identical series read 0")
    assert(got(("a", "b")) === refDtw(sa, sb))
    assert(got(("b", "c")) === refDtw(sb, sc))
    // elasticity: the one-step shift aligns far below its rigid
    // euclidean-on-counts distance
    assert(got(("a", "b")) < sa.zip(sb).map(p => math.abs(p._1 - p._2)).sum)
  }

  test("dtwBandedFrom: band=infinity equals full DTW; a narrow band " +
      "refuses a warp wider than its radius") {
    val n = graft.queries.AnalyticsPack.DtwDays
    // a triangular bump over a zero baseline: full DTW aligns the
    // SAME bump twenty days late at zero cost (warp along the zero
    // floor), but that warp needs |i - j| up to 20 — far outside the
    // band, which must price the late bump as genuinely different
    def bump(at: Int): IndexedSeq[Long] = (0 until n).map { i =>
      Seq(0L, 10L, 30L, 50L, 30L, 10L)(
        if (i >= at && i < at + 5) i - at + 1 else 0)
    }
    val sa = bump(2)
    val sb = bump(3)  // one-day shift: inside every band here
    val sc = bump(22) // twenty-day shift
    val daily = (for ((ser, t) <- Seq((sa, "a"), (sb, "b"), (sc, "c"));
        i <- 0 until n) yield (t, 100L + i, ser(i)))
      .toDF("event_type", "day", "n")
    def run(band: Int) = graft.queries.AnalyticsPack
      .dtwBandedFrom(daily, band).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        -> r.getAs[Long]("dtw_band")).toMap
    val full = graft.queries.AnalyticsPack.dtwFrom(daily).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        -> r.getAs[Long]("dtw")).toMap
    // a band at least as wide as the grid is exactly full DTW
    assert(run(n) === full)
    // the default band: a one-step shift fits inside it (identical
    // distance), the ten-step shift does not (priced strictly higher)
    val banded = run(graft.queries.AnalyticsPack.DtwBand)
    assert(banded(("a", "b")) === full(("a", "b")))
    assert(banded(("a", "c")) > full(("a", "c")))
    // monotone in the radius: tightening can only raise the distance
    assert(run(2)(("a", "c")) >= banded(("a", "c")))
  }

  test("dtwBarycenterFrom: picks the planted medoid and its one-pass " +
      "barycenter descends the squared-cost Fréchet function") {
    // squared ground cost: the DBA mean update is the exact minimizer
    // of the per-index squared residuals over a FIXED alignment, so on
    // a unique-alignment corpus one pass provably decreases this sum
    // (re-alignment can only decrease it further); under the family's
    // |a-b| display metric the mean is not the L1 minimizer, which is
    // why the gate is Fréchet-squared, not dtw-L1
    def refDtwSq(a: Seq[Double], b: Seq[Double]): Double = {
      val (n, m) = (a.length, b.length)
      val dp = Array.fill(n, m)(0.0)
      for (i <- 0 until n; j <- 0 until m) {
        val c = (a(i) - b(j)) * (a(i) - b(j))
        dp(i)(j) = c + ((i, j) match {
          case (0, 0) => 0.0
          case (0, _) => dp(0)(j - 1)
          case (_, 0) => dp(i - 1)(0)
          case _ => math.min(dp(i - 1)(j),
            math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
        })
      }
      dp(n - 1)(m - 1)
    }
    val n = graft.queries.AnalyticsPack.DtwDays
    // a steep ramp makes EVERY pairwise optimal path the unique
    // diagonal (an off-diagonal step costs ≥ 1000 - 30 more than
    // staying on it), so the all-optimal-paths marking is exactly one
    // cell per pair per index and the barycenter is the pointwise mean
    val sm = (0 until n).map(i => 1000L * i)
    val sx = sm.zipWithIndex.map { case (v, i) =>
      if (i >= 5 && i < 11) v + 30 else v }   // +30 on W1
    val sy = sm.zipWithIndex.map { case (v, i) =>
      if (i >= 18 && i < 24) v - 30 else v }  // -30 on W2
    val daily = (for ((ser, t) <- Seq((sm, "m"), (sx, "x"), (sy, "y"));
        i <- 0 until n) yield (t, 100L + i, ser(i)))
      .toDF("event_type", "day", "n")
    val rows = graft.queries.AnalyticsPack.dtwBarycenterFrom(daily)
      .collect().sortBy(_.getAs[Int]("i"))
    assert(rows.length === n)
    // medoid: pairwise L1 sums are m: 360, x: 540, y: 540
    assert(rows.forall(_.getAs[String]("medoid") == "m"),
      "m is the planted medoid")
    // unique diagonal alignment: exactly one cell per pair per index
    assert(rows.forall(_.getAs[Long]("n_align") === 2L))
    // pointwise mean: +10 on W1, -10 on W2, the ramp elsewhere
    val bary = rows.map(_.getAs[Long]("bary_q") / 1e6)
    assert(bary(5) === sm(5) + 10.0 && bary(18) === sm(18) - 10.0)
    val corpus = Seq(sm, sx, sy).map(_.map(_.toDouble))
    val medCost = corpus.map(s => refDtwSq(sm.map(_.toDouble), s)).sum
    val baryCost = corpus.map(s => refDtwSq(bary.toSeq, s)).sum
    assert(baryCost < medCost,
      s"one DBA pass must descend: $baryCost vs $medCost")
  }
}
