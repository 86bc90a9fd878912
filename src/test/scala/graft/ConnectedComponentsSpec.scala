package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class ConnectedComponentsSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("labels a simple chain and a separate pair correctly (both paths)") {
    // components: {1,2,3,4} (chain) and {10, 11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    val local = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(local === want)
    // localEdgeThreshold=0 forces the distributed min-label loop
    val dist = Dedup.connectedComponents(pairs, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist === want)
  }

  test("int and numeric-string ids normalize to one bigint schema on both paths") {
    // ids are cast to long up front, so the local and distributed paths
    // agree on the output schema whatever integral-ish type comes in
    val intPairs = Seq((1, 2), (2, 3)).toDF("id_a", "id_b")
    val strPairs = Seq(("1", "2"), ("2", "3")).toDF("id_a", "id_b")
    for (pairs <- Seq(intPairs, strPairs); thresh <- Seq(1000000L, 0L)) {
      val out = Dedup.connectedComponents(pairs, localEdgeThreshold = thresh)
      assert(out.schema("doc_id").dataType.typeName === "long")
      assert(out.schema("cluster_id").dataType.typeName === "long")
      assert(out.as[(Long, Long)].collect().toMap ===
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    }
  }

  test("pointer jumping converges a long chain in few distributed rounds") {
    // a 64-node chain: plain min-label propagation needs 63 rounds;
    // with pointer jumping maxIter=12 must suffice (O(log diameter))
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, maxIter = 12,
      localEdgeThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(got === (1L to 64L).map(_ -> 1L).toMap)
  }

  test("throws instead of returning wrong labels when maxIter is exhausted") {
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIter = 2, localEdgeThreshold = 0L).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("handles an empty pair set without failing") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
  }

  test("star contraction: chain + pair, hub, and duplicate/reversed edges") {
    // components: {1..4} chain, {10,11}, and a hub 20-{21,22,23}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (21L, 20L), (20L, 22L), (23L, 20L), (22L, 20L), (2L, 1L))
      .toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    val got = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("star contraction converges a 128-node chain in O(log n) rounds") {
    // a path graph is the worst case for naive propagation (127 rounds);
    // alternating large/small-star must flatten it within ~2·log2(128)
    val pairs = (1L until 128L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponentsStar(pairs, maxIter = 14)
      .as[(Long, Long)].collect().toMap
    assert(got === (1L to 128L).map(_ -> 1L).toMap)
  }

  test("star contraction: empty pair set and non-convergence error") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponentsStar(empty).count() === 0)
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponentsStar(pairs, maxIter = 1).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("min-label and star contraction agree on a power-law dup graph") {
    // the shape real dup graphs take: a few huge near-dup clusters
    // (boilerplate hubs) plus a long tail of small components. Both
    // distributed paths must produce identical labels, and star
    // contraction must converge within its O(log) round budget even
    // with hub degrees in the hundreds.
    val rnd = new scala.util.Random(0xC0FFEE)
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var next = 0L
    // 3 hubs with power-law-ish sizes 400/150/50: star edges to the hub
    // plus random chords (the blocked-verify extra edges)
    for (size <- Seq(400, 150, 50)) {
      val hub = next; next += 1
      val members = (0 until size).map(_ => { val m = next; next += 1; m })
      members.foreach(m => edges += ((hub, m)))
      for (_ <- 1 to size / 4)
        edges += ((members(rnd.nextInt(size)), members(rnd.nextInt(size))))
      }
    // long tail: 200 chains of length 2-4
    for (_ <- 1 to 200) {
      val len = 2 + rnd.nextInt(3)
      val ids = (0 until len).map(_ => { val m = next; next += 1; m })
      ids.sliding(2).foreach(p => edges += ((p(0), p(1))))
    }
    val pairs = edges.toSeq.filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val minLabel = Dedup.connectedComponents(pairs, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(star === minLabel, "the two distributed CC paths must agree")
    // sanity on the component structure itself
    assert(star.values.toSet.size === 3 + 200, "hubs + tail components")
  }

  test("algorithm comparison: star contraction's shuffle decays, min-label's stays flat") {
    // the §3 rule-10 selection guidance, MEASURED: a deterministic
    // power-law dup graph — clusters of size 10^2/10^3/10^4 with
    // `redundancy` pair edges per member, the shape LSH banding
    // actually emits (every doc collides with several clustermates,
    // not one) — plus a 512-node chain (worst case for label
    // propagation). A pure tree would hide the contraction: star's
    // fixpoint keeps |V|-C edges, so decay only shows when blocking
    // emits redundant pairs, which at real dup density it always does.
    // Built at TWO redundancy levels (same V, ~3× E) so the density-
    // sensitivity claim below is measured, not asserted.
    def buildPairs(redundancy: Int) = {
      val rnd = new scala.util.Random(42)
      val edges = Seq.newBuilder[(Long, Long)]
      def cluster(base: Long, size: Int): Unit =
        (1 until size).foreach { i =>
          (0 until redundancy).foreach { _ =>
            edges += ((base + i, base + rnd.nextInt(i)))
          }
        }
      cluster(1000000L, 10000)
      cluster(3000000L, 1000)
      cluster(4000000L, 100)
      edges += ((1000000L, 3000000L)) // merge the two big clusters
      (0L until 511L).foreach(i => edges += ((5000000L + i, 5000001L + i)))
      edges.result().toDF("id_a", "id_b")
    }
    val pairs = buildPairs(3)

    final case class Round(round: Int, shuffledRows: Long, progress: Long)
    val ml = scala.collection.mutable.ArrayBuffer[Round]()
    val st = scala.collection.mutable.ArrayBuffer[Round]()
    // MEASURED shuffle volume (round 11, closing the r10 advice): a
    // task-metrics listener counts actual shuffle-write records over
    // each whole CC run — the in-code 3V probe value is an analytic
    // per-round label, not evidence; the crossover claim below rests
    // on these listener totals
    def measuredShuffleRows(body: => Unit): Long = {
      val rec = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            rec.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        org.apache.spark.GraftSparkTestBridge
          .waitUntilListenerBusEmpty(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(listener)
      rec.get()
    }
    var mlLabels: Map[Long, Long] = null
    val mlMeasured = measuredShuffleRows {
      mlLabels = Dedup.connectedComponents(pairs, maxIter = 20,
        localEdgeThreshold = 0L,
        onRound = Some((r, s, p) => { ml += Round(r, s, p); () }))
        .as[(Long, Long)].collect().toMap
    }
    var stLabels: Map[Long, Long] = null
    val stMeasured = measuredShuffleRows {
      stLabels = Dedup.connectedComponentsStar(pairs, maxIter = 25,
        onRound = Some((r, s, p) => { st += Round(r, s, p); () }))
        .as[(Long, Long)].collect().toMap
    }
    assert(stLabels === mlLabels, "both algorithms must label identically")
    assert(mlLabels.values.toSet.size === 3, "hubA+hubB merged, hubC, chain")

    val mlTotal = ml.map(_.shuffledRows).sum
    val stTotal = st.map(_.shuffledRows).sum
    info(s"min-label: rounds=${ml.size} perRoundEstimate=${ml.head.shuffledRows} " +
      s"analyticTotal=$mlTotal MEASURED=$mlMeasured " +
      s"changed=${ml.map(_.progress).mkString(",")}")
    info(s"star: rounds=${st.size} analyticTotal=$stTotal MEASURED=$stMeasured " +
      s"volumes=${st.map(_.shuffledRows).mkString(",")} " +
      s"edges=${st.map(_.progress).mkString(",")}")
    // the structural claims behind §3 rule 10:
    // 1. the probe's per-round label is the ANALYTIC estimate 3V (flat
    //    by construction — asserting it against the formula would be
    //    circular, so no such assertion); what IS asserted: the
    //    MEASURED whole-run volume stays within the analytic model's
    //    ballpark (per-round joins/aggs + the one-time layout cost,
    //    bounded here by 4 model units), i.e. nothing edge-sized
    //    secretly moves per round
    val mlPerRound = ml.head.shuffledRows
    assert(mlMeasured < 4L * (mlTotal + 3 * pairs.count()),
      s"measured min-label shuffle $mlMeasured blows past the analytic " +
        s"model ($mlTotal + one-time layout) — something edge-sized is " +
        "moving per round")
    // 2. star contraction's edge set shrinks to the star fixpoint
    //    (|V| - C edges) and sheds the redundant pair edges within two
    //    rounds; the per-round volume sequence never grows
    val stVols = st.map(_.shuffledRows).toSeq
    assert(stVols.zip(stVols.tail).forall { case (a, b) => b <= a },
      s"star per-round volume must decay, got $stVols")
    assert(st.last.progress === mlLabels.size.toLong - 3,
      "star fixpoint must be one star per component")
    assert(st(1).progress < mlLabels.size.toLong * 3 / 2,
      "redundant cluster edges must collapse within two rounds")
    // 3. chains are why neither loop is O(1) rounds: both need
    //    O(log diameter) — the 512-chain keeps them in single digits+
    assert(ml.size <= 12 && st.size <= 12,
      s"512-chain must converge in O(log d) rounds (ml=${ml.size}, st=${st.size})")
    // ...while star's early rounds carry the E-sized canonicalization
    // cost min-label's parked layout never pays per round
    assert(stVols.head > mlPerRound,
      "star's first round carries the E-sized cost")
    // 4. the MEASURED verdict (round 11 — this REVERSES round 10's
    //    'min-label total undercuts star' guidance, which rested on
    //    the circular 3V probe label; real task metrics refute it):
    //    star contraction is CHEAPER end to end on this redundant-pair
    //    power-law graph at BOTH densities — measured ml ≈ 1.05M vs
    //    star ≈ 0.65M records at redundancy 3, ×1.32 vs ×1.27 growth
    //    at redundancy 9. Two causes the analytic model missed:
    //    star's round-0 distinct() absorbs redundant pairs as cheaply
    //    as min-label's one-time layout, and min-label's neighbor-min
    //    partials multiply with the partition count (~5V/round here,
    //    not ≤V). Min-label's surviving property is BOUNDEDNESS, not
    //    cheapness: per-round volume is flat and edge-independent
    //    (assertion 1), where star's early rounds spike with E.
    val pairs3x = buildPairs(9) // same V, ~3x the redundant pairs
    val ml3x = measuredShuffleRows {
      Dedup.connectedComponents(pairs3x, maxIter = 20,
        localEdgeThreshold = 0L).count()
    }
    val st3x = measuredShuffleRows {
      Dedup.connectedComponentsStar(pairs3x, maxIter = 25).count()
    }
    val mlGrowth = ml3x.toDouble / mlMeasured
    val stGrowth = st3x.toDouble / stMeasured
    info(s"3x density: min-label $mlMeasured -> $ml3x (x$mlGrowth), " +
      s"star $stMeasured -> $st3x (x$stGrowth)")
    assert(stMeasured < mlMeasured,
      s"§3 rule 10 rests on this measurement: star (measured $stMeasured) " +
        s"beat min-label (measured $mlMeasured) at redundancy 3 — if this " +
        "flips, update the guidance again")
    assert(st3x < ml3x,
      s"...and at redundancy 9 (star $st3x vs min-label $ml3x)")
    assert(mlGrowth < 1.6,
      s"with edges parked, 3x redundant pairs may only add the one-time " +
        s"layout cost, got x$mlGrowth")
  }

  test("matches a union-find ground truth on real near-dup pairs") {
    val pairs = graft.queries.DedupPack.defs("dedup_jaccard")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.connectedComponents(
      pairs.toSeq.toDF("id_a", "id_b")).as[(Long, Long)].collect().toMap
    assert(got === truth)
  }
}
