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
