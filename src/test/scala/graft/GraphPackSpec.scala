package graft

import org.apache.spark.sql.functions._
import graft.queries.GraphPack

/** Graph kernels: triangle counting vs brute force, BFS vs a
  * driver-side reference walk. */
class GraphPackSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("perNodeTriangles matches brute-force enumeration on a hand graph") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + a pendant 5-1 +
    // a disjoint triangle {6,7,8} + an isolated edge 9-10
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (6L, 7L), (6L, 8L), (7L, 8L), (9L, 10L)
    ).toDF("u", "v")
    val got = GraphPack.perNodeTriangles(edges)
      .as[(Long, Long)].collect().toMap
    val es = edges.as[(Long, Long)].collect().toSet
    def adj(a: Long, b: Long) = es.contains((a min b, a max b))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b && adj(a, b)
      c <- nodes if b < c && adj(b, c) && adj(a, c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === brute)
    assert(got.values.sum / 3 === 5L) // 4 in K4 + 1 disjoint
  }

  test("perNodeTriangles on a hub star is wedge-bounded (zero triangles)") {
    // star K1,50: un-oriented wedge count at the hub is C(50,2); the
    // oriented kernel must still return an EMPTY result (no triangles)
    val star = (1 to 50).map(i => (0L, i.toLong)).toDF("u", "v")
    assert(GraphPack.perNodeTriangles(star).count() === 0L)
  }

  test("q_triangles top-20 agrees with recount on sf0.001") {
    val df = SparkEntry.queries("q_triangles")(s, sfDir).collect()
    assert(df.length === 20)
    val total = df.head.getAs[Long]("total_tri")
    assert(df.forall(_.getAs[Long]("total_tri") === total))
    assert(total > 0)
    // ranks are 1..20 and tri non-increasing
    val tris = df.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("tri"))
    assert(tris.zip(tris.tail).forall { case (a, b) => a >= b })
  }

  test("q_reach hop histogram matches a driver-side reference BFS") {
    val got = SparkEntry.queries("q_reach")(s, sfDir)
      .as[(Int, Long)].collect().toMap
    // reference BFS over the same bipartite graph, driver-side
    val ps = Tables.lineitem(s, sfDir)
      .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
      .withDefaultValue(Nil)
    ps.foreach { case (p, sk) =>
      adj(p * 2) ::= sk * 2 + 1; adj(sk * 2 + 1) ::= p * 2
    }
    val dist = scala.collection.mutable.Map[Long, Int]()
    var frontier = adj.keys.filter(n => n % 2 == 0 && n / 2 <= 2).toSet
    frontier.foreach(dist(_) = 0)
    for (r <- 1 to 4) {
      frontier = frontier.flatMap(adj).filterNot(dist.contains)
      frontier.foreach(dist(_) = r)
    }
    val expect = dist.values.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    } ++ {
      val unreached = adj.size - dist.size
      if (unreached > 0) Map(-1 -> unreached.toLong) else Map.empty
    }
    assert(got === expect)
  }

  test("itemsetsFrom matches hand-computed supports, lift, and A-Priori triples") {
    // baskets: {1,2,3} x2, {1,2,4}, {2,3}
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 4L),
      (13L, 2L), (13L, 3L)).toDF("o", "p")
    val got = GraphPack.itemsetsFrom(baskets, minSupport = 2).collect()
      .map(r => ((r.getAs[Int]("k"), r.getAs[Long]("item_a"),
        r.getAs[Long]("item_b"), Option(r.getAs[Any]("item_c"))),
        (r.getAs[Long]("support"), Option(r.getAs[Any]("lift")),
          Option(r.getAs[Any]("confidence"))))).toMap
    // frequent pairs: (1,2) s=3, (1,3) s=2, (2,3) s=3; (x,4) infrequent
    // item sups 1:3 2:4 3:3 4:1, N=4
    assert(got.keySet === Set(
      (2, 1L, 2L, None), (2, 1L, 3L, None), (2, 2L, 3L, None),
      (3, 1L, 2L, Some(3L))))
    assert(got((2, 1L, 2L, None)) === ((3L, Some(1.0), Some(1.0))))
    assert(got((2, 1L, 3L, None)) === ((2L, Some(0.8889), Some(0.6667))))
    assert(got((2, 2L, 3L, None)) === ((3L, Some(1.0), Some(1.0))))
    // the only A-Priori triple: {1,2,3}, present in 2 baskets; {1,2,4}
    // never generates because (1,4)/(2,4) are infrequent
    assert(got((3, 1L, 2L, Some(3L))) === ((2L, None, None)))
  }

  test("kcoreProfile peels a hand graph to its known cores") {
    // triangle {1,2,3} + tail 3-4-5: the 2-core is the triangle (the
    // tail cascades off over two rounds), the 3-core is empty
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = GraphPack.kcoreProfile(und, Seq(2, 3), rounds = 4)
      .collect()
      .map(r => ((r.getAs[Int]("k"), r.getAs[Int]("round")),
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))).toMap
    // k=2 round 1: node 5 (deg 1) peels, edge 4-5 drops
    assert(got((2, 1)) === ((4L, 4L)))
    // k=2 round 2: node 4 (now deg 1) peels → triangle only; stable after
    assert(got((2, 2)) === ((3L, 3L)))
    assert(got((2, 3)) === ((3L, 3L)) && got((2, 4)) === ((3L, 3L)),
      "fixpoint rounds must be no-ops")
    // k=3: every node has degree < 3 after the tail drops → empty
    assert(got((3, 2)) === ((0L, 0L)) && got((3, 4)) === ((0L, 0L)))
  }

  test("labelPropFrom matches a driver-side reference propagation") {
    // two triangles joined by a bridge + a disjoint edge: communities
    // must resolve to the triangle minima and the edge minimum
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 10L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)
    ).toDF("u", "v")
    val es = edges.as[(Long, Long)].collect()
    val adj = (es ++ es.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap
    val nodes = adj.keys.toSeq.sorted
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lbl = nodes.map { n =>
        val votes = (adj(n).map(lbl) :+ lbl(n))
          .groupBy(identity).view.mapValues(_.size).toMap
        n -> votes.toSeq.map { case (l, c) => (-c, l) }.min._2
      }.toMap
    }
    val wantComms = lbl.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val rows = GraphPack.labelPropFrom(edges, rounds = 4).collect()
    val gotComms = rows
      .map(r => r.getAs[Long]("community") -> r.getAs[Long]("n_nodes")).toMap
    assert(gotComms === wantComms)
    assert(rows.head.getAs[Long]("n_communities") === wantComms.size.toLong)
  }

  test("ssspFrom prefers the cheap 2-hop route over the expensive direct edge") {
    // 1→2 (10) →3 (10) vs direct 1→3 (100); 4 hangs off 3; 6→1 makes 6
    // a source-only node, unreachable FROM 1
    val edges = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L), (3L, 4L, 5L),
      (6L, 1L, 1L)
    ).toDF("src", "dst", "w")
    val rows = GraphPack.ssspFrom(edges, source = 1L, rounds = 6).collect()
    val dist = rows.map(r =>
      r.getAs[Long]("node") -> r.getAs[Long]("dist_cents")).toMap
    assert(dist === Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 25L))
    assert(rows.head.getAs[Long]("n_reached") === 4L)
    // rk orders by (dist, node)
    val byRk = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("node"))
    assert(byRk.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("q_sssp matches a driver-side Bellman-Ford on sf0.001") {
    val got = SparkEntry.queries("q_sssp")(s, sfDir).collect()
    // reference: same graph, same weights, driver-side relaxation
    val w = Tables.lineitem(s, sfDir)
      .groupBy(col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("sk"))
      .agg(min(floor(col("l_extendedprice") * 100).cast("long")).as("w"))
      .as[(Long, Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, List[(Long, Long)]]()
      .withDefaultValue(Nil)
    w.foreach { case (p, sk, c) =>
      adj(p * 2) ::= ((sk * 2 + 1, c)); adj(sk * 2 + 1) ::= ((p * 2, c))
    }
    // strictly SYNCHRONOUS rounds (relax from a frozen snapshot) — the
    // Spark loop and the oracle both run 6 synchronous rounds, and an
    // in-round (Gauss–Seidel) mutation here could propagate further
    // than 6 hops in an order-dependent way
    var dist = Map[Long, Long](2L -> 0L)
    for (_ <- 1 to 6) {
      val relaxed = dist.toSeq.flatMap { case (n, dn) =>
        adj(n).map { case (m, c) => m -> (dn + c) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    assert(got.head.getAs[Long]("n_reached") === dist.size.toLong)
    val wantTop = dist.toSeq.map { case (n, d) => (d, n) }.sorted.take(20)
    val gotTop = got.sortBy(_.getAs[Int]("rk"))
      .map(r => (r.getAs[Long]("dist_cents"), r.getAs[Long]("node")))
    assert(gotTop.toSeq === wantTop)
  }

  test("hitsFrom matches a driver-side integer HITS replay on a hand graph") {
    // hubs {1,2,3} over auths {10,11,12}: hub 1 covers everything, hub 2
    // the popular pair, hub 3 only the niche auth 12
    val edges = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L), (3L, 12L)
    ).toDF("sk", "p")
    val es = edges.as[(Long, Long)].collect()
    val M = BigInt(1000000L)
    var hub = es.map(_._1).distinct.map(_ -> M).toMap
    var auth = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      val ar = es.groupBy(_._2).view.mapValues(_.map(e => hub(e._1)).sum).toMap
      val at = ar.values.sum
      auth = ar.view.mapValues(v => v * M / at).toMap
      val hr = es.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum).toMap
      val ht = hr.values.sum
      hub = hr.view.mapValues(v => v * M / ht).toMap
    }
    val rows = GraphPack.hitsFrom(edges, rounds = 3).collect()
    val gotHub = rows.filter(_.getAs[String]("side") == "hub")
      .map(r => r.getAs[Long]("node_key") -> BigInt(r.getAs[Long]("score")))
      .toMap
    val gotAuth = rows.filter(_.getAs[String]("side") == "auth")
      .map(r => r.getAs[Long]("node_key") -> BigInt(r.getAs[Long]("score")))
      .toMap
    assert(gotHub === hub)
    assert(gotAuth === auth)
    // the full-coverage hub must outrank the niche one
    assert(gotHub(1L) > gotHub(3L))
    assert(gotAuth(10L) > gotAuth(12L) === (auth(10L) > auth(12L)))
  }

  test("q_diameter reads the exact diameter of a path via double sweep") {
    // bipartite path p0 - s0 - p1 - s1: diameter 3. Sweep 1 starts at
    // the min node (p0), finds s1 at dist 3; sweep 2 from s1 confirms
    // 3 back at p0 — the lower bound is exact on trees.
    val li = Seq((0L, 0L), (1L, 0L), (1L, 1L))
      .toDF("l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("diam").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_diameter")(s, dir).collect().head
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_reached") === 4L)
    assert(r.getAs[String]("node_b") === "s1" &&
      r.getAs[Int]("ecc1") === 3)
    assert(r.getAs[String]("node_c") === "p0" &&
      r.getAs[Int]("diam_lb") === 3)
  }

  test("diameterBracketFrom certifies an even-diameter path exactly for free") {
    // path 0-1-…-10 (diameter 10) plus a disjoint edge 100-101: the CC
    // root lands in the giant path, the double sweep reads lb = 10,
    // the midpoint (node 5, ecc 5) closes the bracket ub = 2·5 = 10 →
    // is_exact = 1, and the iFUB census is EMPTY (no node deeper than
    // lb/2 from the true center) — exactness certified at 4 BFS on the
    // thin-leveled regime, the operator's headline claim
    val und = ((0L until 10L).map(i => (i, i + 1)) :+ ((100L, 101L)))
      .toDF("u", "v")
    val r = GraphPack.diameterBracketFrom(s, und).collect().head
    assert(r.getAs[Long]("n_nodes") === 13L)
    assert(r.getAs[Long]("n_comp") === 2L)
    assert(r.getAs[Long]("n_giant") === 11L)
    assert(r.getAs[Long]("node_b") === 10L) // far end from seed 0
    assert(r.getAs[Long]("node_c") === 0L)
    assert(r.getAs[Long]("node_mid") === 5L)
    assert(r.getAs[Int]("lb") === 10 && r.getAs[Int]("ub") === 10)
    assert(r.getAs[Int]("ecc_mid") === 5)
    assert(r.getAs[Long]("n_ifub") === 0L)
    assert(r.getAs[Int]("is_exact") === 1)
  }

  test("diameterExactFrom equals brute-force Floyd–Warshall truth on a " +
      "path and on a blob where the census must be paid") {
    // ground truth computed HERE, not by replaying the operator: the
    // oracle gate replays the same algorithm, so this spec is the
    // independent exactness check
    def truthDiameter(edges: Seq[(Long, Long)]): Int = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val idx = nodes.zipWithIndex.toMap
      val n = nodes.size
      val inf = 1 << 20
      val d = Array.fill(n, n)(inf)
      nodes.indices.foreach(i => d(i)(i) = 0)
      edges.foreach { case (a, b) =>
        d(idx(a))(idx(b)) = 1; d(idx(b))(idx(a)) = 1
      }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
      // giant component = the largest block of mutually reachable nodes
      val comps = nodes.indices.groupBy(i =>
        nodes.indices.filter(j => d(i)(j) < inf).min)
      val giant = comps.values.maxBy(c => (c.size, -c.min))
      (for (i <- giant; j <- giant) yield d(i)(j)).max
    }
    // (a) path + stray edge: thin-leveled regime, census empty
    val path = (0L until 10L).map(i => (i, i + 1)) :+ ((100L, 101L))
    val rp = GraphPack.diameterExactFrom(s, path.toDF("u", "v"))
      .collect().head
    assert(rp.getAs[Int]("diam_giant") === truthDiameter(path))
    assert(rp.getAs[Long]("n_sources") === 0L,
      "an exactly-bracketed path needs no census BFS")
    assert(rp.getAs[Int]("lb_was_exact") === 1)
    // (b) the odd cycle C9 (+ a stray component): the midpoint sits
    // off-center (ecc(m) = 4 > lb div 2 = 2), so the census holds the
    // 4 far-side nodes and the batched multi-source pass is genuinely
    // exercised against the brute-force truth
    val blob = (0L until 9L).map(i => (i, (i + 1) % 9)) :+ ((100L, 101L))
    val rb = GraphPack.diameterExactFrom(s, blob.toDF("u", "v"))
      .collect().head
    assert(rb.getAs[Int]("diam_giant") === truthDiameter(blob),
      s"got row $rb")
    assert(rb.getAs[Long]("n_sources") === 4L,
      s"C9's census is its 4 far-side nodes, got row $rb")
    assert(rb.getAs[Int]("diam_giant") >= rb.getAs[Int]("lb"))
  }

  test("diameter kernels THROW on a graph deeper than the BFS cap " +
      "instead of certifying a truncated diameter") {
    // path 0-1-…-20 has diameter 20 > maxRounds = 14: the seed BFS's
    // level sets would stop at 14 and every downstream readout (lb,
    // ecc, diam_giant, lb_was_exact) would silently understate — the
    // guard must fire in BOTH kernels (r13 ADVICE)
    val deep = (0L until 20L).map(i => (i, i + 1)).toDF("u", "v")
    val eExact = intercept[IllegalStateException] {
      GraphPack.diameterExactFrom(s, deep).collect()
    }
    assert(eExact.getMessage.contains("not converged"))
    val eBracket = intercept[IllegalStateException] {
      GraphPack.diameterBracketFrom(s, deep).collect()
    }
    assert(eBracket.getMessage.contains("not converged"))
    // and a graph that converges EXACTLY at the cap does not throw:
    // path 0-1-…-14 seeded at node 0 finishes round 14 with a
    // non-empty frontier but nothing beyond it
    val edge14 = (0L until 14L).map(i => (i, i + 1)).toDF("u", "v")
    val ok = GraphPack.diameterExactFrom(s, edge14).collect().head
    assert(ok.getAs[Int]("diam_giant") === 14)
  }

  test("anfFrom: register fold equals a driver md5 replay on a star, " +
      "and the MinCount pairs curve tracks exact component mass on sf " +
      "data") {
    // star 0—{1,2,3,4}: after round 1 the center holds the global
    // elementwise register min; after round 2 (the star's diameter)
    // EVERY node does — sum_reg must equal 5 × Σ_j gmin_j exactly
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val edges = (und ++ und.map(e => (e._2, e._1))).toDF("src", "dst")
    val out = GraphPack.anfFrom(edges, rounds = 2, k = 8).collect()
      .map(r => r.getInt(0) -> r).toMap
    def md5hex(str: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def reg(j: Int, v: Long): Long =
      java.lang.Long.parseLong(md5hex(s"anf:$j:$v").take(8), 16) %
        1048576L + 1L
    val nodes = 0L to 4L
    val sum0 = (for (v <- nodes; j <- 0 until 8) yield reg(j, v)).sum
    assert(out(0).getAs[Long]("sum_reg") === sum0,
      "round-0 registers must be the raw md5 inits")
    val gmin = (0 until 8).map(j => nodes.map(v => reg(j, v)).min)
    assert(out(2).getAs[Long]("sum_reg") === 5L * gmin.sum,
      "at the star's diameter every node holds the global min")
    // sf gate: the saturated pairs estimate must track Σ_c |c|² (the
    // exact number of connected pairs incl. self) — one K=8 MinCount
    // estimate per ball, deterministic md5 registers, measured ratio
    // 0.97 at sf0.01 / 1.0x at sf0.001
    val rows = SparkEntry.queries("q_anf")(s, sfDir).collect()
      .sortBy(_.getInt(0))
    val nhats = rows.map(_.getAs[Double]("nhat"))
    assert(nhats.zip(nhats.tail).forall { case (a, b) => b >= a },
      "the neighborhood function is monotone in r")
    val effs = rows.map(_.getAs[Int]("at_effective"))
    assert(effs.zip(effs.tail).forall { case (a, b) => b >= a } &&
      effs.last === 1, "the 90%-mass flag is monotone and final")
    val e0 = Tables.lineitem(s, sfDir)
      .select(col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("sk")).distinct()
    val memb = graft.operators.Dedup.connectedComponents(
      e0.select((col("p") * 2).as("id_a"), (col("sk") * 2 + 1).as("id_b")))
    val truePairs = memb.groupBy("cluster_id").count()
      .agg(sum(col("count") * col("count"))).head.getLong(0)
    val ratio = nhats.last / truePairs.toDouble
    assert(ratio > 0.5 && ratio < 2.0,
      s"saturated ANF mass ${nhats.last} vs exact $truePairs (ratio " +
        f"$ratio%.3f) outside the K=8 MinCount band")
  }

  test("harmonicFrom equals an exact driver replay of the register " +
      "algebra and ranks a star's hub first") {
    // star c=100 with leaves 1..6 (tagged-id parity irrelevant to the
    // kernel): the hub saturates its ball at r=1, leaves at r=2, so
    // under the 1/r discount the hub's centrality must lead
    val und = (1L to 6L).map(l => (100L, l))
    val edges = (und ++ und.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = GraphPack.harmonicFrom(edges, rounds = 3, k = 8).collect()
    // exact driver replay: same md5 registers, same min-folds over the
    // true balls, same integer estimator and telescoped weights
    def md5hex(str: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def reg(j: Int, v: Long): Long =
      java.lang.Long.parseLong(md5hex(s"anf:$j:$v").take(8), 16) %
        1048576L + 1L
    val nodes = 100L +: (1L to 6L)
    def ball(v: Long, r: Int): Seq[Long] =
      if (r == 0) Seq(v)
      else if (v == 100L || r >= 2) nodes
      else Seq(v, 100L)
    val w = GraphPack.harmonicWeights(3)
    val estQ = 7L * 1048576L * 1000L
    val want = nodes.map { v =>
      v -> (0 to 3).map { r =>
        val sumx = (0 until 8)
          .map(j => ball(v, r).map(u => reg(j, u)).min).sum
        w(r) * (estQ / sumx)
      }.sum
    }.toMap
    got.foreach { row =>
      // the readout decodes node = key·2 (part) / key·2+1 (supplier);
      // planted ids survive the round trip: 100 → part/50,
      // 3 → supplier/1, 2 → part/1
      val planted = row.getAs[Long]("key") * 2 +
        (if (row.getString(1) == "supplier") 1L else 0L)
      assert(want.contains(planted) &&
        row.getAs[Long]("h_q") === want(planted),
        s"node $planted: got ${row.getAs[Long]("h_q")}, " +
          s"want ${want(planted)}")
    }
    assert(got.head.getString(1) === "part" &&
      got.head.getAs[Long]("key") === 50L,
      "the hub's 1/r-discounted mass must rank first")
  }

  test("q_diameter_bracket invariants on sf data") {
    val r = SparkEntry.queries("q_diameter_bracket")(s, sfDir).collect().head
    val (lb, ub) = (r.getAs[Int]("lb"), r.getAs[Int]("ub"))
    // the bracket is a bracket, every probe eccentricity is within it,
    // and the census never exceeds the explored component
    assert(lb >= 1 && lb <= ub)
    assert(r.getAs[Int]("ecc_seed") <= ub && r.getAs[Int]("ecc_seed") >= (lb + 1) / 2)
    assert(r.getAs[Int]("ecc_mid") >= (lb + 1) / 2 && r.getAs[Int]("ecc_mid") <= ub)
    assert(r.getAs[Long]("n_ifub") <= r.getAs[Long]("n_giant"))
    assert((r.getAs[Int]("is_exact") === 1) === (lb === ub))
  }

  test("louvainFrom resolves two disjoint triangles to the known " +
      "optimum Q = 0.5 with min-id communities") {
    // the textbook two-clique value modularityFrom's gate documents —
    // Louvain must FIND the partition modularity only scores
    val und = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (10L, 11L, 1L), (10L, 12L, 1L), (11L, 12L, 1L)).toDF("u", "v", "w")
    val rows = GraphPack.louvainFrom(und).collect()
    assert(rows.length === 2, rows.mkString("\n"))
    assert(rows.forall(_.getAs[Double]("q_louvain") === 0.5))
    val cs = rows.map(_.getAs[Long]("community")).toSet
    assert(cs.size === 2 && cs.exists(_ <= 3L) && cs.exists(_ >= 10L),
      s"one community per clique (label id is sweep-defined), got $cs")
    assert(rows.forall(_.getAs[Long]("n_nodes") === 3L))
    assert(rows.forall(r =>
      r.getAs[Long]("w_in") === 3L && r.getAs[Long]("s_tot") === 6L))
  }

  test("louvainIncrFrom: folding a new-edge batch into an existing " +
      "assignment matches the from-scratch optimum on a planted graph") {
    // corpus: two 4-cliques (communities form offline); the batch
    // strengthens each clique (new internal support) and adds one
    // weak bridge — the incremental sweeps, SEEDED from the old
    // assignment, must keep the two-community structure and land on
    // the same Q as a from-scratch fit of the merged graph
    def clique(ids: Seq[Long], w: Long) =
      for (a <- ids; b <- ids if a < b) yield (a, b, w)
    val old = clique(Seq(1L, 2L, 3L, 4L), 2L) ++
      clique(Seq(10L, 11L, 12L, 13L), 2L)
    val batch = Seq((1L, 2L, 1L), (10L, 11L, 1L), (4L, 10L, 1L))
    val undOld = old.toDF("u", "v", "w")
    val merged = (old ++ batch).groupBy(e => (e._1, e._2))
      .map { case ((u, v), es) => (u, v, es.map(_._3).sum) }.toSeq
    val undFull = merged.toDF("u", "v", "w")
    val incr = GraphPack.louvainIncrFrom(undOld, undFull).collect()
    val scratch = GraphPack.louvainFrom(undFull).collect()
    // measured find, kept as the gate: the seeded incremental fit
    // lands the TRUE two-community partition (Q = 13/27 − 1/4 each
    // side ≈ 0.46296), while the fixed-sweep from-scratch fit stops
    // at three communities — the seed is not merely cheaper, on this
    // graph it is better, because the offline assignment already
    // encodes the merge the scratch sweeps' parity schedule misses
    assert(incr.length === 2,
      s"incremental must keep the two-clique structure, got ${incr.length}")
    val qi = incr.head.getAs[Double]("q_louvain_incr")
    val qs = scratch.head.getAs[Double]("q_louvain")
    assert(math.abs(qi - (13.0 / 27 - 0.25) * 2) < 1e-4,
      s"incremental Q $qi must hit the planted optimum")
    assert(qi >= qs - 1e-9,
      s"seeded Q $qi must be at least from-scratch Q $qs")
    assert(incr.map(_.getAs[Long]("n_nodes")).sorted.toSeq ===
      Seq(4L, 4L), "four nodes per clique community")
  }

  test("kcoreIncrFrom: the pinned seeded peel equals a from-scratch " +
      "core on a planted cascade, old members never leave, and a " +
      "parquet-round-tripped membership gives identical rows") {
    val k = 3
    def und(es: Seq[(Long, Long)]) = es.toDF("u", "v")
    // old graph: a 5-clique — its 3-core is all five nodes
    val old = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    // batch: 10 and 11 must enter TOGETHER (each needs the other —
    // the cascade the seeded rounds exist for), 20 is a false
    // candidate (full degree 3 but one neighbor, 30, can never join,
    // so 20 peels in round one), 30 is never a candidate
    val batch = Seq((1L, 10L), (2L, 10L), (10L, 11L), (2L, 11L),
      (3L, 11L), (1L, 20L), (2L, 20L), (20L, 30L))
    val full = old ++ batch
    val mOld = GraphPack.kcoreMembers(und(old), k, 8)
    assert(mOld.collect().map(_.getLong(0)).toSet === (1L to 5L).toSet)
    val rows = GraphPack.kcoreIncrFrom(mOld, und(full), k, 4)
      .collect().sortBy(_.getInt(0))
    // round 1: candidates {10, 11, 20}, 20 cascades out
    assert(rows.head.getAs[Long]("n_out_cand") === 3L)
    assert(rows.head.getAs[Long]("n_out_kept") === 2L)
    // fixpoint: core = clique + the joined pair
    assert(rows.last.getAs[Long]("n_core") === 7L)
    val scratch = GraphPack.kcoreMembers(und(full), k, 8)
      .collect().map(_.getLong(0)).toSet
    assert(scratch === (1L to 5L).toSet ++ Set(10L, 11L),
      s"from-scratch core sanity: $scratch")
    assert(rows.last.getAs[Long]("n_core") === scratch.size.toLong,
      "the pinned seeded peel must land on the true merged core")
    // the persisted-membership contract: a storage round trip of the
    // old member table changes nothing
    val dir = java.nio.file.Files
      .createTempDirectory("kcore-members").toString
    mOld.write.mode("overwrite").parquet(dir)
    val viaStored = GraphPack.kcoreIncrFrom(
        s.read.parquet(dir), und(full), k, 4)
      .collect().map(_.toString).sorted.toSeq
    assert(viaStored === rows.map(_.toString).sorted.toSeq)
    // truncation guard: one seeded round cannot absorb the 2-step
    // cascade settle (round 1 still moves) — must THROW, not certify
    intercept[IllegalStateException] {
      GraphPack.kcoreIncrFrom(mOld, und(full), k, seededRounds = 1)
    }
  }

  test("louvainIncrSeeded from a parquet-round-tripped membership " +
      "equals the self-contained in-query fit row for row") {
    // the production face: the offline fit is PERSISTED (node,
    // community) state read back from storage; the daily update pays
    // only the seeded sweeps. Equivalence must hold through a real
    // storage round-trip, not just a shared in-memory frame.
    def clique(ids: Seq[Long], w: Long) =
      for (a <- ids; b <- ids if a < b) yield (a, b, w)
    val old = clique(Seq(1L, 2L, 3L, 4L), 2L) ++
      clique(Seq(10L, 11L, 12L, 13L), 2L)
    val batch = Seq((1L, 2L, 1L), (10L, 11L, 1L), (4L, 10L, 1L),
      (20L, 21L, 3L)) // the batch also INTRODUCES two brand-new nodes
    val merged = (old ++ batch).groupBy(e => (e._1, e._2))
      .map { case ((u, v), es) => (u, v, es.map(_._3).sum) }.toSeq
    val undOld = old.toDF("u", "v", "w")
    val undFull = merged.toDF("u", "v", "w")
    // persist the offline membership the way a nightly job would
    val (mOld, _, _, _) = GraphPack.louvainMembership(undOld,
      GraphPack.LouvainIncrOldRounds,
      graft.operators.CheckpointStrategy.Local, refine = false)
    val dir = java.nio.file.Files
      .createTempDirectory("louvain-membership").toString
    mOld.write.mode("overwrite").parquet(dir)
    val persisted = s.read.parquet(dir)
    val seeded = GraphPack.louvainIncrSeeded(persisted, undFull)
      .collect().map(_.toString).sorted
    val selfContained = GraphPack.louvainIncrFrom(undOld, undFull)
      .collect().map(_.toString).sorted
    assert(seeded.toSeq === selfContained.toSeq,
      s"persisted-membership face diverged:\n${seeded.mkString("\n")}" +
        s"\nvs\n${selfContained.mkString("\n")}")
    // the new nodes must have been absorbed as their own community
    // (singleton seeds, then the 3-weight edge binds them)
    assert(seeded.length === 3)
  }

  test("q_louvain on sf data: positive modularity over 2+ communities") {
    val rows = SparkEntry.queries("q_louvain")(s, sfDir).collect()
    assert(rows.nonEmpty)
    val q = rows.head.getAs[Double]("q_louvain")
    val nc = rows.head.getAs[Long]("n_comms")
    assert(q > 0.0, s"ascent must beat random wiring, got Q=$q")
    assert(nc >= 2L, s"the co-purchase graph is not one community, $nc")
    info(s"louvain Q=$q over $nc communities")
  }

  test("leidenFrom: every emitted community is internally connected " +
      "(the Leiden guarantee) and the two-triangle optimum is preserved") {
    // two triangles: refinement is a no-op on an already-connected
    // partition — same Q = 0.5 as louvainFrom
    val und = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (10L, 11L, 1L), (10L, 12L, 1L), (11L, 12L, 1L)).toDF("u", "v", "w")
    val rows = GraphPack.leidenFrom(und).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Double]("q_leiden") === 0.5))
    // the guarantee, checked on the FULL sf membership: within each
    // community, CC over its internal edges must find one component
    val edges = {
      // the same graph q_louvain runs on
      val li = graft.Tables.lineitem(s, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
    }
    def disconnectedComms(refine: Boolean): Long = {
      val (fin, undW, _, _) = GraphPack.louvainMembership(edges,
        GraphPack.LouvainRounds,
        graft.operators.CheckpointStrategy.Local, refine)
      val intra = undW
        .join(fin.select(col("node").as("u"), col("community").as("cu")), "u")
        .join(fin.select(col("node").as("v"), col("community").as("cv")), "v")
        .where(col("cu") === col("cv"))
      val comp = graft.operators.Dedup.connectedComponents(
          intra.select(col("u").as("id_a"), col("v").as("id_b")))
        .withColumnRenamed("doc_id", "node")
      fin.join(comp, Seq("node"), "left")
        .groupBy("community")
        .agg(countDistinct(coalesce(col("cluster_id"), col("node")))
          .as("parts"))
        .agg(sum(when(col("parts") > 1, 1L).otherwise(0L)))
        .head().getLong(0)
    }
    assert(disconnectedComms(refine = true) === 0L,
      "Leiden must emit only internally-connected communities")
    info(s"plain Louvain disconnected communities on sf data: " +
      s"${disconnectedComms(refine = false)}")
  }

  test("modularityFrom scores two disjoint triangles at Q = 0.5") {
    // LPA resolves each triangle to its min label; m = 6, each
    // community has e_c = 3, deg_c = 6 → per-community contribution
    // 3/6 − (6/12)² = 0.25, Q = 0.5 (the textbook two-clique value)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("u", "v")
    val rows = GraphPack.modularityFrom(und, rounds = 4).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Double]("q_modularity") === 0.5))
    assert(rows.forall(_.getAs[Double]("contribution") === 0.25))
    assert(rows.forall(_.getAs[Long]("intra_edges") === 3L))
    assert(rows.head.getAs[Long]("n_comms") === 2L)
  }

  test("assortativityFrom reads -1 on a star (perfect hub-leaf wiring)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val r = GraphPack.assortativityFrom(star).collect().head
    assert(r.getAs[Long]("m_edges") === 3L)
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("assortativityWeightedFrom: uniform weights reduce to the " +
      "unweighted value scaled by the weight; weights move r") {
    // star with uniform weight 7: strengths are 7x the degrees, and
    // the Leung-Chau ratio is scale-invariant -> exactly -1 still
    val star = Seq((0L, 1L, 7L), (0L, 2L, 7L), (0L, 3L, 7L))
      .toDF("u", "v", "w")
    val r = GraphPack.assortativityWeightedFrom(star).collect().head
    assert(r.getAs[Long]("m_edges") === 3L)
    assert(r.getAs[Long]("w_total") === 21L)
    assert(r.getAs[Double]("assortativity_w") === -1.0)
    // driver-side replay of the formula on an asymmetric graph
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 5L), (1L, 3L, 2L))
    val undW = edges.toDF("u", "v", "w")
    val got = GraphPack.assortativityWeightedFrom(undW).collect().head
    val sg = edges.flatMap { case (u, v, w) => Seq(u -> w, v -> w) }
      .groupBy(_._1).map { case (n, ws) => n -> ws.map(_._2).sum }
    val wt = edges.map(_._3).sum.toDouble
    val sjk = edges.map { case (u, v, w) => w * sg(u) * sg(v) }.sum
    val ssum = edges.map { case (u, v, w) => w * (sg(u) + sg(v)) }.sum
    val ssq = edges.map { case (u, v, w) =>
      w * (sg(u) * sg(u) + sg(v) * sg(v)) }.sum
    val mu = ssum / (2.0 * wt)
    val want = BigDecimal((sjk / wt - mu * mu)
      / (ssq / (2.0 * wt) - mu * mu))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("assortativity_w") === want)
  }

  test("pagerankWeightedFrom matches a driver-side integer reference " +
      "and pulls rank along heavy edges") {
    def ref(edges: Seq[(Long, Long, Long)], iters: Int)
        : Map[Long, Long] = {
      val out = edges.flatMap { case (u, v, w) =>
        Seq((u, v, w), (v, u, w)) }
      val st = out.groupBy(_._1).map { case (n, es) =>
        n -> es.map(_._3).sum }
      var pr = st.map { case (n, _) => n -> 1000000000L }
      for (_ <- 1 to iters) {
        val cin = out.groupBy(_._2).map { case (n, es) =>
          n -> es.map { case (u, _, w) =>
            Math.floorDiv(pr(u) * w, st(u)) }.sum }
        pr = pr.map { case (n, _) =>
          n -> (150000000L + Math.floorDiv(85L * cin(n), 100L)) }
      }
      pr
    }
    // path 1-2-3 with a heavy 2-3 tie plus a 3-4 pendant
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 9L), (3L, 4L, 1L))
    val got = GraphPack.pagerankWeightedFrom(edges.toDF("u", "v", "w"), 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr"))
      .toMap
    assert(got === ref(edges, 3))
    // the heavy tie pulls rank: 3 outranks what it gets under uniform
    // weights on the same wiring (where 2 and 3 are symmetric)
    val uni = GraphPack.pagerankWeightedFrom(
      edges.map { case (u, v, _) => (u, v, 1L) }.toDF("u", "v", "w"), 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr"))
      .toMap
    assert(got(2L) > uni(2L) && got(3L) > uni(3L),
      "the heavy mutual tie concentrates mass on its endpoints")
    // uniform weights reproduce unweighted pagerank exactly:
    // (pr*c) div (deg*c) == pr div deg
    val uni7 = GraphPack.pagerankWeightedFrom(
      edges.map { case (u, v, _) => (u, v, 7L) }.toDF("u", "v", "w"), 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr"))
      .toMap
    assert(uni7 === uni)
  }

  test("linkPredFrom scores the open pair of a path by its shared center") {
    // path 1-2-3: the only distance-2 pair is (1,3) through center 2
    // (deg 2): cn = 1, jaccard = 1/(1+1-1) = 1,
    // AA = floor(2^20/ln 2)/2^20 ≈ 1.4427
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val rows = GraphPack.linkPredFrom(path).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getAs[Long]("u"), r.getAs[Long]("v")) === ((1L, 3L)))
    assert(r.getAs[Long]("cn") === 1L)
    assert(r.getAs[Double]("jaccard") === 1.0)
    assert(r.getAs[Double]("adamic_adar") === 1.4427)
    // an existing edge must never be predicted
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(GraphPack.linkPredFrom(tri).count() === 0L)
  }

  test("q_hits emits 10 hubs + 10 auths with conserved integer mass") {
    val rows = SparkEntry.queries("q_hits")(s, sfDir).collect()
    val hubs = rows.filter(_.getAs[String]("side") == "hub")
    val auths = rows.filter(_.getAs[String]("side") == "auth")
    assert(hubs.length === 10 && auths.length === 10)
    for (side <- Seq(hubs, auths)) {
      val byRk = side.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq === (1 to 10))
      val scores = byRk.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(s => s > 0 && s <= 1000000L),
        "every normalized score is a positive ppm share")
    }
  }

  test("densestFrom peels a path away and isolates the planted clique " +
      "at peak density") {
    // 5-clique (10 edges, density 2.0) + a 20-node path (19 edges):
    // round 0 reads the mixed graph; round 1 peels every path node
    // (deg <= 2 < 2.2*avg) leaving the exact clique at dens 2.0; the
    // clique's own regular degree 4 <= 2.2*4 peels it next — rounds
    // 2..8 are empty fixpoints in both engines
    val clique = for (i <- 0 until 5; j <- i + 1 until 5)
      yield (100L + i, 100L + j)
    val path = (0 until 19).map(i => (200L + i, 201L + i))
    val rows = graft.queries.GraphPack
      .densestFrom((clique ++ path).toDF("u", "v"))
      .collect().map(r => r.getAs[Int]("round") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
          r.getAs[Long]("dens_1e4"))).toMap
    assert(rows(0) === ((25L, 29L, 11600L)))
    assert(rows(1) === ((5L, 10L, 20000L)), "round 1 IS the clique")
    (2 to 8).foreach(r => assert(rows(r) === ((0L, 0L, 0L))))
    assert(rows.values.map(_._3).max === 20000L,
      "the trajectory's max density row is the planted core")
  }

  /** Driver-side Kruskal under the same (w, u, v) total order — the
    * MST/forest is UNIQUE under a total edge order, so any correct
    * algorithm (Kruskal here, Borůvka in the operator) lands on the
    * identical edge set and weight. */
  private def kruskal(edges: Seq[(Long, Long, Long)])
      : (Long, Long, Set[(Long, Long)]) = {
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    var picked = Set.empty[(Long, Long)]
    var w = 0L
    for ((u, v, ew) <- edges.sortBy(e => (e._3, e._1, e._2))) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; picked += ((u, v)); w += ew }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    (w, nodes.map(find).distinct.size.toLong, picked)
  }

  test("mstFrom matches a driver-side Kruskal on a weighted hand graph") {
    // two components: a dense 6-node block with deliberate weight TIES
    // (the (w,u,v) surrogate order must break them identically on both
    // sides) + a disjoint weighted 4-cycle
    val block = for (i <- 0L until 6L; j <- i + 1 to 5L)
      yield (i, j, (i * 7 + j * 13) % 5 + 10)
    val cyc = Seq((10L, 11L, 3L), (11L, 12L, 3L), (12L, 13L, 3L),
      (10L, 13L, 9L))
    val edges = (block ++ cyc).toSeq
    val (wantW, wantComp, wantEdges) = kruskal(edges)
    assert(wantComp === 2L)
    val census = GraphPack.mstFrom(edges.toDF("u", "v", "w"), 6, 5)
      .collect().sortBy(_.getAs[Int]("round"))
    val last = census.last
    assert(last.getAs[Long]("n_mst") === wantEdges.size.toLong,
      "forest size = V - components")
    assert(last.getAs[Long]("w_cum") === wantW,
      "unique-MST weight under the shared total order")
    assert(last.getAs[Long]("n_components") === wantComp)
    // census monotone: forest grows, components shrink
    census.zip(census.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_mst") <= b.getAs[Long]("n_mst"))
      assert(a.getAs[Long]("n_components") >= b.getAs[Long]("n_components"))
    }
  }

  test("mstFrom drops exactly the heaviest cycle edge of a ring") {
    // ring 0-1-...-9-0 with distinct weights: the unique MST is the
    // ring minus its max edge; also exercises deep pointer chains
    // (Borůvka on a path of min-edges merges pairwise)
    val ring = (0L until 10L).map(i =>
      (math.min(i, (i + 1) % 10), math.max(i, (i + 1) % 10),
        20L + ((i * 17) % 10)))
    val (wantW, _, _) = kruskal(ring)
    val last = GraphPack.mstFrom(ring.toDF("u", "v", "w"), 6, 5)
      .collect().maxBy(_.getAs[Int]("round"))
    assert(last.getAs[Long]("n_mst") === 9L)
    assert(last.getAs[Long]("w_cum") === wantW)
    assert(last.getAs[Long]("n_components") === 1L)
  }

  test("closenessFrom reads hand distances on a star-plus-tail graph") {
    // star 0-{2,4,6}, tail 6-8: from seed 0 dists are 1,1,1,2
    val und = Seq((0L, 2L), (0L, 4L), (0L, 6L), (6L, 8L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((0L, 0L), (8L, 8L)).toDF("seed", "node")
    val got = GraphPack.closenessFrom(edges, seeds, 6)
      .collect().map(r => r.getAs[Long]("part") -> r).toMap
    val s0 = got(0L)
    assert(s0.getAs[Long]("n_reached") === 4L)
    assert(s0.getAs[Int]("ecc") === 2)
    assert(s0.getAs[Long]("sum_dist") === 5L)
    // 3·⌊1e6/1⌋ + ⌊1e6/2⌋
    assert(s0.getAs[Long]("harmonic_q") === 3500000L)
    assert(s0.getAs[Double]("closeness") === 0.8)
    // from the tail end 8: dists 1 (6), 2 (0), 3 (2 and 4)
    val s8 = got(4L) // seed node 8 -> part display 8 div 2 = 4
    assert(s8.getAs[Long]("sum_dist") === 1L + 2 + 3 + 3)
    assert(s8.getAs[Int]("ecc") === 3)
  }

  test("betweennessFrom reads hand Brandes dependencies on a " +
      "diamond-with-tail graph") {
    // 0-2, 0-4, 2-6, 4-6, 6-8 from seed 0: σ(2)=σ(4)=1, σ(6)=σ(8)=2;
    // δ(6) = (2·(1e9+0)) div 2 = 1e9 (all 0→8 mass), δ(2) = δ(4) =
    // (1·(1e9+1e9)) div 2 = 1e9 (half of 0→6 + half of 0→8), δ(8) = 0
    val und = Seq((0L, 2L), (0L, 4L), (2L, 6L), (4L, 6L), (6L, 8L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((0L, 0L)).toDF("seed", "node")
    val got = GraphPack.betweennessFrom(edges, seeds, 6)
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("bc_q"))
      .toMap
    assert(got === Map(1L -> 1000000000L, 2L -> 1000000000L,
      3L -> 1000000000L, 4L -> 0L))
  }

  test("clustcoefFrom reads hand coefficients on a triangle-with-tail") {
    // triangle 1-2-3 plus pendant 3-4: cc(1)=cc(2)=1, cc(3)=1/3,
    // node 4 (deg 1) drops; transitivity = 3 triangles-corners /
    // (1+1+3) wedges = 0.6
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val got = GraphPack.clustcoefFrom(und).collect()
      .map(r => r.getAs[Long]("l_partkey") ->
        (r.getAs[Double]("cc"), r.getAs[Double]("transitivity"))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L)._1 === 1.0 && got(2L)._1 === 1.0)
    assert(got(3L)._1 === 0.333333)
    assert(got(1L)._2 === 0.6)
  }

  test("clustcoefWeightedFrom scores a weak-tie triangle by Barrat") {
    // triangle 1-2-3 (w12=10, w13=w23=2) + pendant 3-4 (w=6):
    // cc_w(1) = ((10+2)/2)/(12·1) = 0.5 — the triangle rides node 1's
    // strong tie only halfway; cc_w(3) = ((2+2)/2)/(10·2) = 0.1 —
    // weight-trivia triangles score low where binary cc read 1/3
    val undW = Seq((1L, 2L, 10L), (1L, 3L, 2L), (2L, 3L, 2L),
      (3L, 4L, 6L)).toDF("u", "v", "w")
    val got = GraphPack.clustcoefWeightedFrom(undW).collect()
      .map(r => r.getAs[Long]("l_partkey") -> r.getAs[Double]("cc_w"))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === 0.5 && got(2L) === 0.5)
    assert(got(3L) === 0.099999) // ⌊4·2²⁰/40⌋/2²⁰, quantized-exact
  }

  test("q_mst census invariants on sf0.001") {
    val rows = SparkEntry.queries("q_mst")(s, sfDir)
      .collect().sortBy(_.getAs[Int]("round"))
    assert(rows.length === 6)
    val last = rows.last
    // spanning forest: |MST| = V - components over the part-supplier graph
    val li = Tables.lineitem(s, sfDir)
      .select(col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("sk")).distinct()
    val v = li.select(explode(array(col("p") * 2, col("sk") * 2 + 1))
      .as("n")).distinct().count()
    assert(last.getAs[Long]("n_mst") ===
      v - last.getAs[Long]("n_components"))
    assert(last.getAs[Long]("w_cum") > 0L)
  }
}
