package graft

import org.apache.spark.sql.functions._
import graft.queries.SketchPack

/** Semantic gates for the sketch & search pack, independent of the
  * DuckDB oracle: algebraic invariants each sketch must satisfy by
  * construction (Bloom never false-negative, CMS never undercount),
  * accuracy floors on the measured estimates, and a plain-Scala
  * reference replay of the winnowing selection and phrase search on
  * hand corpora. */
class SketchSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // ---------------------------------------------------------------- bloom

  test("q_bloom_prune: no false negatives, pass-set algebra holds") {
    val rows = q("q_bloom_prune").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRows, nPass, nMatch, nFp) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      // every true match must pass the filter (no false negatives —
      // the Bloom guarantee the prune is only correct under)
      assert(nPass >= nMatch, s"false negative in $r")
      assert(nFp === nPass - nMatch, s"pass-set algebra broken in $r")
      assert(nPass <= nRows)
    }
  }

  test("q_bloom_prune: the filter actually prunes at gate scale") {
    val rows = q("q_bloom_prune").collect()
    val (pass, total) = (rows.map(_.getLong(2)).sum, rows.map(_.getLong(1)).sum)
    // dim is ~1/5 of customers; a working filter passes well under half
    assert(pass.toDouble / total < 0.5,
      s"bloom passed $pass of $total — filter not pruning")
  }

  test("q_bloom_prune_shuffle: no false negatives, pass-set algebra " +
      "holds, and the audit agrees with the broadcast twin") {
    val rows = q("q_bloom_prune_shuffle").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRows, nPass, nMatch, nFp) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      // every true match passes: its 3 bits were set in its own shard
      assert(nPass >= nMatch, s"false negative in $r")
      assert(nFp === nPass - nMatch, s"pass-set algebra broken in $r")
      assert(nPass <= nRows)
    }
    // n_rows / n_match are FILTER-INDEPENDENT ground truth — both
    // variants must agree on them exactly (same dim, same fact)
    val bc = q("q_bloom_prune").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    rows.foreach { r =>
      assert(bc(r.getString(0)) === ((r.getLong(1), r.getLong(3))),
        s"shuffle variant disagrees with broadcast ground truth: $r")
    }
    // and the sharded filter still prunes
    val (pass, total) =
      (rows.map(_.getLong(2)).sum, rows.map(_.getLong(1)).sum)
    assert(pass.toDouble / total < 0.5,
      s"sharded bloom passed $pass of $total — filter not pruning")
  }

  test("RuntimeFilter.shardPlan auto-scales shards so a shard cell " +
      "stays <= 2^22 bits, pow2 throughout, exact product") {
    import graft.operators.RuntimeFilter
    // small m: the user floor wins
    assert(RuntimeFilter.shardPlan(1L << 20, 32) === ((32L, 1L << 15)))
    // the 1 GiB filter the r15 ADVICE flagged: 32 fixed shards would
    // make one ~64 MiB map cell AND (m/shards).toInt stays positive
    // only by luck — the plan scales to 2^11 shards of 2^22 bits
    val (nsh, mP) = RuntimeFilter.shardPlan(1L << 33, 32)
    assert(nsh === (1L << 11) && mP === (1L << 22))
    // far past the old Int-overflow point (m/shards > 2^31 bits)
    val (nsh2, mP2) = RuntimeFilter.shardPlan(1L << 40, 32)
    assert(nsh2 === (1L << 18) && mP2 === (1L << 22))
    assert(java.lang.Long.bitCount(nsh2) === 1
      && java.lang.Long.bitCount(mP2) === 1 && nsh2 * mP2 === (1L << 40))
    // the degenerate corner (r16 ADVICE): shards > m used to plan
    // mP = 0, and pmod(x, 0) is NULL — every probe predicate null,
    // the join silently empty. The cap is one shard per bit.
    assert(RuntimeFilter.shardPlan(1L << 10, 1 << 12) === ((1L << 10, 1L)),
      "shards are capped at m — mP never reaches 0")
  }

  test("filteredJoin equals the plain join even under a degenerate " +
      "shards > m layout (the mP = 0 silent-empty corner, r16 ADVICE)") {
    import graft.operators.RuntimeFilter
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("k"), col("o_orderstatus"))
    val dim = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") <= 8)
      .select(col("c_custkey").as("k"), col("c_name"))
    val want = fact.join(dim, Seq("k"))
      .collect().map(_.toString).sorted.toSeq
    // ≤8 dim keys → m = 1024 bits; shards = 4096 > m, and a 1-bit
    // broadcast budget forces the sharded regime
    val got = RuntimeFilter.filteredJoin(fact, dim, "k",
      shards = 4096, broadcastBitsMax = 1L)
      .collect().map(_.toString).sorted.toSeq
    assert(got === want,
      "the sharded regime with shards > m must still return the join")
  }

  test("filteredJoin fails loudly when the fact schema already uses " +
      "a reserved working column") {
    import graft.operators.RuntimeFilter
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("k"), col("o_orderstatus").as("__b1"))
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("k")).limit(10)
    val e = intercept[IllegalArgumentException] {
      RuntimeFilter.filteredJoin(fact, dim, "k")
    }
    assert(e.getMessage.contains("__b1"),
      "the clash message must name the offending column")
  }

  test("RuntimeFilter.filteredJoin equals the plain join in BOTH " +
      "regimes (broadcast bit set and sharded packed words)") {
    import graft.operators.RuntimeFilter
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("k"), col("o_orderstatus"))
    val dim = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"), col("c_name"))
    val want = fact.join(dim, Seq("k"))
      .collect().map(_.toString).sorted.toSeq
    // default threshold → the broadcast regime
    val bc = RuntimeFilter.filteredJoin(fact, dim, "k")
      .collect().map(_.toString).sorted.toSeq
    assert(bc === want, "broadcast regime must equal the plain join")
    // a 1-bit threshold forces the sharded regime
    val sh = RuntimeFilter.filteredJoin(fact, dim, "k",
        broadcastBitsMax = 1L)
      .collect().map(_.toString).sorted.toSeq
    assert(sh === want, "sharded regime must equal the plain join")
  }

  // ------------------------------------------------------------------ hll

  test("q_hll: estimates within 3σ of exact on every tested column") {
    val rows = q("q_hll").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      // σ = 1.04/√256 = 6.5%; 3σ ≈ 0.2 — generous but a real floor
      assert(r.getDouble(3) < 0.2,
        s"rel_err ${r.getDouble(3)} for ${r.getString(0)}")
    }
  }

  test("q_hll: linear-counting branch engages on the 100-key column") {
    // l_suppkey has ~100 distinct keys at every SF — deep inside the
    // E ≤ 2.5m small-range regime, where the raw estimator biases low
    // and the correction is what keeps rel_err tiny
    val r = q("q_hll").collect().find(_.getString(0) == "l_suppkey").get
    assert(r.getDouble(3) < 0.05,
      s"small-range correction should be near-exact, got ${r.getDouble(3)}")
  }

  // ------------------------------------------------------------------ cms

  test("text_cms: never undercounts, and width 32 actually collides") {
    val rows = q("text_cms").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), s"CMS undercount in $r")
      assert(r.getLong(4) === r.getLong(3) - r.getLong(2))
    }
    // 31-token vocab into 32 buckets: some top token must collide —
    // a zero total overcount means the sketch isn't being exercised
    assert(rows.map(_.getLong(4)).sum > 0, "no collisions at w=32")
  }

  // --------------------------------------------------------------- winnow

  /** JVM replay of the pack's portable hash (first 8 md5 hex as u32). */
  private def u32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  /** Reference winnowing (Schleimer 2003, Fig. 5): for each window of
    * w shingle hashes record the minimal hash, rightmost on ties. */
  private def winnowRef(text: String, w: Int = 4): Set[(Long, Int)] = {
    val ws = text.trim.split("\\s+")
    val hs = (0 to ws.length - 3)
      .map(i => u32(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}"))
    (w - 1 until hs.length).map { i =>
      val win = i - w + 1 to i
      val minH = win.map(hs).min
      val pos = win.filter(j => hs(j) == minH).max
      (hs(pos), pos)
    }.toSet
  }

  test("winnowSelected matches reference winnowing on a hand doc") {
    val text = "a b c d e f g h b c d a a b c x y z a b"
    val sel = SketchPack.winnowSelected(
        Seq((1L, text)).toDF("doc_id", "text"))
      .select("h", "sel_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt)).toSet
    assert(sel === winnowRef(text))
  }

  test("winnowing guarantee: a shared 6-token run shares a fingerprint") {
    // w + k − 1 = 6: any common substring of ≥6 tokens must yield at
    // least one common selected fingerprint (the paper's theorem 1)
    val run = "p q r s t u"
    val docs = Seq(
      (1L, s"a b c d $run e f g h i"),
      (2L, s"z y x $run w v u t s r")).toDF("doc_id", "text")
    val sel = SketchPack.winnowSelected(docs)
      .select("doc_id", "h").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((sel(1L) intersect sel(2L)).nonEmpty,
      "6-token shared run produced no shared fingerprint")
  }

  test("text_winnow output is well-formed top-20") {
    val rows = q("text_winnow").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val shared = rows.map(_.getLong(3))
    assert(shared.sameElements(shared.sorted.reverse), "not sorted desc")
    rows.foreach(r => assert(r.getLong(1) < r.getLong(2), "pair not canonical"))
  }

  // --------------------------------------------------------------- search

  test("searchRank: phrase adjacency and tie-breaks on a hand corpus") {
    val docs = Seq(
      (1L, "a b a b c"), // phrase "a b" twice
      (2L, "b a"), //       both terms, zero phrases
      (3L, "a c b"), //     both terms, zero phrases
      (4L, "a a a") //      missing b — AND drops it
    ).toDF("doc_id", "text")
    val got = SketchPack.searchRank(docs, "a", "b")
      .select("rk", "doc_id", "tf_a", "tf_b", "n_phrase").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (1, 1L, 2L, 2L, 2L), // 2 phrases wins
      (2, 2L, 1L, 1L, 0L), // tie on phrase+tf → doc_id asc
      (3, 3L, 1L, 1L, 0L)))
  }

  // ---------------------------------------------------------------- kmv

  test("q_kmv: sub-k scopes collapse to exact, estimates stay in the " +
      "±3/√k band") {
    val rows = q("q_kmv").collect()
      .map(r => r.getAs[String]("scope") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"))).toMap
    assert(rows.size === 6)
    rows.foreach { case (scope, (exact, est)) =>
      if (exact < 64) assert(est === exact,
        s"$scope: sketch smaller than k IS the set — estimate must be exact")
      else {
        // 3/√64 = 37.5% — a loose band; the gate's real check is the
        // hash-exact oracle, this pins the estimator is sane at all
        val err = math.abs(est - exact).toDouble / exact
        assert(err < 0.375, s"$scope: |$est - $exact|/$exact = $err")
      }
    }
  }

  test("kmvFrom: when every scope is sub-k the intersection row is exact") {
    // 40 users in A, 40 in B, 25 shared — all below k = 64, so the
    // union sketch IS the union and the theta estimate degenerates to
    // the exact overlap: (m·nu) div nu = m
    val ev = ((1L to 40L).map(u => ("click", u)) ++
      (16L to 55L).map(u => ("view", u)))
      .toDF("event_type", "user_id")
    val rows = SketchPack.kmvFrom(ev).collect()
      .map(r => r.getAs[String]("scope") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"))).toMap
    assert(rows("click") === ((40L, 40L)))
    assert(rows("view") === ((40L, 40L)))
    assert(rows("click&view") === ((25L, 25L)))
  }
}
