package graft

import org.apache.spark.sql.functions._
import graft.operators.{CheckpointStrategy, Dedup}

/** The iterative-state seam (round 11): reliable `checkpoint()` as a
  * drop-in for `localCheckpoint` in every iterative loop — pagerank,
  * min-label CC, BPE training. Gates (a) the captured-layout idiom
  * holds on the reliable path too (capture with AQE off, AQE-planned
  * consumers reuse it), and (b) Local and Reliable produce identical
  * results — the strategy changes availability, never semantics. */
class CheckpointStrategySpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  // ONE shared reliable dir for the whole suite: the session-global
  // checkpoint dir is set once (Reliable refuses a second, different
  // dir — that misconfiguration silently splits state across stores)
  private lazy val reliableDir =
    java.nio.file.Files.createTempDirectory("graft_reliable_ckpt").toString
  private lazy val reliable = CheckpointStrategy.Reliable(reliableDir)

  test("reliable checkpoint captures hash partitioning like localCheckpoint") {
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val edges = reliable(Tables.orders(spark, sfDir)
        .select(col("o_custkey").as("src"), col("o_orderkey").as("dst"))
        .repartition(col("src")))
      val ranks = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("node"), lit(1L).as("pr"))
      val p = ranks.join(edges, ranks("node") === edges("src"))
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges === 1,
        s"only the rank side may shuffle off a RELIABLE checkpoint, " +
          s"saw $exchanges exchanges in:\n$p")
      // AQE-planned consumers reuse the captured layout, same as local
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val p2 = ranks.join(edges, ranks("node") === edges("src"))
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(p2).length === 1,
        s"an AQE-planned join must reuse the reliable-captured layout:\n$p2")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("pagerank: Reliable and Local produce identical ranks") {
    val local = graft.queries.AnalyticsPack
      .pagerankPlan(spark, sfDir, 3, CheckpointStrategy.Local)
      .collect().map(_.toSeq).toSet
    val rel = graft.queries.AnalyticsPack
      .pagerankPlan(spark, sfDir, 3, reliable)
      .collect().map(_.toSeq).toSet
    assert(rel === local, "checkpoint strategy must not change pagerank")
  }

  test("min-label CC: Reliable and Local label identically") {
    // force the distributed path (threshold 0) so the loop actually
    // exercises the strategy on edges, labels, and every round
    val pairs = ((0L until 300L).map(i => (i, i + 1)) ++
      Seq((1000L, 2000L), (2000L, 3000L))).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    val rel = Dedup.connectedComponents(pairs, localEdgeThreshold = 0L,
      ckpt = reliable).as[(Long, Long)].collect().toMap
    assert(rel === local, "checkpoint strategy must not change CC labels")
  }

  test("BPE training: Reliable and Local learn the same merge table") {
    val local = graft.queries.TextPack.bpeTrain(spark, sfDir, rounds = 4)
      .collect().map(_.toSeq).toSeq
    val rel = graft.queries.TextPack
      .bpeTrain(spark, sfDir, rounds = 4, ckpt = reliable)
      .collect().map(_.toSeq).toSeq
    assert(rel === local, "checkpoint strategy must not change BPE merges")
  }

  test("TextRank: Reliable and Local score identically") {
    val docs = Seq(
      (1L, Seq("alpha", "beta", "alpha", "gamma")),
      (2L, Seq("alpha", "delta", "beta", "gamma"))
    ).toDF("doc_id", "w")
    val local = graft.queries.TextPack.textrankFrom(docs)
      .collect().map(_.toSeq).toSet
    val rel = graft.queries.TextPack.textrankFrom(docs, ckpt = reliable)
      .collect().map(_.toSeq).toSet
    assert(rel === local, "checkpoint strategy must not change TextRank")
  }

  test("Reliable refuses a second, different checkpoint dir") {
    reliable(Seq(1, 2, 3).toDF("x")) // ensure the dir is set
    val other = java.nio.file.Files.createTempDirectory("graft_other").toString
    val e = intercept[IllegalStateException] {
      CheckpointStrategy.Reliable(other)(Seq(1).toDF("x"))
    }
    assert(e.getMessage.contains("refusing"))
  }
}
