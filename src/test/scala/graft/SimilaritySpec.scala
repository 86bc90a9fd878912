package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosineSim
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("cosineSim matches a hand-computed value") {
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(1.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val got = df.select(cosineSim($"a", $"b")).as[Double].head()
    assert(math.abs(got - 0.5) < 1e-12) // dot=1, |a|=|b|=sqrt(2)
  }

  test("cosineSim is 1 for identical vectors and 0 for zero vectors") {
    val df = Seq((Array(0.3f, -2.0f), Array(0.3f, -2.0f), Array(0.0f, 0.0f)))
      .toDF("a", "b", "z")
    val r = df.select(cosineSim($"a", $"b"), cosineSim($"a", $"z"))
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12 && r._2 === 0.0)
  }

  test("cosineSim survives codegen in a realistic plan") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(cosineSim($"a.embedding", $"b.embedding").as("c"))
      .filter($"c" > -2).count()
    assert(n > 0)
  }

  test("topK returns k ranked neighbors per query, self excluded") {
    val emb = Tables.embeddings(spark, sfDir)
    val r = Similarity.topK(emb, emb.filter($"vec_id" < 3), 5).collect()
    assert(r.length === 15)
    assert(r.forall(row => row.getAs[Long]("qid") != row.getAs[Long]("vid")))
    val ranks = r.groupBy(_.getAs[Long]("qid")).values.map(_.map(_.getAs[Int]("rk")).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1, 2, 3, 4, 5)))
  }

  test("lshTopK candidates are a subset of exact ranking universe") {
    val emb = Tables.embeddings(spark, sfDir)
    val r = Similarity.lshTopK(emb, emb.filter($"vec_id" < 5), 3)
    assert(r.count() <= 15)
  }

  test("ivfTopK with nprobe=all cells reproduces the exact topK") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" < 3)
    val cents = graft.operators.KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 4)
    // probing every cell makes IVF exhaustive → must equal brute force
    val ivf = Similarity.ivfTopK(emb, q, cents, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.topK(emb, q, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf === exact)
  }

  test("ivfTopK with nprobe=1 searches only the query's own cell") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" < 3)
    val cents = graft.operators.KMeansND.seed(
      emb.select($"vec_id".as("id"), $"embedding".as("vec")), 4)
    val r = Similarity.ivfTopK(emb, q, cents, k = 3, nprobe = 1)
    // bounded output, correctly ranked per query
    val rows = r.collect()
    assert(rows.length <= 9 && rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
