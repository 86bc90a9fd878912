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
}
