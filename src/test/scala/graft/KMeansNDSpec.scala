package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeansND

class KMeansNDSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def tiny = Seq(
    (0L, Array(0f, 0f, 0f)), (1L, Array(1f, 0f, 0f)),
    (2L, Array(10f, 10f, 10f)), (3L, Array(10f, 11f, 10f))
  ).toDF("id", "vec")

  test("assign picks the nearest centroid in n dimensions") {
    val cs = Seq(0 -> Array(0.0, 0.0, 0.0), 1 -> Array(10.0, 10.0, 10.0))
    val got = KMeansND.assign(tiny, cs).select("id", "cid")
      .as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("assign dist matches the squared euclidean distance") {
    val cs = Seq(0 -> Array(0.0, 0.0, 0.0))
    val d = KMeansND.assign(tiny.filter($"id" === 1), cs)
      .select("dist").as[Double].head()
    assert(math.abs(d - 1.0) < 1e-12)
  }

  test("fit converges to the two blobs") {
    val cs = KMeansND.fit(tiny, 2).toMap
    assert(cs(0).toSeq === Seq(0.5, 0.0, 0.0))
    assert(cs(1).toSeq === Seq(10.0, 10.5, 10.0))
  }

  test("fit's treeAggregate inner loop equals the DataFrame step on embeddings") {
    val p = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val k = 4
    val viaFit = KMeansND.fit(p, k, maxIter = 1, tol = 0.0)
    val viaStep = KMeansND.step(p, KMeansND.seed(p, k))
    assert(viaFit.map { case (c, v) => c -> v.toSeq }
      === viaStep.map { case (c, v) => c -> v.toSeq })
  }

  test("MLlib fit and KMeansND.fit converge to comparable WSSSE on " +
    "the same embeddings (cross-check of the two fit paths)") {
    // km_fit_mllib is a rows-only gate (MLlib internals aren't
    // SQL-replayable) — this pins its QUALITY instead: two completely
    // independent Lloyd implementations (MLlib's and the repo's
    // treeAggregate loop), different seeding, same data and k, must
    // land within a small factor of each other's converged cost. A
    // regression in either fit path (bad init, broken update, early
    // exit) shows up as a cost gap long before a user would notice.
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val k = 8
    val emb = Tables.embeddings(spark, sfDir)
    val feat = emb.select($"vec_id", array_to_vector($"embedding").as("features"))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(20)
      .setInitMode("random").fit(feat)
    val mllibCost = model.summary.trainingCost
    val p = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val cs = KMeansND.fit(p, k, maxIter = 20)
    val ndCost = KMeansND.assign(p, cs)
      .agg(sum("dist")).as[Double].head()
    assert(mllibCost > 0 && ndCost > 0)
    val ratio = math.max(mllibCost / ndCost, ndCost / mllibCost)
    assert(ratio < 1.25,
      s"the two fit paths must agree on converged quality: " +
        s"mllib=$mllibCost nd=$ndCost ratio=$ratio")
  }

  test("step leaves empty clusters unchanged") {
    val cs = Seq(0 -> Array(0.0, 0.0, 0.0), 1 -> Array(1000.0, 0.0, 0.0))
    val next = KMeansND.step(tiny, cs).toMap
    assert(next(1).toSeq === Seq(1000.0, 0.0, 0.0))
  }
}
