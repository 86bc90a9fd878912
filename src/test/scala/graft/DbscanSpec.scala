package graft

import graft.queries.Clustering

/** Grid-blocked DBSCAN vs hand-computed ground truth. */
class DbscanSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def run(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int) =
    Clustering.dbscanGrid(pts.toDF("id", "x", "y"), eps, minPts)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("two blobs + noise: roles and min-id cluster labels") {
    // blob A: 5 points within eps=1 of each other around (0,0);
    // blob B: 5 points around (10,10); one far-away noise point
    val a = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5),
      (4L, -0.5, 0.0), (5L, 0.0, -0.5))
    val b = Seq((11L, 10.0, 10.0), (12L, 10.5, 10.0), (13L, 10.0, 10.5),
      (14L, 9.5, 10.0), (15L, 10.0, 9.5))
    val noise = Seq((99L, 50.0, 50.0))
    val got = run(a ++ b ++ noise, eps = 1.0, minPts = 4)
    // centers see all 5 blob-mates; arms see center + 2 adjacent arms
    // (dist 1.0 > diag 0.707... arms at (0.5,0)&(0,0.5) are 0.707 apart,
    // (0.5,0)&(-0.5,0) are 1.0 apart => each arm sees all blob-mates
    // within eps=1.0 except none excluded -> all 5 are core
    a.map(_._1).foreach(id => assert(got(id)._2 === "core", s"id $id"))
    b.map(_._1).foreach(id => assert(got(id)._2 === "core", s"id $id"))
    assert(got(99L) === ((1L, "noise", -1L)))
    a.map(_._1).foreach(id => assert(got(id)._3 === 1L))
    b.map(_._1).foreach(id => assert(got(id)._3 === 11L))
  }

  test("border point attaches to its core's cluster; pair across a cell boundary survives") {
    // core cluster {1,2,3,4} tightly packed just LEFT of the x=1.0 cell
    // boundary (eps=1 => cells are unit squares); border point 5 sits
    // just RIGHT of the boundary, within eps of core 2 but with only
    // 2 neighbors itself
    val pts = Seq(
      (1L, 0.6, 0.5), (2L, 0.9, 0.5), (3L, 0.6, 0.6), (4L, 0.75, 0.4),
      (5L, 1.8, 0.5)) // within eps only of core 2 (0.9) => 2 neighbors
    val got = run(pts, eps = 1.0, minPts = 4)
    assert(got(2L)._2 === "core")
    assert(got(5L)._2 === "border", s"got ${got(5L)}")
    assert(got(5L)._3 === 1L)
  }

  test("sf0.001 roles partition the point set and clusters are min-id-labeled") {
    val rows = SparkEntry.queries("dbscan_grid")(s, sfDir)
      .as[(Long, Long, String, Long)].collect()
    assert(rows.length === Tables.points2d(s, sfDir).count())
    rows.foreach { case (id, n, role, cl) =>
      assert(n >= 1)
      role match {
        case "core" => assert(cl >= 0 && cl <= id)
        case "border" => assert(cl >= 0)
        case "noise" => assert(cl === -1L)
        case other => fail(s"unknown role $other")
      }
    }
    // every cluster label is itself a core point's id in that cluster
    val coreIds = rows.filter(_._3 == "core")
    val labels = coreIds.map(_._4).toSet
    assert(labels.subsetOf(coreIds.map(_._1).toSet))
  }

  test("lofGrid ranks the rim point far above the blob interior") {
    // 3x3 blob at 0.1 spacing, a rim point 0.8 away (in-radius of the
    // blob so it is DENSE, but its local density is ~6x sparser), and
    // one far-away point with no neighbors at all (sparse, unranked)
    val blob = for (i <- 0 until 3; j <- 0 until 3)
      yield ((i * 3 + j + 1).toLong, 0.1 * i, 0.1 * j)
    val pts = blob ++ Seq((99L, 1.0, 0.1), (50L, 5.0, 5.0))
    val got = Clustering.lofGrid(pts.toDF("id", "x", "y"),
        eps = 1.0, k = 3).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("rk"), r.getAs[Double]("lof"),
          r.getAs[Long]("n_dense"), r.getAs[Long]("n_sparse")))).toMap
    assert(got.keySet === (1L to 9L).toSet + 99L, s"ranked set: $got")
    assert(got(99L)._1 === 1, s"rim point must rank first: $got")
    assert(got(99L)._2 > 3.0, s"rim LOF must be >>1: ${got(99L)}")
    (1L to 9L).foreach { id =>
      assert(got(id)._2 < 1.5, s"blob interior LOF ~1: $id -> ${got(id)}")
    }
    assert(got(99L)._3 === 10L && got(99L)._4 === 1L)
  }

  test("isoForest isolates the far point chains earlier than the blob") {
    // 30-point tight blob + one point far outside it: every chain's
    // first few grid levels already put the outlier alone in its cell
    val blob = for (i <- 0 until 30)
      yield ((i + 1).toLong, 0.30 + 0.001 * (i % 6), 0.30 + 0.001 * (i / 6))
    val pts = blob :+ (99L, 0.95, 0.95)
    val got = Clustering.isoForest(pts.toDF("id", "x", "y")).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("rk"), r.getAs[Long]("score_sum"),
          r.getAs[Double]("avg_depth")))).toMap
    assert(got(99L)._1 === 1, s"the far point must rank first: $got")
    // depths live in [1, D+1] per chain
    got.values.foreach { case (_, s, _) =>
      assert(s >= Clustering.IsoChains.toLong &&
        s <= (Clustering.IsoDepth + 1).toLong * Clustering.IsoChains)
    }
    // the outlier isolates at least two full levels earlier on average
    val blobRanked = got.filter(_._1 != 99L)
    if (blobRanked.nonEmpty) {
      val minBlob = blobRanked.values.map(_._3).min
      assert(got(99L)._3 + 2.0 <= minBlob,
        s"outlier ${got(99L)._3} vs closest blob depth $minBlob")
    }
  }
}
