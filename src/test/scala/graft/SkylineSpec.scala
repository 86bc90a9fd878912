package graft

/** Semantic gates for the grid-pruned Pareto skyline (the oracle gate
  * is the exact check against the brute-force NOT EXISTS dominance
  * test; these pin the set semantics on hand inputs). */
class SkylineSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("skylineFrom keeps exactly the non-dominated set, ties included") {
    val pts = Seq(
      (1L, 10L, 10L, 10L), // dominated by 2
      (2L, 20L, 20L, 20L), // skyline
      (3L, 30L, 5L, 5L), // skyline (best d1)
      (4L, 5L, 30L, 5L), // skyline (best d2)
      (5L, 20L, 20L, 20L), // exact duplicate of 2 — equal rows do not
      //                      dominate each other, BOTH survive
      (6L, 19L, 20L, 20L), // dominated by 2 (strict in d1 only)
      (7L, 5L, 5L, 31L) // skyline (best d3)
    ).toDF("id", "d1", "d2", "d3")
    val out = graft.queries.AnalyticsPack.skylineFrom(pts)
      .collect().map(_.getLong(0)).sorted
    assert(out === Array(2L, 3L, 4L, 5L, 7L))
  }

  test("an anti-correlated diagonal sits entirely on the skyline") {
    // the adversarial regime the Scaladoc documents: every point is
    // Pareto-optimal, so nothing may be pruned — including points that
    // share grid cells with their diagonal neighbors
    val n = 50
    val pts = (1 to n).map(i => (i.toLong, i.toLong, (n - i).toLong, 7L))
      .toDF("id", "d1", "d2", "d3")
    assert(graft.queries.AnalyticsPack.skylineFrom(pts).count() === n.toLong)
  }

  test("a single whale collapses the skyline to one row") {
    val pts = (1L to 40L).map(i => (i, i % 7, i % 5, i % 3))
      .toDF("id", "d1", "d2", "d3")
      .union(Seq((99L, 100L, 100L, 100L)).toDF("id", "d1", "d2", "d3"))
    val out = graft.queries.AnalyticsPack.skylineFrom(pts).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(99L))
  }
}
