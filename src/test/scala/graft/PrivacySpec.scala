package graft

import graft.queries.StatsPack

/** Privacy-release keys: l-diversity consistency and the geometric
  * (discrete Laplace) DP mechanism. */
class PrivacySpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("dp noise thresholds are a monotone CDF on the 16-bit grid, symmetric about 0") {
    val t = StatsPack.dpNoiseThresholds
    assert(t.map(_._2) === (-20 to 20))
    assert(t.map(_._1) === t.map(_._1).sorted)
    assert(t.last._1 === 65536L)
    // two-sided geometric symmetry: P(k) == P(-k) within the grid
    val cdf = t.map(_._1)
    val pmf = cdf.zip(0L +: cdf.init).map { case (hi, lo) => hi - lo }
    val p = t.map(_._2).zip(pmf).toMap
    (1 to 19).foreach { k =>
      assert(math.abs(p(k) - p(-k)) <= 1, s"asymmetry at |k|=$k")
    }
    // mode at 0 and enough mass near it for eps=0.5
    assert(p(0) === pmf.max)
    assert((-3 to 3).map(p).sum > 0.8 * 65536)
  }

  test("q_dp_count: replayable, integer, zero-clamped") {
    val a = SparkEntry.queries("q_dp_count")(s, sfDir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val b = SparkEntry.queries("q_dp_count")(s, sfDir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq, "the md5-draw release must be replayable")
    a.foreach { case (_, n, noise, noisy) =>
      assert(noise >= -20 && noise <= 20)
      assert(noisy === math.max(0L, n + noise))
    }
    // the draw varies across keys (not a constant shift)
    assert(a.map(_._3).distinct.length > 1)
  }

  test("q_l_diversity: at_risk iff n_sens < l, and n_sens <= gsize") {
    val rows = SparkEntry.queries("q_l_diversity")(s, sfDir)
      .as[(Int, String, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, gsize, nSens, l, atRisk) =>
      assert(l === 3L)
      assert(nSens >= 1 && nSens <= gsize)
      assert(atRisk === (nSens < l))
    }
  }
}
