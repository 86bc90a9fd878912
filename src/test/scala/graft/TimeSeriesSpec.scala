package graft

/** Semantic gates for the round-11 time-series keys (the oracle gate
  * is the exact check; these pin the statistical invariants). */
class TimeSeriesSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("q_acf: 7 lags per type, every r in [-1, 1]") {
    val rows = SparkEntry.queries("q_acf")(s, sfDir)
      .as[(String, Int, Double)].collect()
    val byType = rows.groupBy(_._1)
    assert(byType.nonEmpty)
    byType.foreach { case (t, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to 7), s"type $t lag set")
      // Cauchy-Schwarz bounds the true ACF by 1; the lag-k partial sum
      // can exceed it only by the missing-terms margin, tiny here
      rs.foreach { case (_, k, r) =>
        assert(r >= -1.05 && r <= 1.05, s"type $t lag $k r=$r")
      }
    }
  }

  test("q_seasonality: per-type index mass sums to 7") {
    val rows = SparkEntry.queries("q_seasonality")(s, sfDir)
      .as[(String, Int, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.map(_._2).toSet.subsetOf((0 to 6).toSet))
      val mass = rs.map(_._4).sum
      assert(math.abs(mass - 7.0) < 0.01, s"type $t index mass $mass")
    }
  }

  test("q_theilsen: n_pairs = C(days,2) and slope is the pair median") {
    val rows = SparkEntry.queries("q_theilsen")(s, sfDir)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, nPairs, slope) =>
      // n_pairs must be a binomial coefficient C(d,2) for some d
      val d = (1 + math.sqrt(1 + 8.0 * nPairs)) / 2
      assert(math.abs(d - math.round(d)) < 1e-9, s"type $t n_pairs $nPairs")
      assert(!slope.isNaN && !slope.isInfinite)
    }
  }
}
