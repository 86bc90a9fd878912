package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeansDF
import graft.sources.PointsSource

/** End-to-end run of the reference's own scenario: the Birch-1 dataset
  * it ships (data/birch1.txt), NUM_INPUT=10000 points (config.cuh:12),
  * k=15 (config.cuh:14), integer-mean iteration semantics
  * (kmeans_mapreduce_core.cu:54-69). The reference's centroid init is
  * wall-clock-seeded (random_num_generator.hpp:18), so exact output
  * equality is unreproducible even by the reference itself; this spec
  * asserts the semantics instead. */
class ReferenceFidelitySpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private val birch = "/root/reference/data/birch1.txt"
  private val NumInput = 10000
  private val K = 15

  private lazy val points =
    PointsSource.readPoints(spark, birch).limit(NumInput).cache()

  test("reads the reference's input exactly as it does") {
    assert(points.count() === NumInput)
    val r = points.agg(min("x"), max("x"), min("y"), max("y")).head()
    assert(r.getDouble(0) >= 0 && r.getDouble(3) <= 1000000)
  }

  test("the reference's recorded centroids are fixpoints of our integer step") {
    // data/birch1.txt.output is a run the reference shipped. Its init is
    // wall-clock-seeded, so the run itself is unreproducible — but any
    // converged centroid must be a FIXPOINT of one assignment+integer-
    // mean iteration, and fixpointness is seed-independent. 10 of the
    // 15 recorded centroids (the dense Birch grid clusters) reproduce
    // bit-exactly under our step — a single tie-break, rounding, or
    // distance discrepancy would perturb them. The other 5 sit in the
    // sparse remainder and are not fixpoints of the shipped data under
    // either NUM_INPUT=10000 or the full 100k file (they move by >10⁴
    // units), i.e. the recording predates the shipped data/config —
    // measured, not assumed.
    val re = """Point: \((\d+),(\d+)\)""".r
    val recorded = {
      val src = scala.io.Source.fromFile("/root/reference/data/birch1.txt.output")
      try src.getLines().collect { case re(x, y) => (x.toDouble, y.toDouble) }
        .zipWithIndex.map { case ((x, y), i) => KMeansDF.Centroid(i, x, y) }.toSeq
      finally src.close()
    }
    assert(recorded.length === K)
    val next = KMeansDF.stepInt(points, recorded)
    val fixed = recorded.zip(next).count { case (a, b) => a.x == b.x && a.y == b.y }
    assert(fixed >= 10, s"expected >=10 bit-exact fixpoint centroids, got $fixed")
  }

  test("integer-mode Lloyd's matches the reference's arithmetic") {
    val cs = KMeansDF.fitReference(points, K, iterations = 10)
    assert(cs.length === K)
    // integer means: every centroid coordinate is a whole number in range
    assert(cs.forall(c => c.x == math.floor(c.x) && c.y == math.floor(c.y)))
    assert(cs.forall(c => c.x >= 0 && c.x <= 1000000 && c.y >= 0 && c.y <= 1000000))
    // iterating must not worsen the clustering it started from
    val cost0 = KMeansDF.cost(points, KMeansDF.initFirstK(points, K))
      .as[Double].head()
    val cost10 = KMeansDF.cost(points, cs).as[Double].head()
    assert(cost10 < cost0, s"WSSSE should improve: $cost0 -> $cost10")
    // every point accounted for
    val sizes = KMeansDF.assign(points, cs).groupBy("cid").count()
      .agg(sum("count")).head().getLong(0)
    assert(sizes === NumInput)
  }
}
