package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class ConnectedComponentsSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("labels a simple chain and a separate pair correctly") {
    // components: {1,2,3,4} (chain) and {10, 11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("matches a union-find ground truth on real near-dup pairs") {
    val pairs = graft.queries.DedupPack.defs("dedup_jaccard")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.connectedComponents(
      pairs.toSeq.toDF("id_a", "id_b")).as[(Long, Long)].collect().toMap
    assert(got === truth)
  }
}
