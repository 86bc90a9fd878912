package graft

import org.apache.spark.sql.execution.SimpleMode

/** Plan-shape invariants (SURVEY.md §3): these are the properties that
  * keep the engine viable at 100 TB, asserted against the optimized
  * physical plans so regressions fail CI, not the cluster. */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution
      .explainString(SimpleMode)

  test("q1_agg pushes the date filter and prunes to needed columns") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_partkey"), "unused columns must not be read")
    assert(p.contains("partial_sum"), "map-side partial aggregation expected")
  }

  test("q3_join and q5_join5 broadcast every dim — no sort-merge join") {
    for (q <- Seq("q3_join", "q5_join5")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q should broadcast dims")
      assert(!p.contains("SortMergeJoin"), s"$q must not shuffle the fact table for a join")
    }
  }

  test("km_assign is shuffle-free (broadcast-literal centroid fold)") {
    val p = plan("km_assign")
    assert(!p.contains("Exchange"), "assignment is a pure map over the scan")
  }

  test("km_update shuffles only the partial-aggregate rows") {
    val p = plan("km_update")
    assert(p.contains("partial_avg") || p.contains("partial_average"),
      "per-cluster means must combine map-side")
  }

  test("dedup candidate joins move ids, not documents") {
    val p = plan("dedup_minhash")
    // the band self-join output feeds dropDuplicates on two id columns
    assert(p.contains("band_val"))
    assert(!p.contains("SortMergeJoin") || !p.contains("wd#"),
      "word arrays must not ride the candidate shuffle")
  }
}
