package graft

import org.apache.spark.sql.SparkSession

/** The SQL surface: native expressions reachable from pure SQL via
  * GraftExtensions (session-extension injection) and
  * GraftSession.registerFunctions (runtime registration). */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects functions into a fresh session") {
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT round(cosine_sim(CAST(array(1.0, 0.0, 1.0) AS ARRAY<FLOAT>),
          |                        CAST(array(1.0, 1.0, 0.0) AS ARRAY<FLOAT>)), 4) AS c,
          |  simhash64(array('a','b')) AS sh,
          |  sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n
          |""".stripMargin).collect().head
      assert(r.getDouble(0) === 0.5)
      assert(r.getInt(2) === 2)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("registerFunctions exposes the same names on an existing session") {
    GraftSession.registerFunctions(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_size(array('x','y'), array('y','z')) AS n")
      .collect().head.getInt(0)
    assert(n === 1)
  }
}
