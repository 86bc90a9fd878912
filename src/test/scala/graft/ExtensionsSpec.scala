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
          |  sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n,
          |  nfc_normalize('café') AS nrm
          |""".stripMargin).collect().head
      assert(r.getDouble(0) === 0.5)
      assert(r.getInt(2) === 2)
      assert(r.getString(3) === "café")
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

  test("ngram_hash_set rejects a non-literal width with an analysis error") {
    GraftSession.registerFunctions(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_err")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT ngram_hash_set(split(text, '\\\\s+'), n_chars) FROM docs_err")
        .collect()
    }
    assert(e.getMessage.contains("must be an integer literal"),
      s"expected a descriptive argument error, got: ${e.getMessage}")
  }

  test("a pure-SQL session can run the hashed-Jaccard dedup pipeline") {
    GraftSession.registerFunctions(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_sql")
    // same shape as dedup_jaccard, written by a SQL-only user
    val pairs = spark.sql(
      """WITH t AS (
        |  SELECT doc_id, lang, floor(n_chars/100) AS lb,
        |    ngram_hash_set(split(text, '\\s+'), 1) AS w
        |  FROM docs_sql WHERE size(split(text, '\\s+')) >= 1),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(sorted_long_intersect_size(a.w, b.w) /
        |      (size(a.w) + size(b.w) - sorted_long_intersect_size(a.w, b.w)), 4)
        |      AS jaccard
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b FROM p WHERE jaccard >= 0.6""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val api = graft.queries.DedupPack.defs("dedup_jaccard")(spark, sfDir)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === api)
  }

  test("clusterDefaults pins the 1000-executor submit preset") {
    // the preset ships as documentation-in-code for a production
    // spark-submit; this pins its keys/values against silent drift.
    // Read the builder's accumulated options reflectively — applying
    // them to the shared test session would leak 4000 shuffle
    // partitions into every later suite.
    val b = GraftSession.clusterDefaults(SparkSession.builder())
    def optionsOf(o: AnyRef): Map[String, String] = {
      var c: Class[_] = o.getClass
      while (c != null) {
        c.getDeclaredFields.find(_.getName.endsWith("options")).foreach { f =>
          f.setAccessible(true)
          return f.get(o).asInstanceOf[scala.collection.mutable.Map[String, String]].toMap
        }
        c = c.getSuperclass
      }
      fail("SparkSession.Builder no longer carries an options map")
    }
    val opts = optionsOf(b)
    assert(opts("spark.sql.shuffle.partitions") === "4000",
      "AQE coalesces downward; starting low spills at 100 TB")
    assert(opts("spark.sql.adaptive.enabled") === "true")
    assert(opts("spark.sql.adaptive.coalescePartitions.enabled") === "true")
    assert(opts("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(opts("spark.sql.autoBroadcastJoinThreshold") === (64L << 20).toString)
    assert(opts("spark.sql.files.maxPartitionBytes") === (256L << 20).toString)
    assert(opts("spark.sql.optimizer.runtime.bloomFilter.enabled") === "true")
    assert(opts("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      === (64L << 20).toString)
    assert(opts("spark.serializer") === "org.apache.spark.serializer.KryoSerializer")
    assert(opts("spark.shuffle.compress") === "true")
    assert(opts("spark.broadcast.compress") === "true")
    assert(opts("spark.sql.session.timeZone") === "UTC")
  }
}
