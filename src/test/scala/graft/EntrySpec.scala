package graft

/** Catch-all: every SURVEY.md §2 query must run and return rows on
  * sf0.001, and every oracle key must reference a real query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // each query DataFrame is CONSTRUCTED once and shared by the row and
  // schema tests below — construction is the expensive part for the
  // driver-loop fits (Lloyd iterations, codebook collects run eagerly)
  private lazy val built: Map[String, org.apache.spark.sql.DataFrame] =
    SparkEntry.queries.map { case (name, fn) => name -> fn(spark, sfDir) }

  SparkEntry.queries.keys.foreach { name =>
    test(s"query $name runs with rows > 0 on sf0.001") {
      assert(built(name).count() > 0)
    }
  }

  test("SURVEY §2 inventory matches the registered queries one-to-one") {
    val md = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val (from, to) = (md.indexOf("## §2"), md.indexOf("## §3"))
    assert(from >= 0 && to > from,
      "SURVEY.md §2/§3 headings moved — update this spec's anchors")
    val sec2 = md.substring(from, to)
    val surveyKeys = "(?m)^\\| `([a-z0-9_]+)`".r
      .findAllMatchIn(sec2).map(_.group(1)).toSet
    assert(surveyKeys === SparkEntry.queries.keySet,
      s"drift: survey-only=${surveyKeys -- SparkEntry.queries.keySet} " +
        s"code-only=${SparkEntry.queries.keySet -- surveyKeys}")
  }

  test("every query dumps atomic columns only (gate harness can't sort arrays)") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = built.toSeq.flatMap { case (name, df) =>
      df.schema.fields.toSeq.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"$name.${f.name}"
      }
    }
    assert(offenders.isEmpty, s"complex-typed dump columns: $offenders")
  }
}
