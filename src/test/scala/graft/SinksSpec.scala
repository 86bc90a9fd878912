package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import graft.sources.Sinks

class SinksSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  test("documents survive a JSONL round-trip with explicit schema") {
    val dir = tmp("graft_jsonl_")
    try {
      val docs = Tables.documents(spark, sfDir)
      Sinks.writeJsonl(docs, s"$dir/docs")
      val back = Sinks.readJsonl(spark, s"$dir/docs", docs.schema)
      assert(back.count() === docs.count())
      // value-level equality both directions
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    } finally rm(dir)
  }

  test("documents survive a CSV round-trip (quotes/newlines escaped)") {
    val dir = tmp("graft_csv_")
    try {
      val docs = Tables.documents(spark, sfDir)
        .select("doc_id", "lang", "n_chars", "text")
      Sinks.writeCsv(docs, s"$dir/docs")
      val back = Sinks.readCsv(spark, s"$dir/docs", docs.schema)
      assert(back.count() === docs.count())
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    } finally rm(dir)
  }

  test("embeddings survive an ORC round-trip (arrays included)") {
    val dir = tmp("graft_orc_")
    try {
      val emb = Tables.embeddings(spark, sfDir)
      emb.write.mode("overwrite").orc(s"$dir/emb")
      val back = spark.read.orc(s"$dir/emb")
      assert(back.count() === emb.count())
      assert(back.exceptAll(emb).isEmpty && emb.exceptAll(back).isEmpty)
    } finally rm(dir)
  }

  test("partitioned parquet prunes non-matching partitions at plan time") {
    val dir = tmp("graft_part_")
    try {
      val docs = Tables.documents(spark, sfDir)
      Sinks.writePartitioned(docs, s"$dir/docs", "lang")
      val scan = spark.read.parquet(s"$dir/docs").filter($"lang" === "en")
      val p = scan.queryExecution.explainString(SimpleMode)
      assert(p.contains("PartitionFilters") && p.contains("lang"),
        "lang predicate must prune directories, not filter rows")
      val want = docs.filter($"lang" === "en").count()
      assert(scan.count() === want)
    } finally rm(dir)
  }
}
