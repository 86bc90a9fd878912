package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MinHashBands, NGramHashSet, NormalizeNFC, SimHash64, SortedIntersectSize, SortedLongIntersectSize}

/** Library-level Catalyst integration: inject graft's native expressions
  * into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), so pure-SQL users get
  * the same codegen'd hot paths as the Scala API
  * (SURVEY.md §2 tier b/c surface). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (es: Seq[Expression]) => builder(es))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("cosine_sim", es => CosineSimilarity(es(0), es(1))))
    e.injectFunction(fn("minhash_bands", es => MinHashBands(es.head, 128, 32)))
    e.injectFunction(fn("simhash64", es => SimHash64(es.head)))
    e.injectFunction(fn("sorted_intersect_size",
      es => SortedIntersectSize(es(0), es(1))))
    e.injectFunction(fn("ngram_hash_set", es => NGramHashSet(es(0),
      graft.functions.FunctionArgs.literalInt("ngram_hash_set", "n", es(1)))))
    e.injectFunction(fn("sorted_long_intersect_size",
      es => SortedLongIntersectSize(es(0), es(1))))
    e.injectFunction(fn("nfc_normalize", es => NormalizeNFC(es.head)))
  }
}
