package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline
  * (SURVEY.md §2). Everything here is pure `functions._` composition —
  * codegen'd, whole-stage-fusable, no UDFs — and every hash is md5 so
  * DuckDB oracles can reproduce results bit-for-bit (SURVEY.md §4).
  */
object TextFunctions {

  /** Whitespace tokenization (the `\s+` split both engines agree on). */
  def words(text: Column): Column = split(text, "\\s+")

  /** Multiset count of tokens that appear in `vocab` (native expr —
    * one hash probe per token instead of an interpreted HOF filter). */
  def hitCount(ws: Column, vocab: Seq[String]): Column =
    DedupExpressions.vocabHitCount(ws, vocab)

  /** Function-word profiles for the heuristic language ID. Scores are
    * profile hit counts; argmax with alphabetical tie-break. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ein", "mit", "ist", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "un"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "des", "est"),
    "zh" -> Seq("的", "了", "是", "我", "在", "有")
  )

  /** Predicted language: max profile score, ties to the alphabetically
    * first language (profiles are listed sorted). */
  def predictedLang(ws: Column): Column = {
    val scores = langProfiles.map { case (lang, prof) => lang -> hitCount(ws, prof) }
    scores.foldRight(lit(scores.last._1)) { case ((lang, score), rest) =>
      val geAll = scores.filter(_._1 != lang)
        .map { case (_, s) => score >= s }
        .reduce(_ && _)
      when(geAll, lit(lang)).otherwise(rest)
    }
  }

  /** Number of characters matching a regex character class. */
  def charClassCount(text: Column, cls: String): Column =
    length(regexp_replace(text, s"[^$cls]", ""))

  /** Word 3-gram shingles (space-joined); empty array below 3 words. */
  def triShingles(ws: Column): Column =
    when(size(ws) >= 3,
      transform(sequence(lit(0), size(ws) - 3), i =>
        concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2),
          element_at(ws, i + 3))))
      .otherwise(array())

  /** Winnowing-style document fingerprint: min md5 over 3-gram shingles. */
  def fingerprint(ws: Column): Column =
    array_min(transform(triShingles(ws), md5 _))
}
