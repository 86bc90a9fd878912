package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-surface argument extraction for the injected native functions:
  * turns a bad argument into a descriptive analysis-time error instead
  * of a raw ClassCastException from the function builder. */
object FunctionArgs {

  /** The expression must be an integral literal (e.g. `ngram_hash_set(t, 2)`
    * — the n-gram width is a plan-time constant, not a column). */
  def literalInt(fn: String, argName: String, e: Expression): Int = e match {
    case Literal(i: Int, _) => i
    case Literal(i: Long, _) if i.isValidInt => i.toInt
    case Literal(i: Short, _) => i.toInt
    case Literal(i: Byte, _) => i.toInt
    case other =>
      throw new AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          (s"$fn: argument '$argName' must be an integer literal, " +
            s"got ${other.sql}")),
        cause = None)
  }
}
