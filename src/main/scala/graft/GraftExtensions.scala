package graft

import graft.functions.WordShingles
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions for the SQL text surface, so
  * `spark.sql("SELECT word_shingles(text, 3) FROM docs")` works the same
  * as the Column API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      GraftExtensions.buildWordShingles))
  }
}

object GraftExtensions {
  private[graft] val buildWordShingles: Seq[Expression] => Expression = {
    exprs =>
      require(exprs.size == 2, "word_shingles(text, n)")
      val n = exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"word_shingles n must be an integer literal, got $other")
      }
      WordShingles(exprs.head, n)
  }

  /** Register on an already-built session (the extensions class covers
    * `spark.sql.extensions`-configured sessions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", buildWordShingles, "built-in")
}
