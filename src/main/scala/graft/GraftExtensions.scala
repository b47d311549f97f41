package graft

import graft.functions.{VecDot, VecNormSq, VecQuantize, WordShingles}
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
    e.injectFunction((
      new FunctionIdentifier("word_grams"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_grams"),
      GraftExtensions.buildWordGrams))
    e.injectFunction((
      new FunctionIdentifier("vec_quantize"),
      new ExpressionInfo(classOf[VecQuantize].getName, "vec_quantize"),
      GraftExtensions.buildVecQuantize))
    e.injectFunction((
      new FunctionIdentifier("vec_norm_sq"),
      new ExpressionInfo(classOf[VecNormSq].getName, "vec_norm_sq"),
      GraftExtensions.buildVecNormSq))
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      GraftExtensions.buildVecDot))
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

  private[graft] val buildWordGrams: Seq[Expression] => Expression = {
    exprs =>
      require(exprs.size == 2, "word_grams(text, n)")
      val n = exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"word_grams n must be an integer literal, got $other")
      }
      WordShingles(exprs.head, n, dedup = false)
  }

  private[graft] val buildVecQuantize: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 1, "vec_quantize(embedding)")
    VecQuantize(exprs.head)
  }
  private[graft] val buildVecNormSq: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 1, "vec_norm_sq(vq)")
    VecNormSq(exprs.head)
  }
  private[graft] val buildVecDot: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "vec_dot(a, b)")
    VecDot(exprs.head, exprs(1))
  }

  /** Register on an already-built session (the extensions class covers
    * `spark.sql.extensions`-configured sessions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("word_shingles", buildWordShingles, "built-in")
    r.createOrReplaceTempFunction("word_grams", buildWordGrams, "built-in")
    r.createOrReplaceTempFunction("vec_quantize", buildVecQuantize, "built-in")
    r.createOrReplaceTempFunction("vec_norm_sq", buildVecNormSq, "built-in")
    r.createOrReplaceTempFunction("vec_dot", buildVecDot, "built-in")
  }
}
