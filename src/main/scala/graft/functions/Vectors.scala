package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math for the similarity operators (SURVEY §2.10 X3).
  *
  * Rationale, same as [[WordShingles]] (measured there ~50×): Spark's
  * higher-order functions (`transform`/`aggregate`/`zip_with`) evaluate
  * their lambda *interpreted per array element* — for a 64-dim embedding
  * that is 64 interpreted calls per row on the candidate-pair hot path.
  * These expressions run the whole loop as plain JVM code behind a single
  * call. Each implements `doGenCode` (not CodegenFallback): the generated
  * code invokes the expression's `compute` on the child's codegen'd value
  * directly, so the surrounding stage needs no `INPUT_ROW`
  * materialization and no interpreted expression-tree dispatch. `eval`
  * and codegen share the same `compute` body and cannot diverge.
  *
  * Determinism: [[VecQuantize]] reproduces Spark's `round(x*10000)` for
  * doubles bit-for-bit (shortest-decimal BigDecimal, HALF_UP — the same
  * algorithm `o.a.s.catalyst.expressions.Round` uses), so results are
  * byte-identical to the previous HOF formulation and to the DuckDB
  * oracle's `round(CAST(x AS DOUBLE) * 10000)`. Dot products and squared
  * norms over the quantized int64 vectors are exact integer sums —
  * order-independent in any engine.
  */
object VectorExprs {
  /** Spark `Round(DoubleType, 0)` semantics: shortest-repr decimal,
    * HALF_UP, then truncating cast to long. */
  @inline private[functions] def roundToLong(d: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue().toLong
}

/** `array<float|double>` → `array<long>`: element-wise
  * `round(x * 10000)::long`, one JVM pass. Null anywhere → null result
  * (embeddings are non-null by contract; this is the defensive path).
  */
case class VecQuantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_quantize"
  // null on a null ELEMENT even when the array itself is non-nullable —
  // without this override the generated code assigns ev.isNull while
  // nullSafeCodeGen declared it a literal `false` (janino error →
  // interpreted fallback writing garbage 0 for a "non-null" long)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_quantize needs array<float|double>, got $other")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Shared by eval and generated code; null on a null element. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = VectorExprs.roundToLong(d * 10000d)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecQuantize", this, classOf[VecQuantize].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): VecQuantize =
    copy(child = newChild)
}

/** `array<long>` → `long`: Σ x², exact integer. */
case class VecNormSq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_norm_sq"
  override def nullable: Boolean = true // null element → null (see VecQuantize)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm_sq needs array<long>, got $other")
  }

  /** Shared by eval and generated code; null on a null element. */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getLong(i)
      acc += v * v
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecNormSq", this, classOf[VecNormSq].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("normSq")
      s"""
      java.lang.Long $res = $ref.compute($c);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $res.longValue(); }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecNormSq =
    copy(child = newChild)
}

/** `(array<long>, array<long>)` → `long`: Σ aᵢ·bᵢ, exact integer.
  * Length mismatch → null (matches `zip_with` null-padding semantics
  * feeding an additive `aggregate`). This is the candidate-pair hot
  * path of brute/IVF top-k and embedding near-dup.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot"
  // null on LENGTH MISMATCH or a null element, independent of child
  // nullability (see VecQuantize note)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two array<long> inputs, got $l / $r")
    }

  /** Shared by eval and generated code; null on length mismatch or a
    * null element. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Long = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecDot", this, classOf[VecDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dot")
      s"""
      java.lang.Long $res = $ref.compute($a, $b);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $res.longValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

object VecOps {
  import org.apache.spark.sql.graftshim.ColumnShim
  def quantize(c: Column): Column = ColumnShim.column(VecQuantize(ColumnShim.expression(c)))
  def normSq(c: Column): Column   = ColumnShim.column(VecNormSq(ColumnShim.expression(c)))
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))
}
