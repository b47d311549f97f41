package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One MD5 digest → several int64 hash fields, fused.
  *
  * Semantically identical to `conv(substring(md5(x), pos, len), 16, 10)
  * .cast("long")` per field (the engine's deterministic-hash idiom —
  * md5 is the only hash family DuckDB reproduces bit-for-bit), but:
  * computes the digest ONCE for all fields, never materializes the hex
  * string, and never re-parses it — the long is assembled straight from
  * digest nibbles. On the minhash candidate-generation path this
  * replaces digest + hex-encode + 2×(substring + string→long parse)
  * per shingle with digest + 2 nibble folds.
  *
  * `fields` are (1-based hex position, length ≤ 15) pairs over the
  * 32-char hex rendering; length ≤ 15 keeps every value strictly below
  * 2^60, positive in int64 in any engine.
  */
case class Md5Longs(child: Expression, fields: Seq[(Int, Int)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_longs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (fields.isEmpty)
      TypeCheckResult.TypeCheckFailure("md5_longs needs at least one field")
    else if (fields.exists { case (p, l) => p < 1 || l < 1 || l > 15 || p + l - 1 > 32 })
      TypeCheckResult.TypeCheckFailure(
        s"md5_longs fields must satisfy pos>=1, 1<=len<=15, pos+len-1<=32: $fields")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_longs needs a string input, got ${child.dataType}")

  // (0-based start nibble, length) — hex char i (1-based) is nibble i−1
  private lazy val nibbleFields = fields.map { case (p, l) => (p - 1, l) }.toArray

  /** Shared by eval and generated code; never null for non-null input. */
  def compute(input: UTF8String): ArrayData = {
    val digest = org.apache.commons.codec.digest.DigestUtils.md5(input.getBytes)
    val out = new Array[Long](nibbleFields.length)
    var f = 0
    while (f < nibbleFields.length) {
      val (start, len) = nibbleFields(f)
      var v = 0L
      var j = start
      while (j < start + len) {
        val nibble =
          if ((j & 1) == 0) (digest(j >> 1) >> 4) & 0xF
          else digest(j >> 1) & 0xF
        v = (v << 4) | nibble
        j += 1
      }
      out(f) = v
      f += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Longs", this, classOf[Md5Longs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Longs =
    copy(child = newChild)
}

object Md5Longs {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, fields: Seq[(Int, Int)]): Column =
    ColumnShim.column(Md5Longs(ColumnShim.expression(c), fields))
}
