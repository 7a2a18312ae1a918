package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_sqdist_long(a, b)` — exact integer squared L2 distance of two
  * fixed-point `array<long>` vectors in one allocation-free loop.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0L, +)` in the
  * IVF assignment hot path (evaluated once per vector × candidate cell —
  * 16 folds per row, each materializing a differences array). Integer
  * addition is associative, so the result is identical no matter the fold
  * order; all products stay < 2^63 for 1e-6 fixed-point embeddings.
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sqdist_long expects (array<long>, array<long>), got ($l, $r)")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDistLong.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SqDistLong.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sqdist_long"
}

object SqDistLong {
  /** Same narrowed contract as [[CosineSim.compute]]: equal-length arrays
    * of non-null longs; a length mismatch throws instead of silently
    * truncating to the shorter prefix. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_sqdist_long: length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}
