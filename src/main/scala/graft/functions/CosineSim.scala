package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_cosine(a, b)` — cosine similarity of two `array<double>` columns
  * in one fused, allocation-free loop.
  *
  * Replaces the three higher-order-function folds of the composed form
  * (`dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with
  * `aggregate(zip_with(...))`): each `zip_with` materializes a products
  * array per row and each `aggregate` folds through a lambda — nine array
  * walks and three allocations per pair. The fused loop keeps the three
  * accumulators in registers inside whole-stage codegen.
  *
  * Bit-compatibility contract: each accumulator is a strict left-to-right
  * IEEE double sum in element order — the SAME order the `aggregate` fold
  * and the DuckDB oracle's `list_inner_product` use — and the final
  * combination `dot / (sqrt(na) * sqrt(nb))` is the same expression tree,
  * so results are bit-identical to the composed form (the oracle gate's
  * 6-dp rounding never sees a difference). Null array → null; zero-norm
  * input yields the same ±Infinity/NaN the composed form produced.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object CosineSim {
  /** Narrowed contract vs the composed HOF form (which NULL-pads unequal
    * lengths and nulls out on null elements): inputs must be equal-length
    * arrays of non-null doubles — a length mismatch throws rather than
    * silently truncating, and a null slot is read as 0.0 (UnsafeArrayData
    * has no checked null path in the primitive getter). The corpus columns
    * are fixed-64-dim non-null, so the narrowed contract is exact there. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_cosine: length mismatch ($n vs ${b.numElements()})")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
