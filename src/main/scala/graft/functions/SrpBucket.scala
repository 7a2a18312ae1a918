package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_srp_bucket(sv, flat_signs, bits)` — sign-random-projection LSH
  * bucket id in one pass: for plane p ∈ [0, bits), the projection is the
  * integer dot product of the 1e-6 fixed-point vector `sv` with row p of
  * the flattened ±1 sign matrix (`flat_signs`, length bits·dims); bit p of
  * the bucket is set iff the projection is > 0.
  *
  * Replaces `bits` separate `aggregate(zip_with(...))` folds — each of
  * which materialized a products array per row per plane — with one fused
  * loop over all planes inside whole-stage codegen. All arithmetic is
  * exact integers (products < 2^53 summed over 64 dims), so bucket bits
  * are order-independent and identical to the composed form and to the
  * DuckDB oracle's `list_inner_product` replay. Strict `> 0` sign test —
  * the same tie rule (projection 0 → bit clear) as the composed form.
  */
case class SrpBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_srp_bucket expects (array<long>, array<long>, int), got ($a, $b, $c)")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(sv: Any, signs: Any, bits: Any): Any =
    SrpBucket.compute(sv.asInstanceOf[ArrayData], signs.asInstanceOf[ArrayData],
      bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sv, signs, bits) =>
      s"graft.functions.SrpBucket.compute($sv, $signs, $bits)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SrpBucket =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_srp_bucket"
}

object SrpBucket {
  def compute(sv: ArrayData, signs: ArrayData, bits: Int): Long = {
    val dims = sv.numElements()
    // Fail loudly on a short sign matrix: the SQL-registered function is
    // callable with arbitrary arrays, and an out-of-bounds UnsafeArrayData
    // read does NOT throw — it yields silently-garbage bucket ids.
    if (bits < 0 || signs.numElements() < bits.toLong * dims)
      throw new IllegalArgumentException(
        s"graft_srp_bucket: sign matrix has ${signs.numElements()} elements, " +
          s"needs bits*dims = ${bits.toLong * dims}")
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val off = p * dims
      var proj = 0L
      var i = 0
      while (i < dims) {
        proj += sv.getLong(i) * signs.getLong(off + i)
        i += 1
      }
      if (proj > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}
