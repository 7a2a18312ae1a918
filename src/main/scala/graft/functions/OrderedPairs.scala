package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `graft_ordered_pairs(xs)` — all positional pairs (xs[i], xs[j]) with
  * i < j of a bigint array, as `array<struct<a:bigint, b:bigint>>`, in ONE
  * fused pass: C(k,2) structs from a single allocation.
  *
  * Replaces the composed higher-order formulation
  * `flatten(transform(xs, (x, i) => transform(slice(xs, i+2, k-i-1), ...)))`
  * whose per-element `slice` + inner `transform` + `flatten` each allocate
  * and copy an intermediate array — measured 22.5 s wall for a 36 M-row
  * pair explode at the 30× ScaleUp leg in q_assoc_rules, i.e. the explode
  * itself dominated the whole query (bench/NOTES r12). Element ORDER is
  * positional: callers wanting value-ordered pairs (a < b) must pass a
  * sorted distinct array, which is what q_assoc_rules' basket classes are
  * by construction.
  *
  * Null elements are treated as 0 (the array columns feeding this are
  * built by collect_set/sort_array and cannot contain nulls; the
  * registered SQL surface gets a defined value instead of an NPE —
  * the [[CdcChunks]] stance). */
case class OrderedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ordered_pairs expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(xs: Any): Any =
    OrderedPairs.compute(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.OrderedPairs.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)

  override def prettyName: String = "graft_ordered_pairs"
}

object OrderedPairs {
  def compute(xs: ArrayData): GenericArrayData = {
    val k = xs.numElements()
    // Pair count in Long first: k*(k-1)/2 overflows Int past k ≈ 46341,
    // and the function is registered on the session SQL surface where
    // arbitrary arrays can reach it — fail with a clear message instead
    // of a wrapped negative array size (r12 ADVICE). Internal callers
    // (q_assoc_rules baskets) are width-bounded far below this.
    val nL = k.toLong * (k - 1L) / 2L
    require(nL <= Int.MaxValue,
      s"graft_ordered_pairs: $k elements would expand to $nL pairs, " +
        "past the 2^31-1 single-array bound — cap or pre-bucket the array")
    val n = nL.toInt
    val out = new Array[Any](n)
    var p = 0
    var i = 0
    while (i < k) {
      val a = if (xs.isNullAt(i)) 0L else xs.getLong(i)
      var j = i + 1
      while (j < k) {
        val row = new GenericInternalRow(2)
        row.setLong(0, a)
        row.setLong(1, if (xs.isNullAt(j)) 0L else xs.getLong(j))
        out(p) = row
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
