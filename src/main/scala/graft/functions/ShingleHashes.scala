package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingle_hashes(tokens, n)` — the DISTINCT 64-bit hashes of the
  * word n-gram shingles of `tokens`, sorted ascending. Hash values equal
  * Spark's builtin `xxhash64(concat_ws(' ', <n-gram>))` (same XXH64, same
  * seed 42), so MinHash signatures derived from them are unchanged.
  *
  * This fuses the shingle pipeline the dedup operators previously composed
  * from `transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`
  * + `array_distinct` + `transform(xxhash64)` — nested higher-order
  * functions that Catalyst evaluates interpreted, re-allocating the slice
  * and the joined string per element (~7 s of the sf0.1 bench). One tight
  * loop per row, no intermediate string arrays, and the shingle never
  * leaves the row as a string — downstream joins shuffle 8-byte longs.
  * (SURVEY.md §2.2 custom-operator preference: a native expression beats a
  * UDF; `doGenCode` keeps the call inside whole-stage codegen.)
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes expects (array<string>, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleHashes.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($toks, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashes {
  private val SEP = UTF8String.fromString(" ")

  /** Distinct sorted xxhash64(seed 42) values of the space-joined n-grams.
    * Fewer than n tokens → empty array (TextStats.shingles semantics). */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (n <= 0 || m < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[Long]()
    val out = new Array[Long](m - n + 1)
    var nOut = 0
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      val h = XxHash64Function.hash(
        UTF8String.concatWs(SEP, parts: _*), StringType, 42L)
      if (seen.add(h)) { out(nOut) = h; nOut += 1 }
      i += 1
    }
    val arr = java.util.Arrays.copyOf(out, nOut)
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }
}
