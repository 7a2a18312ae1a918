package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_simhash(tokens)` — 64-bit SimHash of the token multiset: for each
  * bit position the bit is 1 iff the vote Σ(+1 if that bit of
  * xxhash64(token) is set, else −1) is positive. Hash values equal Spark's
  * builtin `xxhash64(token)` (seed 42), so the fingerprint is identical to
  * the composed formulation in [[graft.llm.Dedup.simhash]] — which Catalyst
  * runs interpreted as a 64-element `aggregate` HOF each re-scanning every
  * token hash (64·|tokens| lambda evaluations per row, ~6 s at sf0.1).
  * Here: one xxhash64 and one 64-iteration vote update per token. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $t")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(toks: Any): Any =
    SimHash64.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, toks => s"graft.functions.SimHash64.compute($toks)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHash64 {
  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      val h = XxHash64Function.hash(
        if (t == null) UTF8String.EMPTY_UTF8 else t, StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
