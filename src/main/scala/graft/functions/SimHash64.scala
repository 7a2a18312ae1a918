package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_simhash(tokens)` — 64-bit SimHash of the token multiset: for each
  * bit position the bit is 1 iff the vote Σ(+1 if that bit of the token
  * hash is set, else −1) is positive. The token hash is the little-endian
  * lower 64 bits of md5(token) — exactly DuckDB's `md5_number_lower`, which
  * is what makes q_dedup_simhash DuckDB-oracle-checkable (the xxhash64
  * family this replaces has no cross-engine equivalent). One md5 (thread-
  * local MessageDigest) and one 64-iteration vote update per token; still
  * a single codegen'd call per row, vs the composed 64-element `aggregate`
  * HOF formulation Catalyst runs interpreted (64·|tokens| lambda
  * evaluations per row, ~6 s at sf0.1). */
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
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian interpretation of md5 bytes 8..15 — the same value as
    * DuckDB's `md5_number_lower(s)` (as a signed Long reading of the uint64
    * bit pattern; per-bit tests agree either way). */
  def md5LowerLE(bytes: Array[Byte]): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(bytes)
    java.nio.ByteBuffer.wrap(h, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  }

  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      val h = md5LowerLE(
        (if (t == null) UTF8String.EMPTY_UTF8 else t).getBytes)
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
