package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `graft_xor_probe(xs)` — the commutative set-census key of a bigint
  * array in one fused pass: `struct<p1: xor of elements, p2: xor of
  * splitmix64-mixed elements>`. Order-independent by construction
  * (identical sets always agree), and the independent nonlinear mix makes
  * xor-collisions between DIFFERENT sets vanishingly rare — the
  * [[graft.llm.Dedup.classPairsOf]] routing census, where a collision can
  * only overestimate duplicate mass (perf routing, never correctness).
  *
  * Exists because the composed form — two `aggregate()` higher-order
  * folds with `xxhash64` per element — evaluates interpreted per element;
  * this is compiled per array. Arithmetic here is JVM two's-complement
  * (wrapping is the point; SQL-level sums would ANSI-overflow on
  * full-range 64-bit hashes). Null elements fold as 0 (the [[CdcChunks]]
  * stance for the registered SQL surface). */
case class XorProbe(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_xor_probe expects array<bigint>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("p1", LongType, nullable = false),
    StructField("p2", LongType, nullable = false)))

  override def nullSafeEval(xs: Any): Any =
    XorProbe.compute(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.XorProbe.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): XorProbe =
    copy(child = newChild)

  override def prettyName: String = "graft_xor_probe"
}

object XorProbe {
  /** splitmix64 finalizer (Steele et al., public domain construction). */
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(xs: ArrayData): GenericInternalRow = {
    val k = xs.numElements()
    var p1 = 0L
    var p2 = 0L
    var i = 0
    while (i < k) {
      val x = if (xs.isNullAt(i)) 0L else xs.getLong(i)
      p1 ^= x
      p2 ^= mix64(x)
      i += 1
    }
    val row = new GenericInternalRow(2)
    row.setLong(0, p1)
    row.setLong(1, p2)
    row
  }
}
