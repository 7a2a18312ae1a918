package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_char_counts(text)` — per-CODE-POINT occurrence counts of a string
  * as a sorted `array<struct<ch:string, k:bigint>>`, in ONE fused pass.
  *
  * Replaces [[graft.llm.TextStats.qCharEntropy]]'s composed formulation
  * (`transform(sequence(1, length(text)))` → per-char substr → explode →
  * (doc, ch) hash agg), which materializes one single-char STRING and one
  * exploded ROW per character of the corpus — 167 M rows at the 100×
  * ScaleUp leg, where its CPU grew a reproducible 8.6× for 3.33× data
  * (allocation pressure in the exploded frame; bench/NOTES r11 cont. 5).
  * Here the char stream never leaves the row: one code-point walk over the
  * UTF-8 bytes, counts in a small sorted map (alphabet-bounded — ≤ a few
  * hundred classes for any real document), one output row per CLASS.
  *
  * Determinism contract: counts are exact code-point counts (surrogate
  * pairs are ONE class), byte-order-sorted output — bit-identical inputs to
  * the downstream integer code-length fold regardless of partitioning. The
  * DuckDB oracle keeps its per-position substr formulation; the VALUES are
  * equal by construction (both count code points per class).
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_counts expects string, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ch", StringType, nullable = false),
      StructField("k", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(text: Any): Any =
    CharClassCounts.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.CharClassCounts.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_char_counts"
}

object CharClassCounts {
  /** One code-point pass; TreeMap keeps classes sorted by code point (==
    * UTF-8 byte order), so the output array order is a pure function of
    * the input string. */
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val m = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val cell = m.get(cp)
      if (cell == null) m.put(cp, Array(1L)) else cell(0) += 1L
      i += Character.charCount(cp)
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val row = new GenericInternalRow(2)
      row.update(0, UTF8String.fromString(
        new String(Character.toChars(e.getKey))))
      row.setLong(1, e.getValue()(0))
      out(j) = (row: InternalRow)
      j += 1
    }
    new GenericArrayData(out)
  }
}
