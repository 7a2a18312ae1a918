package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_cdc_chunks(tokens)` — content-defined chunking of a token array
  * in ONE fused pass: a chunk closes AFTER every token whose 32-bit md5
  * prefix ≡ 0 (mod [[graft.llm.TextStats.CdcMask]]); output is the ordered
  * `array<struct<chunk:string, n:bigint>>` of space-joined chunks with
  * their token counts.
  *
  * Replaces [[graft.llm.TextStats.qCdcChunk]]'s composed formulation
  * (per-token md5 → posexplode → per-doc running-sum WINDOW → (doc, chunk)
  * hash agg re-sorting tokens via array_sort(collect_list(struct))) whose
  * CPU grew a reproducible 13.5× for 3.33× data at the 100× leg
  * (bench/NOTES r11 cont. 5-6: the same exploded-frame allocation class as
  * char_entropy). Tokens never leave the row: the boundary hash is the
  * SAME `conv(substring(md5(tok),1,8),16,10)` value (first 4 md5 bytes,
  * big-endian unsigned) the composed form and the DuckDB oracle compute,
  * so chunk boundaries — and therefore every downstream digest and
  * occurrence count — are bit-identical.
  *
  * Null ELEMENTS (the function is in the session registry, so SQL users
  * can pass arrays the internal caller never produces): a null token is
  * treated as the empty string — the [[ShingleHashes]]/[[SimHash64]]
  * stance — rather than throwing a raw NPE from codegen.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(toks: Any): Any =
    CdcChunks.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.CdcChunks.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "graft_cdc_chunks"
}

object CdcChunks {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes, big-endian, as an unsigned 32-bit value — exactly
    * `conv(substring(md5(tok), 1, 8), 16, 10)`. */
  private def md5Prefix32(t: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(t.getBytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  def compute(toks: ArrayData): GenericArrayData = {
    val mask = graft.llm.TextStats.CdcMask
    val m = toks.numElements()
    val chunks = new java.util.ArrayList[InternalRow]()
    val sb = new java.lang.StringBuilder()
    var n = 0L
    var i = 0
    while (i < m) {
      val t0 = toks.getUTF8String(i)
      val t = if (t0 == null) UTF8String.EMPTY_UTF8 else t0
      if (n > 0L) sb.append(' ')
      sb.append(t.toString)
      n += 1L
      if (md5Prefix32(t) % mask == 0L) {
        val row = new GenericInternalRow(2)
        row.update(0, UTF8String.fromString(sb.toString))
        row.setLong(1, n)
        chunks.add(row)
        sb.setLength(0)
        n = 0L
      }
      i += 1
    }
    if (n > 0L) {
      val row = new GenericInternalRow(2)
      row.update(0, UTF8String.fromString(sb.toString))
      row.setLong(1, n)
      chunks.add(row)
    }
    new GenericArrayData(chunks.toArray)
  }
}
