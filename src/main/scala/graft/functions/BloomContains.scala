package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

import java.io.ByteArrayInputStream

/** `graft_bloom_contains(bloomBin, key)` — probe a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (built driver-side with
  * `df.stat.bloomFilter` and `writeTo`) with a LONG key, inside whole-stage
  * codegen.
  *
  * The q_truss peel's round pre-filter: one scan of the triangle memo with
  * three of these probes replaces three full-scan broadcast semi joins
  * (guide §3.2 — Bloom-prefilter the big side). False positives are
  * harmless by construction: every candidate that survives the probe is
  * re-verified by an EXACT semi join on the (tiny) candidate set, so query
  * results are bit-identical to the join-only formulation. The left child
  * must be a foldable binary (the filter is deserialized ONCE driver-side
  * and referenced from generated code, never per row).
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (foldable binary, long), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = right.eval(input)
    if (k == null) false else bloom.mightContainLong(k.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    val keyGen = right.genCode(ctx)
    val code =
      code"""
        ${keyGen.code}
        boolean ${ev.value} = false;
        if (!${keyGen.isNull}) {
          ${ev.value} = $bloomRef.mightContainLong(${keyGen.value});
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_contains"
}
