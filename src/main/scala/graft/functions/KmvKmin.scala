package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_kmv_kmin(hash, k)` — the K-Minimum-Values distinct sketch as a
  * native aggregate: the k smallest DISTINCT non-negative long hashes of
  * the group, returned as an ascending `array<long>`.
  *
  * Why a custom aggregate rather than `slice(array_sort(collect_set(h)))`:
  * `collect_set`'s buffer grows with the group's DISTINCT count — the very
  * quantity the sketch exists to avoid materializing (a 10⁹-user group
  * builds a 10⁹-entry set per partial). This buffer is bounded at k longs
  * at every stage: partials fold map-side (`update` keeps k minima per
  * partition), `merge` is a bounded k-way set union, and the shuffle
  * carries one ≤ k-element buffer per group per partition. KMV estimator
  * downstream: est = (k−1) / frac(h_k); union of sketches = re-aggregate
  * the exploded arrays (the k smallest of a union are always within the
  * union of per-input k smallest, so merging sketches IS the union
  * sketch — exact, not approximate).
  *
  * Determinism: the result is the k smallest distinct values of a set —
  * order- and partitioning-independent, so the DuckDB oracle reproduces it
  * with a sorted-distinct row-number filter.
  */
case class KmvKmin(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  /** k as a Long, or null/None markers for the type check — the Int
    * truncation happens ONLY after the range check below, so a
    * BIGINT-range literal (e.g. 2³² + 64, which `intValue()` would
    * silently wrap to 64) is rejected at ANALYSIS time, not mis-sketched
    * at runtime. */
  private def kValue: Option[Long] = kExpr.eval() match {
    case i: java.lang.Integer => Some(i.longValue())
    case l: java.lang.Long => Some(l.longValue())
    case _ => None
  }

  private lazy val k: Int = kValue match {
    case Some(l) if l >= 1L && l <= Int.MaxValue.toLong => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_kmv_kmin: k must be a foldable integer in [1, 2^31), got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (LongType, IntegerType | LongType) if kExpr.foldable =>
        kValue match {
          case Some(l) if l >= 1L && l <= Int.MaxValue.toLong =>
            TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            "graft_kmv_kmin: k must be in [1, 2^31)")
        }
      case (c, kk) => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_kmin expects (long, foldable int), got ($c, $kk)")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // Cheap reject before the tree insert: a value past the current kth
    // minimum can never enter a full sketch.
    if (buf.size < k || v < buf.last()) {
      buf.add(v)
      if (buf.size > k) buf.remove(buf.last())
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKmin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKmin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvKmin =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "graft_kmv_kmin"
}
