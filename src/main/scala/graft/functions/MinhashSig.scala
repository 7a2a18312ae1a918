package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_minhash_sig(tokens, n, k)` — the k-function MinHash signature of
  * the word n-gram shingle set of `tokens`, as `array<long>`.
  *
  * The hash family is cross-engine reproducible (the property the xxhash64
  * family it replaces lacks): per shingle, `d = md5(shingle)` and the two
  * 28-bit values `h1 = d[hex 1..7]`, `h2 = d[hex 8..14]`; hash function j
  * is the double-hash `(h1 + j·h2) mod 2^28` (Kirsch–Mitzenmacher), so ONE
  * md5 per shingle serves all k functions. DuckDB computes the identical
  * family from `substr(md5(s), ...)` hex substrings — see the q_dedup_minhash
  * oracle in [[graft.llm.Dedup.oracles]]. 28-bit range keeps
  * `h1 + 31·h2 < 2^33` overflow-free in both engines' BIGINT arithmetic.
  *
  * Like [[ShingleHashes]] this is one tight codegen'd loop per row: the
  * shingle string is assembled once, digested once (thread-local
  * MessageDigest — `mapPartitions`-style amortization inside an
  * expression), and never leaves the row. Fewer than n tokens → empty
  * array (caller filters, matching TextStats.shingles semantics).
  */
case class MinhashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects (array<string>, int, int), got ($a, $b, $c)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(toks: Any, n: Any, k: Any): Any =
    MinhashSig.compute(toks.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n, k) =>
      s"${ev.value} = graft.functions.MinhashSig.compute($toks, $n, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinhashSig =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_minhash_sig"
}

object MinhashSig {
  private val SEP = UTF8String.fromString(" ")
  private val MOD = 1L << 28

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(toks: ArrayData, n: Int, k: Int): ArrayData = {
    if (n <= 0 || k <= 0 || toks.numElements() < n)
      return new GenericArrayData(Array.empty[Long])
    val m = toks.numElements()
    val md = digests.get()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      md.reset()
      val d = md.digest(UTF8String.concatWs(SEP, parts: _*).getBytes)
      // First 28 bits (hex chars 1-7) and next 28 (hex chars 8-14),
      // big-endian — identical to DuckDB's substr(md5(s), 1, 7) / (8, 7).
      val h1 = ((d(0) & 0xFFL) << 20) | ((d(1) & 0xFFL) << 12) |
        ((d(2) & 0xFFL) << 4) | ((d(3) & 0xFFL) >>> 4)
      val h2 = ((d(3) & 0xFL) << 24) | ((d(4) & 0xFFL) << 16) |
        ((d(5) & 0xFFL) << 8) | (d(6) & 0xFFL)
      var f = 0
      var v = h1
      while (f < k) {
        val hv = v % MOD
        if (hv < sig(f)) sig(f) = hv
        v += h2 // (h1 + f·h2) built incrementally; < 2^33 for k ≤ 32
        f += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
