package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass MD5-token hashing used by MinhashSigs / SimhashExpr.
  *
  * Why this exists (PERF_NOTES.md §2/§5): the HOF formulation
  * (`transform(tokens, t -> md5(...))` sliced by `conv(substring(...))`
  * under `array_min` / vote aggregates) is CodegenFallback — every
  * lambda dispatch is interpreted, the hex digest is materialized as a
  * string and re-parsed, and no common-subexpression elimination exists
  * across HOFs. Here each token is digested once per hash group
  * directly on bytes (same md5("g:"+token) semantics, so the DuckDB
  * oracle still reproduces results bit-for-bit), and the loop runs as
  * one static-call-per-row inside WholeStageCodegen.
  *
  * Called from generated code via Scala's static forwarders.
  */
object HashSigUtil {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def u32(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
      ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)

  /** MinHash signature: value i (= 4g+j) is min over tokens of the j-th
    * 32-bit big-endian slice of md5("g:" + token) — byte-identical to
    * `conv(substring(md5(concat('g:', t)), 8j+1, 8), 16, 10)`.
    * Null/absent tokens are skipped; no contributing token → all-null
    * signature (array_min-of-empty semantics).
    */
  def minhash(tokens: ArrayData, nHashes: Int): ArrayData = {
    val groups = nHashes / 4
    val mins = Array.fill(nHashes)(Long.MaxValue)
    var any = false
    val md = mdLocal.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        any = true
        val tb = t.getBytes
        var g = 0
        while (g < groups) {
          md.reset()
          md.update(s"$g:".getBytes)
          md.update(tb)
          val d = md.digest()
          var j = 0
          while (j < 4) {
            val v = u32(d, 4 * j)
            val idx = 4 * g + j
            if (v < mins(idx)) mins(idx) = v
            j += 1
          }
          g += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](nHashes)(null))
    else new GenericArrayData(mins)
  }

  /** SimHash: bit j of the result is set iff Σ_tokens (±1 by bit j of
    * hash32(token)) is positive, hash32 = first 32 bits of md5(token)
    * (byte-identical to TextOps.hash32 / the DuckDB oracle).
    */
  def simhash(tokens: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val md = mdLocal.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        md.reset()
        val h = u32(md.digest(t.getBytes), 0)
        var j = 0
        while (j < bits) {
          votes(j) += (((h >>> j) & 1L).toInt * 2) - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}

/** minhash_sigs(tokens, n) → array<long> of n MinHash values. */
@ExpressionDescription(
  usage = "_FUNC_(tokens, n) - n-value MinHash signature of a token array.")
case class MinhashSigs(child: Expression, nHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if nHashes > 0 && nHashes % 4 == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        "minhash_sigs n must be a positive multiple of 4 (md5 slices)")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any =
    HashSigUtil.minhash(input.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashSigUtil.minhash($c, $nHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

/** simhash(tokens, bits) → long SimHash of a token array. */
@ExpressionDescription(
  usage = "_FUNC_(tokens, bits) - SimHash (bit-vote LSH signature) of a token array.")
case class SimhashExpr(child: Expression, bits: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits > 0 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("simhash bits must be in [1, 64]")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    HashSigUtil.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashSigUtil.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}
