package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling and rolling-hash loops — the last two
  * interpreted lambda-HOF sites on the engine's text hot paths
  * (PERF_NOTES §2/§5/R3.2: a HOF is CodegenFallback, so its whole child
  * subtree evaluates interpreted AND its megamorphic eval call sites
  * pollute the JIT profile for every other query in the process).
  *
  * Both are byte-identical to their HOF formulations (specs cross-check)
  * and to the md5-based DuckDB oracle SQL.
  */
object TextExprUtil {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val SPACE = UTF8String.fromString(" ")

  /** Distinct word n-gram shingles, first-occurrence order — identical
    * to `array_distinct(transform(sequence(0, greatest(size-n, 0)),
    * i -> array_join(slice(toks, i+1, n), " ")))` including the
    * short-input edge (fewer than n tokens → ONE shingle of whatever is
    * there; empty input → [""], array_join-of-empty semantics). Null
    * tokens are skipped within a shingle like array_join skips them.
    */
  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    val size = toks.numElements()
    val last = math.max(size - n, 0) // inclusive upper index
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= last) {
      val hi = math.min(i + n, size)
      var parts = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
      var j = i
      while (j < hi) {
        val t = toks.getUTF8String(j)
        if (t != null) parts += t
        j += 1
      }
      seen.add(UTF8String.concatWs(SPACE, parts.toSeq: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Polynomial rolling hash over the token stream:
    * h ← (31·h + hash32(token)) mod 1e9+7, hash32 = first 32 bits of
    * md5(token) — identical to the `aggregate` fold over
    * `transform(toks, hash32)`. Null tokens contribute like the HOF's
    * null arithmetic would poison the fold — the corpus has none; we
    * skip them (array elements from split are never null).
    */
  def rollingHash(toks: ArrayData, modulus: Long): Long = {
    val md = mdLocal.get()
    val n = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        acc = (acc * 31 + h) % modulus
      }
      i += 1
    }
    acc
  }
}

/** word_shingles(tokens, n) → array<string> of distinct word n-grams. */
@ExpressionDescription(
  usage = "_FUNC_(tokens, n) - distinct word n-gram shingles of a token array.")
case class WordShinglesExpr(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("word_shingles n must be positive")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextExprUtil.wordShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprUtil.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

/** rolling_hash(tokens) → long order-sensitive document fingerprint. */
@ExpressionDescription(
  usage = "_FUNC_(tokens) - polynomial rolling hash of a token array.")
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TextExprUtil.rollingHash(input.asInstanceOf[ArrayData], 1000000007L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprUtil.rollingHash($c, 1000000007L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}
