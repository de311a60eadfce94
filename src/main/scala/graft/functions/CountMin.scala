package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch as a typed `Aggregator` (Cormode & Muthukrishnan
  * 2005): d×w counters; each item increments one counter per row
  * (md5-derived hash, seed per row), the point estimate is the MINIMUM
  * across rows — never an underestimate, over by at most ε·N with
  * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The buffer is a fixed
  * d·w Long array, so partials are constant-size and merge by
  * elementwise addition (fully algebraic — map-side combinable, and
  * the partition-order-free proof is that addition commutes;
  * CountMinSpec asserts repartition invariance). Complements
  * [[MisraGries]]: MG tracks WHICH items are heavy in O(k) memory;
  * CMS answers point frequency queries for ANY item in O(d·w), no
  * candidate set needed, and unions across shards/days by addition —
  * the sketch a streaming rollup keeps per window.
  *
  * Hashes are h_j(x) = hash32("cms{j}:" + x) mod w where hash32 is the
  * engine-wide md5-prefix hash ([[graft.ops.TextOps.hash32]]), so a
  * probe written as native SQL expressions addresses EXACTLY the
  * counters this Aggregator incremented — [[CountMin.probeHash]] is
  * the bit-identical JVM twin used inside the buffer update.
  */
case class CmsBuf(counts: Array[Long])

class CountMin(d: Int, w: Int) extends Aggregator[String, CmsBuf, CmsBuf] {
  require(d > 0 && w > 0)

  def zero: CmsBuf = CmsBuf(new Array[Long](d * w))

  def reduce(b: CmsBuf, x: String): CmsBuf = {
    if (x == null) return b
    var j = 0
    while (j < d) {
      b.counts(j * w + (CountMin.probeHash(x, s"cms$j:") % w).toInt) += 1L
      j += 1
    }
    b
  }

  def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    val out = new Array[Long](d * w)
    var i = 0
    while (i < out.length) { out(i) = a.counts(i) + b.counts(i); i += 1 }
    CmsBuf(out)
  }

  def finish(b: CmsBuf): CmsBuf = b
  def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
}

object CountMin {
  /** cms_sketch(col): struct(counts) with d·w flattened counters. */
  def sketch(d: Int, w: Int)(c: Column): Column =
    udaf(new CountMin(d, w)).apply(c)

  /** JVM twin of `TextOps.hash32(col, seed)` — first 8 hex chars of
    * md5(seed + s) parsed base-16; always in [0, 2³²).
    */
  def probeHash(s: String, seed: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((seed + s).getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }
}
