package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter sketch as a typed `Aggregator`: a k-counter
  * summary whose candidate set PROVABLY contains every item with
  * frequency > N/(k+1), in O(k) memory per partial buffer — the
  * first pass of scalable heavy-hitter mining. The candidate set may
  * contain false positives and its counts are underestimates, so
  * callers re-count the ≤k candidates exactly in a second cheap pass
  * (see `CurationOps.heavyHitters`): sketch pass O(rows) with k-bounded
  * buffers, recount pass a broadcast-semi-join + hash agg over only
  * candidate rows. No full-cardinality groupBy ever runs — at 100 TB
  * a token-level groupBy's shuffle carries the whole vocabulary; this
  * carries ≤ k counters per map task.
  *
  * The parallel (items, counts) arrays stay sorted by item so merges
  * are linear; merge is the standard pairwise MG combine (sum matching
  * counters, then subtract the (k+1)-th largest count and drop
  * non-positive) which preserves the frequency guarantee
  * (Agarwal et al., "Mergeable Summaries", PODS'12).
  */
case class MgBuf(items: Array[String], counts: Array[Long])

class MisraGries(k: Int) extends Aggregator[String, MgBuf, MgBuf] {
  require(k > 0)

  def zero: MgBuf = MgBuf(Array.empty, Array.empty)

  private def decrementOverflow(items: Array[String],
                                counts: Array[Long]): MgBuf = {
    if (items.length <= k) return MgBuf(items, counts)
    // subtract the (k+1)-th largest count from all, keep positives
    val sorted = counts.clone().sorted
    val dec = sorted(sorted.length - (k + 1))
    val keep = counts.zipWithIndex.filter { case (c, _) => c - dec > 0 }
    MgBuf(keep.map { case (_, i) => items(i) },
      keep.map { case (c, _) => c - dec })
  }

  def reduce(b: MgBuf, x: String): MgBuf = {
    if (x == null) return b
    val i = java.util.Arrays.binarySearch(b.items.asInstanceOf[Array[AnyRef]],
      x.asInstanceOf[AnyRef])
    if (i >= 0) { b.counts(i) += 1; b }
    else {
      val at = -i - 1
      val items = new Array[String](b.items.length + 1)
      val counts = new Array[Long](b.counts.length + 1)
      System.arraycopy(b.items, 0, items, 0, at)
      System.arraycopy(b.counts, 0, counts, 0, at)
      items(at) = x; counts(at) = 1L
      System.arraycopy(b.items, at, items, at + 1, b.items.length - at)
      System.arraycopy(b.counts, at, counts, at + 1, b.counts.length - at)
      decrementOverflow(items, counts)
    }
  }

  def merge(a: MgBuf, b: MgBuf): MgBuf = {
    // linear merge of two item-sorted summaries
    val items = Array.newBuilder[String]
    val counts = Array.newBuilder[Long]
    var i = 0; var j = 0
    while (i < a.items.length || j < b.items.length) {
      val cmp =
        if (i == a.items.length) 1
        else if (j == b.items.length) -1
        else a.items(i).compareTo(b.items(j))
      if (cmp < 0) { items += a.items(i); counts += a.counts(i); i += 1 }
      else if (cmp > 0) { items += b.items(j); counts += b.counts(j); j += 1 }
      else {
        items += a.items(i); counts += a.counts(i) + b.counts(j)
        i += 1; j += 1
      }
    }
    decrementOverflow(items.result(), counts.result())
  }

  def finish(b: MgBuf): MgBuf = b
  def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
}

object MisraGries {
  /** mg_sketch(col): struct(items, counts) candidate summary. */
  def sketch(k: Int)(c: Column): Column = udaf(new MisraGries(k)).apply(c)
}
