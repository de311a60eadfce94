package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact per-group top-k WITHOUT a sort shuffle (the
  * `TypedImperativeAggregate`-style candidate from SURVEY.md §7.3, as a
  * public-API `Aggregator`).
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy(v
  * desc)) <= k`, q14) shuffles EVERY row to its group's partition and
  * sorts it. This aggregate keeps a k-bounded buffer per group, so the
  * map side reduces each partition to ≤k rows per group before the
  * exchange — at 100 TB the shuffle carries O(groups × k), not O(rows).
  * Same trick as Spark's own TakeOrderedAndProject, generalized from
  * "one global group" to group-by.
  *
  * Buffer/output are parallel (values, keys) arrays sorted by value
  * desc with key-asc tiebreak (deterministic for oracle parity).
  *
  * DEPLOYMENT REQUIREMENT (measured, PERF_NOTES R10.5): the map-side
  * combine above only happens while `ObjectHashAggregateExec` stays in
  * hash mode. Its sort-based fallback triggers at
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * DISTINCT KEYS PER PARTITION (default 128 — sized for unbounded
  * buffers like collect_list, not for a k-bounded heap), and once
  * fallen back EVERY remaining input row is written to the external
  * sorter as its own (key, single-row buffer) pair: the partial
  * aggregation degrades from O(groups × k) state to an O(rows) disk
  * sort. At the sf1 fixture this turned q400's 400 M-row exact-kNN
  * cross product into >80 GB of spill (disk-full abort); with the
  * threshold raised above the per-partition group count the same
  * query completes in seconds. Size it to
  * `expected groups per partition × ~300 B` of executor memory —
  * graft's harnesses (Bench/Verify/RunOne) set 1,048,576 (~300 MB
  * worst case, far above any manifest query's group count).
  */
case class TopKIn(v: Double, key: Long)
case class TopKBuf(vs: Array[Double], ks: Array[Long])

class TopKAgg(k: Int) extends Aggregator[TopKIn, TopKBuf, TopKBuf] {
  require(k > 0)

  def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  // insertion keeps arrays sorted (v desc, key asc); O(k) per row
  def reduce(b: TopKBuf, x: TopKIn): TopKBuf = {
    val n = b.vs.length
    if (n == k && (x.v < b.vs(n - 1) ||
      (x.v == b.vs(n - 1) && x.key > b.ks(n - 1)))) return b
    var i = 0
    while (i < n && (b.vs(i) > x.v || (b.vs(i) == x.v && b.ks(i) < x.key))) i += 1
    val m = math.min(n + 1, k)
    val vs = new Array[Double](m); val ks = new Array[Long](m)
    System.arraycopy(b.vs, 0, vs, 0, i)
    System.arraycopy(b.ks, 0, ks, 0, i)
    vs(i) = x.v; ks(i) = x.key
    val tail = m - i - 1
    if (tail > 0) {
      System.arraycopy(b.vs, i, vs, i + 1, tail)
      System.arraycopy(b.ks, i, ks, i + 1, tail)
    }
    TopKBuf(vs, ks)
  }

  def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var r = a
    var i = 0
    while (i < b.vs.length) { r = reduce(r, TopKIn(b.vs(i), b.ks(i))); i += 1 }
    r
  }

  def finish(b: TopKBuf): TopKBuf = b
  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKAgg {
  /** top_k(valueCol, keyCol): struct(vs array, ks array) of the k
    * largest values (+ their keys) in the group.
    */
  def topK(k: Int)(value: Column, key: Column): Column =
    udaf(new TopKAgg(k), Encoders.product[TopKIn]).apply(value, key)
}
