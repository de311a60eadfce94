package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.11 D3): geometric mean as an
  * `Aggregator[IN, BUF, OUT]` — the idiomatic Spark custom aggregate
  * (replaces the deprecated UserDefinedAggregateFunction).
  *
  * Buffer is (Σ ln x, n); merge is associative+commutative so Spark
  * runs it as partial aggregation (map-side combine) before the
  * shuffle — the same two-phase plan a built-in DeclarativeAggregate
  * gets, just with serialized buffers. Non-positive inputs are
  * ignored (geometric mean is undefined for them) rather than
  * poisoning the whole group with NaN.
  */
class GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0.0) (b._1 + math.log(x), b._2 + 1L) else b
  def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
  def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object GeometricMean {
  /** Column function: geometric_mean(x) usable in .agg(...). */
  def geometricMean(c: Column): Column = udaf(new GeometricMean).apply(c)
}
