package graft.functions

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** CountMin sketch invariants: the CMS guarantees (no underestimate;
  * ε-bounded overestimate), algebraic mergeability (partition-count
  * invariance), and the probe-hash twin contract (JVM hash ==
  * TextOps.hash32 native expression, so SQL probes address the
  * counters the Aggregator incremented).
  */
class CountMinSpec extends SparkSpec {
  private val d = 4
  private val w = 16 // small width so collisions actually happen

  private def fixture = {
    import spark.implicits._
    // zipf-ish: item i appears (40 - i) times, 40 distinct items > w
    (0 until 40).flatMap(i => Seq.fill(40 - i)(s"item$i")).toDF("x")
  }

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(CountMin.sketch(d, w)(col("x")).as("s"))
      .select(col("s.counts")).head().getSeq[Long](0).toArray

  test("estimates never underestimate and respect the eps bound") {
    val counts = sketchOf(fixture)
    val exact = fixture.groupBy("x").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val eps = math.E / w
    exact.foreach { case (item, c) =>
      val est = (0 until d).map { j =>
        counts(j * w + (CountMin.probeHash(item, s"cms$j:") % w).toInt)
      }.min
      assert(est >= c, s"$item: est $est < exact $c")
      assert(est <= c + math.ceil(eps * n).toLong,
        s"$item: est $est breaks the eps bound over $c")
    }
  }

  test("merge is partition-order invariant (algebraic)") {
    val one = sketchOf(fixture.coalesce(1))
    val eight = sketchOf(fixture.repartition(8))
    assert(one.sameElements(eight))
    assert(one.sum == d.toLong * fixture.count())
  }

  test("probeHash is the bit-identical twin of TextOps.hash32") {
    import spark.implicits._
    val items = Seq("click", "purchase", "", "unicode-é中")
    val native = items.toDF("x")
      .select(TextOps.hash32(col("x"), seed = "cms2:").as("h"))
      .collect().map(_.getLong(0))
    val jvm = items.map(CountMin.probeHash(_, "cms2:"))
    assert(native.toSeq == jvm)
  }
}
