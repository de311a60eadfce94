package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches latest right row at or before each left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:05:00")),
      (2L, 10L, ts("2024-01-01 00:20:00")),
      (3L, 10L, ts("2024-01-01 00:00:30")), // before any right row
      (4L, 20L, ts("2024-01-01 01:00:00")))
      .toDF("id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:01:00"), 100L, 1.5),
      (10L, ts("2024-01-01 00:10:00"), 101L, 2.5),
      (10L, ts("2024-01-01 00:20:00"), 102L, 3.5), // exact tie with id=2
      (20L, ts("2024-01-01 00:30:00"), 200L, 9.0))
      .toDF("user_id", "ts", "rid", "v")

    val out = EventOps.asofJoin(left, right, "user_id", "ts", Seq("rid", "v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        Option(r.get(r.fieldIndex("asof_rid"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("asof_v"))).map(_.asInstanceOf[Double])))

    assert(out(0) == ((1L, Some(100L), Some(1.5))))  // latest <= 00:05
    assert(out(1) == ((2L, Some(102L), Some(3.5))))  // inclusive tie
    assert(out(2) == ((3L, None, None)))             // no prior right row
    assert(out(3) == ((4L, Some(200L), Some(9.0))))
  }

  test("asofJoin matches the naive max-per-row formulation on random data") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, new Timestamp(rnd.nextInt(86400) * 1000L))
    }.toDF("id", "user_id", "ts")
    // right ts unique per construction: an as-of pick among right rows
    // tied on (key, ts) is ill-defined in any formulation
    val right = (1 to 200).map { i =>
      (rnd.nextInt(5).toLong, new Timestamp(i * 431000L), i.toLong)
    }.toDF("user_id", "ts", "rid")

    val got = EventOps.asofJoin(left, right, "user_id", "ts", Seq("rid"))
      .filter(col("asof_rid").isNotNull)
      .select(col("id"), col("asof_rid"))
      .as[(Long, Long)].collect().toSet

    val l = left.as("l"); val r = right.as("r")
    val want = l.join(r, col("l.user_id") === col("r.user_id") &&
        col("r.ts") <= col("l.ts"))
      .groupBy(col("l.id"))
      .agg(max_by(col("r.rid"), col("r.ts")).as("rid"))
      .as[(Long, Long)].collect().toSet

    assert(got == want)
  }

  test("asofJoin takes ALL attach values from the latest right row, " +
    "even when some of its attach columns are NULL") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:30:00")))
      .toDF("id", "user_id", "ts")
    // latest right row has v = NULL: a per-column carry would keep rid
    // from the latest row but v from the OLDER row — true as-of
    // semantics (and DuckDB ASOF) attach (101, NULL).
    val right = Seq(
      (10L, ts("2024-01-01 00:01:00"), Some(100L), Some(1.5)),
      (10L, ts("2024-01-01 00:10:00"), Some(101L), None: Option[Double]))
      .toDF("user_id", "ts", "rid", "v")

    val out = EventOps.asofJoin(left, right, "user_id", "ts", Seq("rid", "v"))
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("asof_rid") == 101L)
    assert(r.isNullAt(r.fieldIndex("asof_v")))
  }

  test("asofJoin keeps every left row exactly once") {
    val left = (1 to 100).map(i => (i.toLong, (i % 5).toLong,
      ts(f"2024-01-01 00:${i % 60}%02d:00"))).toDF("id", "user_id", "ts")
    val right = Seq((0L, ts("2024-01-01 00:00:00"), 1L, 1.0))
      .toDF("user_id", "ts", "rid", "v")
    val out = EventOps.asofJoin(left, right, "user_id", "ts", Seq("rid", "v"))
    assert(out.count() == 100)
    assert(out.select("id").distinct().count() == 100)
  }
}
