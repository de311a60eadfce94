package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {
  import StreamingOps._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyAggStream aggregates a replayed bounded stream like batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:55:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 11:10:00"), 2, "view", 4.0))
    val q = hourlyAggStream(input.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .orderBy("hour", "event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_events") == 2)
      assert(rows(0).getAs[Double]("total_value") == 3.0)
      assert(rows(1).getAs[String]("event_type") == "view")
    } finally q.stop()
  }

  test("dedupStream drops repeated ids with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(1, ts("2024-01-01 10:00:30"), 1, "click", 1.0), // dup id
      Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0))
    val q = dedupStream(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("enrichStream joins each micro-batch against a static dim") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "bronze"), (2L, "gold")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 3, "view", 2.0)) // no dim row
    val q = enrichStream(input.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .select($"event_id", $"tier").as[(Long, Option[String])]
        .collect().toMap
      assert(rows == Map(1L -> Some("bronze"), 2L -> None))
    } finally q.stop()
  }

  test("intervalJoinStream matches clicks within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    views.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0))
    clicks.addData(
      Event(10, ts("2024-01-01 10:02:00"), 1, "click", 1.0), // within 5 min
      Event(11, ts("2024-01-01 10:09:00"), 1, "click", 2.0), // outside
      Event(12, ts("2024-01-01 10:01:00"), 2, "click", 3.0)) // other user
    val joined = intervalJoinStream(
      views.toDF().select($"user_id", $"ts", $"event_id"),
      clicks.toDF().select($"user_id", $"ts", $"event_id"),
      "user_id", withinSeconds = 300)
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ssj_out")
        .select($"l_event_id", $"r_event_id").as[(Long, Long)].collect()
      assert(rows.toSeq == Seq((1L, 10L)))
    } finally q.stop()
  }

  test("sessionizeStream closes sessions on gap and matches batch stats") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2024-01-01 00:00:00"), 1, "a", 2.0),
      Event(2, ts("2024-01-01 00:10:00"), 1, "a", 3.0),
      // > 30 min gap → session 1 closes with 2 events / 5.0
      Event(3, ts("2024-01-01 02:00:00"), 1, "a", 7.0))
    val q = sessionizeStream(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess_out").orderBy("session_id").collect()
      // session 2 is still open (no timeout fired); session 1 must be out
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[Long]("session_id") == 1L)
      assert(r.getAs[Long]("n_events") == 2L)
      assert(r.getAs[Double]("session_value") == 5.0)
    } finally q.stop()
  }
}
