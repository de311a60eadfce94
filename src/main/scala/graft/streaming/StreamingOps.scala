package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming forms of the event operators (SURVEY.md §2.10).
  *
  * The reference is batch-only; these wrappers make the same aggregations
  * run on an unbounded source: `readStream → withWatermark → groupBy
  * (window) → writeStream`. The batch forms in `graft.ops.EventOps`
  * share the aggregation shape, so results agree when a bounded stream
  * is replayed.
  *
  * Scale notes: state size is bounded by the watermark — hour windows
  * older than the watermark are finalized and evicted; sessionization
  * state is one small SessionState per active (user) key with an
  * idle-timeout, so memory is O(active users), not O(events).
  */
object StreamingOps {

  /** Tumbling-hour windowed aggregation with late-data handling.
    * Append-mode compatible: windows emit once the watermark passes.
    */
  def hourlyAggStream(events: DataFrame,
                      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup (SURVEY §2.13 X1 streaming form): drop
    * repeated ids with state BOUNDED by the watermark —
    * `dropDuplicatesWithinWatermark` evicts seen-ids older than the
    * delay, so state is O(ids per watermark window), not O(all ids
    * ever) as with plain `dropDuplicates` on a stream. This is the
    * at-least-once→exactly-once repair step in front of any ingest
    * pipeline.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-static enrichment join: each micro-batch hash-joins against
    * the static dimension (broadcast when small — no shuffle of the
    * stream, no state store). The static side is re-read per batch if
    * its source supports it, so slowly-changing dims pick up updates.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Watermarked stream-stream inner join: each left event matches
    * right events of the same key whose timestamp falls in
    * [left.ts, left.ts + `withinSeconds`]. Both sides carry watermarks
    * and the join condition bounds event-time distance, so the state
    * store retains only `withinSeconds + watermark` of either stream —
    * the REQUIRED shape for unbounded joins (an unconstrained
    * stream-stream join would buffer both streams forever).
    * Output columns: key, left `ts`/cols prefixed l_, right prefixed r_.
    */
  /** Watermarked stream-stream interval join. `joinType` "inner" emits
    * matched pairs as they arrive; "leftOuter" additionally emits each
    * unmatched left row null-padded ONCE the watermark passes its join
    * window (l_ts + withinSeconds + delay) — the state store can then
    * prove no future match exists and evict, which is exactly why
    * outer stream joins REQUIRE the watermark + time-range condition:
    * without the bound, "no match yet" is never "no match ever" and
    * state grows without limit. Both sides' state stays
    * O(events inside the watermark horizon) at any scale.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         withinSeconds: Long,
                         watermarkDelay: String = "10 minutes",
                         joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col(key) +: left.columns.filterNot(_ == key)
        .map(c => col(c).as(s"l_$c")).toSeq: _*)
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col(key).as(s"__rk") +: right.columns.filterNot(_ == key)
        .map(c => col(c).as(s"r_$c")).toSeq: _*)
    l.join(r, col(key) === col("__rk") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"interval $withinSeconds seconds"),
        joinType)
      .drop("__rk")
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(sessionId: Long, nEvents: Long, value: Double,
                          lastTs: Long)

  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        session_value: Double)

  /** Stateful gap-based sessionization (§2.13 X6 streaming form): a
    * session closes after `gapMinutes` of EVENT-TIME silence — detected
    * either by a later event from the same user or by event-time state
    * timeout once the watermark passes lastTs + gap. Emits one row per
    * closed session; deterministic w.r.t. event time (no wall-clock
    * dependence). Input must carry a watermark on `ts` — `events` is
    * watermarked here.
    *
    * State: one SessionState per ACTIVE user, evicted on timeout — at
    * 100 TB/day the state store holds O(active users), not O(events).
    */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int,
                       watermarkDelay: String = "10 minutes")
  : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      if (state.hasTimedOut) {
        val s = state.get
        out ::= SessionOut(userId, s.sessionId, s.nEvents, s.value)
        state.remove()
      } else {
        var cur = state.getOption
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs <= gapMs =>
              cur = Some(s.copy(nEvents = s.nEvents + 1,
                value = s.value + e.value, lastTs = t))
            case Some(s) =>
              out ::= SessionOut(userId, s.sessionId, s.nEvents, s.value)
              cur = Some(SessionState(s.sessionId + 1, 1L, e.value, t))
            case None =>
              cur = Some(SessionState(1L, 1L, e.value, t))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastTs + gapMs)
        }
      }
      out.reverseIterator
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  case class UserValue(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Spark 4 `transformWithState` processor: per-user running
    * (count, Σvalue) in a `ValueState`, re-emitted on every
    * micro-batch that touches the key. The arbitrary-stateful-v2 API
    * (SPARK-40434): typed state handles with optional TTL, timers, and
    * a state store the engine snapshots/restores — the successor to
    * `flatMapGroupsWithState` used by `sessionizeStream`. State is one
    * 16-byte record per user key in RocksDB, so memory is O(users) off
    * heap, not O(events).
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserValue, UserTotals] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var st: ValueState[UserTotals] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UserValue],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserTotals] = {
      var n = 0L
      var t = 0.0
      if (st.exists()) { val p = st.get(); n = p.n_events; t = p.total_value }
      rows.foreach { r => n += 1; t += r.value }
      val cur = UserTotals(key, n, t)
      st.update(cur)
      Iterator.single(cur)
    }
  }

  case class UserTsValue(user_id: Long, ts: java.sql.Timestamp,
    value: Double)
  case class SessAcc(n_events: Long, total_value: Double,
    max_ts_ms: Long, timer_ms: Long)
  case class SessionFinal(user_id: Long, n_events: Long,
    total_value: Double)

  /** Spark 4 `transformWithState` with EVENT-TIME TIMERS (the timer
    * half of the arbitrary-stateful-v2 surface that q364's
    * TimeMode.None leaves out): per-user running (count, Σvalue, max
    * event time) in a `ValueState`, a timer re-armed at max-seen + gap
    * on every input (previous timer deleted first — the re-arm idiom),
    * and the session EMITTED AND EVICTED only from
    * `handleExpiredTimer`, i.e. only once the watermark proves the gap
    * elapsed. Append output therefore contains exactly the sessions
    * the watermark finalized — state for still-open sessions is never
    * emitted, and eviction is what keeps per-key state from
    * accumulating forever at 100 TB/day.
    */
  class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserTsValue, SessionFinal] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[SessAcc] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessAcc]("sess",
        org.apache.spark.sql.Encoders.product[SessAcc], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UserTsValue],
        tv: TimerValues): Iterator[SessionFinal] = {
      var n = 0L
      var t = 0.0
      var mx = Long.MinValue
      var prevTimer = -1L
      if (st.exists()) {
        val p = st.get()
        n = p.n_events; t = p.total_value; mx = p.max_ts_ms
        prevTimer = p.timer_ms
      }
      rows.foreach { r =>
        n += 1; t += r.value; mx = math.max(mx, r.ts.getTime)
      }
      if (prevTimer >= 0) getHandle.deleteTimer(prevTimer)
      val timer = mx + gapMs
      getHandle.registerTimer(timer)
      st.update(SessAcc(n, t, mx, timer))
      Iterator.empty // emission is timer-driven only
    }
    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionFinal] = {
      val p = st.get()
      st.clear()
      Iterator.single(SessionFinal(key, p.n_events, p.total_value))
    }
  }
}
