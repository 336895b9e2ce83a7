package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over an `events`-shaped stream
  * (ts TIMESTAMP, event_type STRING, user_id LONG, value DOUBLE) — the
  * capability layer SURVEY.md §2.6 marks absent in the reference: watermarks,
  * tumbling/sliding/session windows, late-data drop, arbitrary state.
  *
  * Each transform takes and returns a (streaming) DataFrame so the same code
  * path is testable with MemoryStream and runnable against readStream
  * sources. Batch equivalents in graft.operators.Events share the window
  * semantics, which is how the DuckDB oracle covers this module.
  */
object EventStreams {

  /** Tumbling 1-hour counts per event type; late data beyond the watermark
    * is dropped (state is bounded — mandatory for an unbounded stream).
    */
  def hourlyCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("total"))

  /** Sliding 1-hour/30-minute windowed counts with watermark. */
  def slidingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  /** Session windows per user, 10-minute inactivity gap (dynamic-length
    * windows, merged by Spark's session-window state store).
    */
  def userSessions(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n"), col("total"))

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Arbitrary stateful processing — running per-user totals via
    * `mapGroupsWithState` (the §2.6 "custom state" capability;
    * KeyValueGroupedDataset state machine, update-mode output).
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          it.foreach { e => n += 1; total += e.value }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
  }

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n: Long, total: Double)
  final case class SessionAgg(start: Long, end: Long, n: Long, total: Double)

  /** Sessionization as an explicit state machine with EVENT-TIME TIMEOUT —
    * `flatMapGroupsWithState` in Append mode: a session closes (and is
    * emitted exactly once) either when a later in-batch event exceeds the
    * gap, or when the watermark passes `last event + gap` and the state
    * times out. This is the custom-state pattern `session_window` cannot
    * express (per-session bespoke merging/emission logic), with state
    * lifetime bounded by the timeout — nothing accumulates forever.
    */
  def sessionsWithTimeout(events: Dataset[TimedEvent], gapMinutes: Int = 10,
                          watermark: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TimedEvent], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.start, s.end, s.n, s.total))
          } else {
            val evs = it.toList.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            for (e <- evs) {
              val t = e.ts.getTime
              cur = cur match {
                case Some(c) if t <= c.end + gapMs =>
                  Some(SessionAgg(c.start, math.max(c.end, t), c.n + 1, c.total + e.value))
                case Some(c) =>
                  closed ::= SessionOut(uid, c.start, c.end, c.n, c.total)
                  Some(SessionAgg(t, t, 1L, e.value))
                case None =>
                  Some(SessionAgg(t, t, 1L, e.value))
              }
            }
            cur.foreach { c =>
              state.update(c)
              // a session whose horizon the watermark already passed times
              // out on the next trigger (timeout must exceed the watermark)
              state.setTimeoutTimestamp(
                math.max(c.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverse.iterator
          }
      }
  }

  /** Streaming exact deduplication — the training-data dedup operator in
    * its online form: `dropDuplicates` keyed on content identity with a
    * watermark bounding the dedup state (duplicates arriving within the
    * horizon are dropped; state for expired windows is evicted, which is
    * the only way dedup state stays finite on an unbounded stream).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Key-only streaming dedup with bounded state:
    * `dropDuplicatesWithinWatermark` deduplicates on the BUSINESS key
    * alone (no timestamp in the key — records with the same key but
    * different event times are still duplicates, which plain
    * `dropDuplicates(key)` can only do with unbounded state). State for a
    * key is evicted once the watermark passes its event time + delay, so
    * memory stays finite; the guarantee is exact dedup for duplicates
    * arriving within the watermark delay of each other.
    */
  def dedupKeysWithinWatermark(events: DataFrame, keyCols: Seq[String],
                               watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream inner join with event-time range condition — both sides
    * watermarked so join state is bounded (Spark buffers each side only
    * until the watermark passes the range bound): clicks matched to the
    * same user's purchases within the following hour.
    */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                          watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Stream-stream LEFT OUTER join with the same time-range condition:
    * unmatched clicks are held in state and emitted with NULL purchase
    * columns only once the watermark passes their join window (before
    * that, a match could still arrive) — the abandoned-session shape:
    * clicks that never converted within the hour. State stays bounded by
    * the same watermark eviction as the inner form; the NULL-side rows are
    * emitted exactly once, on watermark advance.
    */
  def clickToPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame,
                              watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  /** Stream-static enrichment: each micro-batch broadcast-joins the static
    * dimension frame — stateless (nothing buffers across batches), the
    * standard dimension-enrichment topology. At cluster scale the dim side
    * is broadcast once per batch and the stream never shuffles.
    */
  def enrichWithDims(events: DataFrame, dims: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dims), Seq(key), "left")

  /** Output-mode contract for each transform above (windowed aggs complete/
    * update/append-with-watermark; stateful map is update).
    */
  val outputModes: Map[String, OutputMode] = Map(
    "hourlyCounts" -> OutputMode.Update(),
    "slidingCounts" -> OutputMode.Update(),
    "userSessions" -> OutputMode.Update(),
    "runningUserTotals" -> OutputMode.Update(),
    "sessionsWithTimeout" -> OutputMode.Append()
  )
}
