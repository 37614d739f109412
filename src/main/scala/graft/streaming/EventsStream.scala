package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingest of the `events` table (SURVEY.md §7.1
  * step 8 — post-parity extension; the reference has no streaming
  * surface, §2.10).
  *
  * Batch and stream share the same transform functions (the DataFrame
  * programs are identical — only the source differs), so the batch
  * oracle queries double as correctness checks for the streaming path.
  *
  * Scale posture: watermarked windows keep state bounded (late rows
  * beyond the watermark are dropped, state for closed windows is
  * evicted); sessionization state is one small case class per active
  * user, timed out by event-time. Both scale horizontally on the
  * groupBy keys.
  */
object EventsStream {

  case class Event(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                   value: Double)

  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     n_events: Long, total_value: Double)

  // public: Spark's codegen must construct/inspect it from generated
  // code. start/lastSeen are event-time MICROSECONDS (the precision the
  // µs-derived `ts` column actually carries — ms arithmetic would
  // diverge from `sessionWindows`/the q32 oracle at sub-ms gaps).
  case class SessionState(start: Long, lastSeen: Long, n: Long,
                          total: Double)

  /** Event-time µs of a timestamp (getTime alone floors to ms). */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def tsOfMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** File-source streaming read of a DIRECTORY of events parquet files
    * (the standard streaming-ingest layout — new files appear, the
    * source picks them up per micro-batch), deriving the µs `ts` from
    * deriving `ts_ns` the same way as [[graft.Tables.events]]. */
  def readEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    // static schema: a streaming source must be definable before the
    // first ingest file lands, so nothing is inferred from the dir
    // (see [[graft.Tables.eventsRawSchema]])
    graft.Tables.deriveEventTime(
      spark.readStream
        .schema(graft.Tables.eventsRawSchema)
        .parquet(eventsDir))
  }

  /** Tumbling-window aggregate with watermark; identical transform
    * works on batch input (spec asserts equality). */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 minute",
                     watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("w_start"), col("user_id"),
        col("n_events"), col("total_value"))

  /** Sliding-window aggregate (overlapping windows). */
  def slidingCounts(events: DataFrame, windowLen: String = "2 minutes",
                    slide: String = "1 minute",
                    watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("user_id"),
        col("n_events"))

  /** Session-window aggregation with Spark's native `session_window`
    * (merges events whose gap to the current session end is < gap) —
    * the same transform serves streaming and batch input; the batch
    * form is the q32 oracle query (DuckDB: lag/cumsum sessionization,
    * new session when the gap is >= the timeout — the complement of
    * Spark's `< gap` merge rule, so the session sets are identical). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermark) // no-op on batch input
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sv"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), round(col("sv"), 4).as("total_value"))

  /** Stream-stream INTERVAL join: for each event, the events of the
    * same user in the following minute. Both sides are watermarked and
    * the time-range predicate is on the event-time columns, so Spark
    * derives state-eviction bounds for both join buffers (state holds
    * only watermark+range — bounded at any throughput). The same
    * transform on two batch frames is the batch interval join the
    * oracle runs (µs arithmetic on both engines). */
  def followJoin(left: DataFrame, right: DataFrame,
                 watermark: String = "2 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("a_id"), col("user_id"),
        col("ts").as("a_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("b_id"),
        col("user_id").as("r_user_id"), col("ts").as("b_ts"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 1 MINUTE"))
      .select(col("user_id"), col("a_id"), col("b_id"))
  }

  /** Streaming exact dedup: watermarked `dropDuplicates` on
    * (user_id, minute) — the stateful streaming counterpart of
    * [[graft.ops.Dedup.exact]]. The truncated event-time column is part
    * of the dedup key, so state for minutes behind the watermark is
    * evicted — bounded state at any throughput. The same transform on
    * batch input degenerates to a distinct (the batch oracle). Output
    * is only the key set, so which duplicate arrived first doesn't
    * affect the result. The default watermark keeps a 10-minute
    * lateness allowance: a "0 seconds" watermark equals the max event
    * time seen, so any out-of-order KEY arriving in a later micro-batch
    * would be silently dropped as late — not deduplicated, lost. */
  def dedupKeys(events: DataFrame,
                watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("minute", date_trunc("minute", col("ts")))
      .withWatermark("minute", watermark)
      .dropDuplicates("user_id", "minute")
      .select(col("user_id"), unix_timestamp(col("minute")).as("min_sec"))

  /** Event-time sessionization via flatMapGroupsWithState: a session
    * closes after `gapSeconds` of inactivity (state timeout), emitting
    * one row per closed session.
    *
    * Merge rule is the canonical strict `< gap` (same as
    * [[sessionWindows]] and the q32 oracle: two events exactly
    * `gapSeconds` apart are separate sessions), evaluated in event-time
    * MICROSECONDS to match the µs-derived `ts` column. Each batch runs
    * a full interval merge over {batch events} ∪ {open session}: events
    * within the gap on either side of the open session extend it (start
    * may move earlier, lastSeen never regresses), and late events that
    * belong to an older timeline sessionize among THEMSELVES (a late
    * chain forms one session, not one per event) before being emitted.
    * The single-session-per-key state means an already-emitted older
    * session can never be reopened — the inherent approximation of this
    * shape. Concretely: a non-newest merged group is emitted at batch
    * end even when the watermark has not yet passed its lastSeen+gap,
    * so a still-admissible later event that would have bridged into it
    * starts a fresh session instead (holding it back would need
    * multi-session state). [[sessionWindows]] is the exact
    * multi-session form and the oracle-checked q32 path. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 30)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, tsOfMicros(s.start), s.n,
              s.total))
          } else {
            // interval merge: singleton intervals for the batch events
            // plus the open session, sorted by start; adjacent items
            // merge when the gap between them is < gapUs
            val items = (rows.map(e =>
                SessionState(micros(e.ts), micros(e.ts), 1, e.value))
              ++ state.getOption.iterator).toArray
              .sortBy(s => (s.start, s.lastSeen))
            var merged = List.empty[SessionState] // newest-first
            for (s <- items) merged = merged match {
              case h :: t if s.start < h.lastSeen + gapUs =>
                SessionState(h.start, math.max(h.lastSeen, s.lastSeen),
                  h.n + s.n, h.total + s.total) :: t
              case other => s :: other
            }
            // everything but the newest group is a closed session
            merged.headOption.foreach { open =>
              state.update(open)
              // ceil µs→ms so the event-time timeout never fires early
              state.setTimeoutTimestamp(
                Math.floorDiv(open.lastSeen + gapUs + 999L, 1000L))
            }
            merged.drop(1).reverseIterator.map(s =>
              Session(userId, tsOfMicros(s.start), s.n, s.total))
          }
      }
  }
}
