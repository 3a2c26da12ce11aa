package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Custom streaming state via flatMapGroupsWithState (north-star
  * extension — the reference is batch-only, file-existence stage caching
  * at app/main.py:110-177): per-user
  * sessionization with a 24h idle gap — the stateful-processing shape the
  * batch plan q71 expresses with window functions
  * (operators.Events.q71Sessionize). StreamingSpec asserts the two agree
  * on (n_sessions, n_events) per user.
  *
  * State is one (lastTs, openSessionStart, counts) record per user —
  * O(users), not O(events) — and bounded by an EVENT-TIME TIMEOUT: each
  * update arms a timeout at lastTs + gap, so when the watermark passes a
  * user's idle horizon their state is emitted once more (the "session
  * closed" record) and REMOVED. On an unbounded 100 TB stream the state
  * store therefore holds only *active* users, not every user ever seen —
  * the property the batch window-function form cannot have.
  */
object Sessionizer {

  /** `ts` carries the watermarked TimestampType column through to the
    * stateful operator (the analyzer requires it in the child output for
    * event-time timeouts); `ts_us` is the same instant in microseconds
    * for exact integer gap math. */
  case class Ev(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  case class SessState(lastTs: Long, nSessions: Int, nEvents: Long)
  case class UserSessions(user_id: Long, n_sessions: Int, n_events: Long)

  private val GapS: Long = 86400L // 24h idle gap, in whole seconds

  /** Gap test in *truncated seconds*, exactly like the batch plan: q71
    * compares `unix_timestamp(ts) - unix_timestamp(prev) > 86400`, and
    * unix_timestamp truncates each side to seconds BEFORE subtracting —
    * comparing raw microsecond deltas here would disagree with the batch
    * answer whenever a gap's fractional parts straddle the 24h boundary
    * (e.g. a true 86400.9 s gap whose truncated diff is 86400). */
  private def newSession(prevUs: Long, tsUs: Long): Boolean =
    Math.floorDiv(tsUs, 1000000L) - Math.floorDiv(prevUs, 1000000L) > GapS

  /** The state-update function: fold this batch's (sorted) events into the
    * running per-user session state; on watermark timeout, emit the final
    * record and drop the state.
    *
    * Events may arrive out of order ACROSS micro-batches (one parquet
    * file per trigger, no global order). lastTs is clamped to
    * max(lastTs, ts): a late event can never rewind the session clock,
    * which would otherwise make the next on-time event see an inflated
    * gap and open a spurious session. (A late event that truly belonged
    * before the last boundary is counted into the current session —
    * the bounded-state trade every watermark-based sessionizer makes.) */
  def update(userId: Long, events: Iterator[Ev],
      state: GroupState[SessState]): Iterator[UserSessions] = {
    if (state.hasTimedOut) {
      // watermark passed this user's idle horizon: close out and free the
      // state slot (a later event for the user starts a fresh session)
      val s = state.get
      state.remove()
      Iterator.single(UserSessions(userId, s.nSessions, s.nEvents))
    } else {
      val sorted = events.toSeq.sortBy(_.ts_us)
      if (sorted.isEmpty) {
        state.getOption.map(s => UserSessions(userId, s.nSessions, s.nEvents)).iterator
      } else {
        var s = state.getOption.getOrElse(SessState(Long.MinValue, 0, 0L))
        sorted.foreach { e =>
          val isNew = s.lastTs == Long.MinValue || newSession(s.lastTs, e.ts_us)
          s = SessState(math.max(s.lastTs, e.ts_us),
            s.nSessions + (if (isNew) 1 else 0), s.nEvents + 1)
        }
        state.update(s)
        // arm the event-time timeout at the idle horizon (ms precision)
        state.setTimeoutTimestamp(Math.floorDiv(s.lastTs, 1000L) + GapS * 1000L)
        Iterator.single(UserSessions(userId, s.nSessions, s.nEvents))
      }
    }
  }

  /** Run over a parquet event directory with availableNow; results (one
    * row per state update or timeout) land in the memory table
    * `sinkName`. The watermark (`delay` behind max event time) both
    * tolerates cross-file disorder and drives the state timeouts. */
  def run(spark: SparkSession, dir: String, sinkName: String,
      delay: String = "1 second"): StreamingQuery = {
    import spark.implicits._
    val events: Dataset[Ev] = StreamingJobs.eventStream(spark, dir)
      .withWatermark("ts", delay)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"), col("ts"))
      .as[Ev]
    val q = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(update)
      .writeStream
      .queryName(sinkName)
      .format("memory")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
