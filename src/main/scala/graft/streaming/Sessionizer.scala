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
  * O(users), not O(events) — and event-time-timeout-able, which is what
  * makes this viable on an unbounded 100 TB stream where the batch
  * window-function form is not.
  */
object Sessionizer {

  case class Ev(user_id: Long, ts_us: Long)
  case class SessState(lastTs: Long, nSessions: Int, nEvents: Long)
  case class UserSessions(user_id: Long, n_sessions: Int, n_events: Long)

  private val GapUs: Long = 86400L * 1000000L // 24h in microseconds

  /** The state-update function: fold this batch's (sorted) events into the
    * running per-user session state. */
  def update(userId: Long, events: Iterator[Ev],
      state: GroupState[SessState]): Iterator[UserSessions] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    if (sorted.isEmpty) {
      state.getOption.map(s => UserSessions(userId, s.nSessions, s.nEvents)).iterator
    } else {
      var s = state.getOption.getOrElse(SessState(Long.MinValue, 0, 0L))
      sorted.foreach { e =>
        val newSession = s.lastTs == Long.MinValue || e.ts_us - s.lastTs > GapUs
        s = SessState(e.ts_us, s.nSessions + (if (newSession) 1 else 0), s.nEvents + 1)
      }
      state.update(s)
      Iterator.single(UserSessions(userId, s.nSessions, s.nEvents))
    }
  }

  /** Run over a parquet event directory with availableNow; results (last
    * update per user) land in the memory table `sinkName`. */
  def run(spark: SparkSession, dir: String, sinkName: String): StreamingQuery = {
    import spark.implicits._
    val events: Dataset[Ev] = StreamingJobs.eventStream(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"))
      .as[Ev]
    val q = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
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
