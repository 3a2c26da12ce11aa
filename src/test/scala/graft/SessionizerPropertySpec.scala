package graft

import scala.util.Random

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.streaming.Sessionizer
import graft.streaming.Sessionizer.{Ev, SessState, UserSessions}

/** Property: for in-order arrival, the sessionizer's folded state is
  * invariant under HOW the stream is chopped into micro-batches — any
  * contiguous batch split of the same event sequence must produce the
  * same per-user (n_sessions, n_events) as a single-pass reference fold
  * (the batch q71 algorithm). Runs the state function directly against a
  * fake GroupState, so hundreds of random scenarios cost milliseconds,
  * not streaming jobs. */
class SessionizerPropertySpec extends SparkSpec {

  private class FakeState extends GroupState[SessState] {
    private var value: Option[SessState] = None
    override def exists: Boolean = value.isDefined
    override def get: SessState = value.get
    override def getOption: Option[SessState] = value
    override def update(s: SessState): Unit = value = Some(s)
    override def remove(): Unit = value = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(ms: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(ms: Long): Unit = ()
    override def setTimeoutTimestamp(ms: Long, additional: String): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date, additional: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  private val GapS = 86400L

  /** Single-pass reference: the batch q71 gaps-and-islands semantics
    * (truncated-second diffs) folded per user. */
  private def reference(events: Seq[(Long, Long)]): Map[Long, (Int, Long)] =
    events.groupBy(_._1).map { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = 1 + ts.zip(ts.tail).count { case (a, b) =>
        Math.floorDiv(b, 1000000L) - Math.floorDiv(a, 1000000L) > GapS
      }
      u -> ((sessions, ts.length.toLong))
    }

  test("per-user sessions are invariant under arbitrary micro-batch splits") {
    val rnd = new Random(42)
    for (scenario <- 1 to 200) {
      val users = 1 + rnd.nextInt(4)
      val n = 5 + rnd.nextInt(40)
      val base = 1700000000000000L // micros
      // event times with gaps that straddle the 24h boundary (including
      // fractional-second near-misses) to exercise the truncation rule
      var t = base
      val events = (1 to n).map { _ =>
        t += (rnd.nextInt(4) match {
          case 0 => rnd.nextInt(3600) * 1000000L            // in-session
          case 1 => 86390L * 1000000L + rnd.nextInt(20000000)  // near-boundary
          case 2 => (86400L + rnd.nextInt(90000)) * 1000000L   // over
          case 3 => rnd.nextInt(1000000).toLong                // sub-second
        })
        (1L + rnd.nextInt(users), t)
      }
      // chop the in-order sequence into random contiguous batches
      val states = collection.mutable.Map.empty[Long, FakeState]
      var rest = events
      var last = Map.empty[Long, UserSessions]
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(rest.length)
        val (batch, tail) = rest.splitAt(k)
        rest = tail
        batch.groupBy(_._1).foreach { case (u, evs) =>
          val st = states.getOrElseUpdate(u, new FakeState)
          val out = Sessionizer.update(u,
            evs.map { case (uu, ts) => Ev(uu, ts, new java.sql.Timestamp(ts / 1000)) }
              .iterator, st)
          out.foreach(r => last += u -> r)
        }
      }
      val expected = reference(events)
      val got = last.map { case (u, r) => u -> ((r.n_sessions, r.n_events)) }
      assert(got == expected, s"scenario $scenario: $got != $expected")
    }
  }
}
