package graft

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

/** Inter-process exclusive lock shared by the measurement mains.
  *
  * The bench gate is a wall-clock total on a 32-thread local session; a
  * concurrently-running Verify (another 32-thread JVM on the same 32
  * cores) contaminates it unpredictably — the r2 bench recorded 3-8x
  * regressions on queries whose code had not changed. Bench and Verify
  * both take this lock, so whichever starts second blocks instead of
  * corrupting the other's numbers. */
object BenchLock {
  private val LockPath = Paths.get(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_measure.lock")

  // FileChannel locks are per-JVM: a second thread in the SAME process
  // gets OverlappingFileLockException rather than queueing, so in-process
  // callers serialize on this mutex first, then the file lock covers
  // cross-JVM exclusion.
  private val jvmMutex = new java.util.concurrent.locks.ReentrantLock()

  /** Run `body` holding the cross-process measurement lock (blocks until
    * acquired; same-JVM callers queue on an in-process mutex first). */
  def exclusively[A](label: String)(body: => A): A = {
    jvmMutex.lock()
    try {
      val ch = FileChannel.open(LockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        if (ch.tryLock() == null) {
          System.err.println(s"[$label] waiting for concurrent measurement JVM to finish")
          ch.lock() // blocks
        }
        body
      } finally ch.close() // releases the file lock
    } finally jvmMutex.unlock()
  }
}
