package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The measurement lock must serialize concurrent holders (Bench and
  * Verify JVMs; same-process threads share the JVM-wide file lock via
  * the blocking path). */
class BenchLockSpec extends AnyFunSuite {

  test("concurrent exclusively() blocks never overlap") {
    val inside = new AtomicInteger(0)
    val maxInside = new AtomicInteger(0)
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        BenchLock.exclusively("spec") {
          val now = inside.incrementAndGet()
          maxInside.updateAndGet(m => math.max(m, now))
          Thread.sleep(50)
          inside.decrementAndGet()
        })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(maxInside.get() == 1,
      s"lock admitted ${maxInside.get()} holders at once")
  }
}
