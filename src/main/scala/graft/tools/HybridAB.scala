package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** A/B harness for the hybrid lexical tower's plan shapes: runs the
  * uncapped scoring once with the model store on (persisted
  * did-bucketed posting table + the fanout-gated shapes) and once with
  * it off (the inline relation), printing wall + shuffle + spill for
  * each — the tool behind SCALE.md round-13's shape-route measurements
  * (`runMain graft.tools.HybridAB [corpusDir]`). */
object HybridAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_zipf_r13")
    val spark = graft.GraftSession.local()
    object m extends SparkListener {
      val sr = new java.util.concurrent.atomic.AtomicLong
      val spill = new java.util.concurrent.atomic.AtomicLong
      def reset(): Unit = { sr.set(0); spill.set(0) }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        sr.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(sc.stageInfo.taskMetrics.diskBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(m)
    def run(tag: String): Unit = {
      m.reset()
      val t0 = System.nanoTime()
      val n = graft.operators.Hybrid.lexScoredCandidates(spark, dir,
        queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
        .count()
      println(f"[ab] $tag: sec=${(System.nanoTime() - t0) / 1e9}%.1f rows=$n " +
        f"shuffle_read_mb=${m.sr.get / 1e6}%.1f spill_mb=${m.spill.get / 1e6}%.1f")
    }
    run("storeOn")
    // getOption + try/finally (ADVICE r13): with the model store off the
    // key is absent — a bare get threw after the storeOn arm, and any
    // failure between unset and restore would have skipped the restore
    val prev = spark.conf.getOption("spark.graft.index.dir")
    try {
      spark.conf.unset("spark.graft.index.dir")
      run("storeOff_inline")
    } finally prev.foreach(spark.conf.set("spark.graft.index.dir", _))
    spark.stop()
  }
}
