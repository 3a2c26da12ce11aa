package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool (optimization guide §1): time registered queries in
  * isolation with the noop sink — `runMain graft.tools.TimeQuery
  * <query>[,<query>...] [sfDir] [repeats]` — so the measured number is
  * the computation, not the sink or a prunable count. Prints per-repeat
  * wall seconds plus a per-stage summary (duration, tasks, shuffle
  * bytes, spill) from a SparkListener, which is the local[] stand-in
  * for the Spark UI stage page. Uses the shared GraftSession so
  * fit-once caches and the model store behave exactly as in Bench. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = graft.GraftSession.local()
    // stage accounting: (stageId, name-prefix) -> metrics
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val tm = si.taskMetrics
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks,
            tm.shuffleReadMetrics.totalBytesRead,
            tm.shuffleWriteMetrics.bytesWritten,
            tm.memoryBytesSpilled + tm.diskBytesSpilled))
        }
      }
    })
    graft.Tables.lineitem(spark, sfDir).count() // session warm-up
    names.foreach { name =>
      val q = graft.Registry.byName(name)
      (1 to repeats).foreach { i =>
        stages.synchronized(stages.clear())
        spark.sparkContext.setJobDescription(s"$name#$i")
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[timequery] $name repeat $i: $sec%.2f s")
        if (sys.env.get("TIMEQUERY_STAGES").contains("1")) {
          val top = stages.synchronized(stages.sortBy(-_._3).take(12))
          top.foreach { case (id, nm, ms, nt, sr, sw, sp) =>
            println(f"[timequery]   stage $id%4d $ms%6d ms tasks=$nt%3d " +
              f"shufR=${sr / 1024}%8d KB shufW=${sw / 1024}%8d KB " +
              f"spill=${sp / 1024}%6d KB  $nm")
          }
        }
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
