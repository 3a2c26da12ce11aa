package graft.tools

/** Dev tool: run one registered query and print its rows
  * (`runMain graft.tools.RunQuery <query>[,<query>...] [sfDir]`) — the
  * show()-level feedback loop ExplainTool gives for plans. Uses the
  * shared entry-point session (UTC pin + model store) so fitted-model
  * caches behave exactly as in Verify/Bench. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.local()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.Registry.byName(name).run(spark, sfDir)
      df.show(50, truncate = false)
      println(f"[runquery] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
