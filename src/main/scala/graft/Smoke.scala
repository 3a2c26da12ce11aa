package graft


/** Dev smoke entry mirroring the driver's t1 gate: SparkEntry.entry must
  * return rows > 0 on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n (must be > 0)")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
