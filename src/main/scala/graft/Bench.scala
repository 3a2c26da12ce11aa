package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  def main(args: Array[String]): Unit = BenchLock.exclusively("bench") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: pay session/JIT/codegen startup outside the measured loop,
    // and run queries in name order so per-query numbers are comparable
    // across rounds (a Map's iteration order would hand the warmup cost to
    // a random query each run).
    Tables.lineitem(spark, sfDir).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failing query must surface as an error, not bench as "fast":
      // its elapsed time still counts, and its message lands in `errors`
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":\"" + esc(m) + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    if (results.exists(_._3.isDefined)) System.err.println(
      s"[bench] ${results.count(_._3.isDefined)} queries FAILED — totals are not comparable")
    spark.stop()
  }
}
