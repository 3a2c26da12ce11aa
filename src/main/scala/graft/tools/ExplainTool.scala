package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of a registered query
  * (`runMain graft.tools.ExplainTool <query> <sfDir>`), for the
  * pushdown/codegen review loop the build plan calls for. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Registry.byName(name).run(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
