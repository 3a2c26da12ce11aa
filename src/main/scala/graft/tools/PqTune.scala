package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: PQ shape sweep — recall@2 vs exact and mean quantization
  * error across (m, codes, refine). Results recorded in BASELINE.md
  * (round-5 sweep picked the m=16/k=256/refine=8 defaults). */
object PqTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = graft.operators.Similarity.knnExact(spark, sfDir, k = 2, queryMod = 10)
      .select(col("qid"), col("nid")).cache()
    val total = exact.count()
    for ((m, k, rf) <- Seq((8, 16, 4), (8, 64, 8), (8, 256, 8),
        (16, 64, 8), (16, 256, 4), (16, 256, 8))) {
      spark.conf.set("spark.graft.pq.m", m.toString)
      spark.conf.set("spark.graft.pq.codes", k.toString)
      spark.conf.set("spark.graft.pq.refine", rf.toString)
      graft.operators.Ann.clearCaches()
      val t0 = System.nanoTime()
      val ann = graft.operators.Ann.pqKnn(spark, sfDir, k = 2,
        nprobe = graft.GraftConf.ivfNprobe(spark), queryMod = 10)
        .select(col("qid"), col("nid"))
      val found = exact.join(ann, Seq("qid", "nid")).count()
      val qerr = graft.operators.Ann.pqQuantError(spark, sfDir)
        .agg(avg(col("qerr"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pqtune] m=$m%2d codes=$k%3d refine=$rf " +
        f"recall=${found.toDouble / total}%.3f qerr=$qerr%.3f time=$dt%.1fs")
    }
    Seq("spark.graft.pq.m", "spark.graft.pq.codes", "spark.graft.pq.refine")
      .foreach(spark.conf.unset)
    spark.stop()
  }
}
