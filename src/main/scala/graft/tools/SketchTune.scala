package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: sketch-parameter sweep for the dedup tier (mirrors LshTune
  * for the embedding tier). MinHash: recall of true near-dup pairs
  * (exact 3-shingle Jaccard >= 0.8) vs candidate volume across
  * (funcs, bandRows) shapes. SimHash: candidate volume and radius-3
  * coverage across band counts. Results recorded in BASELINE.md. */
object SketchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ground truth for the MinHash sweep: exact Jaccard >= 0.8 over the
    // same 3-shingle space the signatures sketch
    val truth = graft.operators.Dedup.ngramJaccard(spark, sfDir, n = 3, threshold = 0.8)
      .select(col("id1"), col("id2")).cache()
    val total = truth.count()
    println(s"[sketchtune] minhash truth pairs (3-shingle J>=0.8): $total")

    for ((fns, rows) <- Seq((4, 2), (8, 1), (8, 2), (8, 4), (16, 2))) {
      spark.conf.set("spark.graft.minhash.funcs", fns.toString)
      spark.conf.set("spark.graft.minhash.bandRows", rows.toString)
      val t0 = System.nanoTime()
      val cand = graft.operators.Dedup.minhashCandidatePairs(spark, sfDir)
        .select(col("id1"), col("id2")).cache()
      val nCand = cand.count()
      val found = truth.join(cand, Seq("id1", "id2")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      cand.unpersist()
      println(f"[sketchtune] minhash funcs=$fns%2d bandRows=$rows%d " +
        f"recall=${if (total == 0) 1.0 else found.toDouble / total}%.3f " +
        f"candidates=$nCand%d time=$dt%.1fs")
    }
    spark.conf.unset("spark.graft.minhash.funcs")
    spark.conf.unset("spark.graft.minhash.bandRows")

    // SimHash sweep: 4 bands is pigeonhole-complete at Hamming <= 3, so
    // its pair set is the reference; fewer bands trade recall for volume
    val ref = {
      spark.conf.set("spark.graft.simhash.bands", "4")
      graft.operators.Dedup.simhashPairs(spark, sfDir)
        .select(col("id1"), col("id2")).cache()
    }
    val refN = ref.count()
    for (nb <- Seq(2, 4, 8)) {
      spark.conf.set("spark.graft.simhash.bands", nb.toString)
      val t0 = System.nanoTime()
      val cand = graft.operators.Dedup.simhashCandidates(spark, sfDir).cache()
      val nCand = cand.count()
      val found = ref.join(
        cand.filter(col("hamming") <= 3).select(col("id1"), col("id2")),
        Seq("id1", "id2")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      cand.unpersist()
      println(f"[sketchtune] simhash bands=$nb%2d " +
        f"coverage=${if (refN == 0) 1.0 else found.toDouble / refN}%.3f " +
        f"candidates=$nCand%d time=$dt%.1fs")
    }
    spark.conf.unset("spark.graft.simhash.bands")
    spark.stop()
  }
}
