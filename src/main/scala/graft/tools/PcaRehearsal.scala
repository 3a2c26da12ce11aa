package graft.tools

/** PCA at the reference's real dimensionality (VERDICT r9 item 4 tail):
  * generate an n×d synthetic embeddings corpus (deterministic hash
  * noise, elements in (−1, 1)), run the Gramian covariance + power
  * iteration + q221 projection COLD, then the projection again WARM
  * (loading served from the pcaState cache) — proving d=384
  * (N·d² ≈ 147k multiply-adds per row through the typed aggregator) is
  * comfortable for the single-pass Gramian plan.
  *
  * Usage: runMain graft.tools.PcaRehearsal [n] [d] [workDir]
  */
object PcaRehearsal {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val d = if (args.length > 1) args(1).toInt else 384
    val work = if (args.length > 2) args(2)
      else s"/tmp/graft_pca_rehearsal_${n}x$d"
    val spark = graft.GraftSession.local()
    val marker = new java.io.File(s"$work/_GEN_${n}x$d")
    if (!marker.exists()) {
      spark.range(n.toLong).selectExpr("id AS vec_id",
        s"transform(sequence(0, ${d - 1}), j -> " +
          "CAST((pmod(hash(id * 131 + j), 2000) - 1000) / 1000.0 AS FLOAT)) AS embedding",
        "CAST(pmod(id, 7) AS INT) AS label")
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      marker.getParentFile.mkdirs(); marker.createNewFile()
    }
    spark.read.parquet(s"$work/embeddings.parquet").count() // warm-up
    val t0 = System.nanoTime()
    val rows = graft.operators.Embedding.pcaProjection(spark, work, iters = 8).count()
    val cold = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    graft.operators.Embedding.pcaProjection(spark, work, iters = 8).count()
    val warm = (System.nanoTime() - t1) / 1e9
    println(f"[pca-rehearsal] n=$n d=$d rows=$rows " +
      f"cold=$cold%.2f s (Gramian covariance + eigensolve + projection), " +
      f"warm=$warm%.2f s (cached loading, projection pass only)")
    spark.stop()
  }
}
