package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Dev probe for the q226 serve-after-repair gate: prints pre/post
  * recall at a sweep of post-repair nprobe values so the scaling rule is
  * chosen from measurement
  * (`runMain graft.tools.ServeProbe [sfDir] [maxExtraProbes]`). */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val maxExtra = if (args.length > 1) args(1).toInt else 8
    val spark = graft.GraftSession.local()
    val dr = Ann.driftRepair(spark, sfDir)
    println(s"[probe] cellsPre=${dr.cellsPre} cellsPost=${dr.cellsPost} skews=${dr.skews}")
    val k = 2
    val nprobe = graft.GraftConf.resolveNprobe(
      graft.GraftConf.ivfNprobe(spark), dr.cellsPre)
    val queries = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("qvec"))
    val corpus = dr.assignedDrift.select(col("vec_id").as("nid"), col("vec").as("nvec"))
    val topk = udaf(new graft.functions.TopKAggregator(k))
    val exact = queries.join(corpus, col("qid") =!= col("nid"))
      .groupBy(col("qid"))
      .agg(topk(graft.functions.VectorKernels.cosineFast(col("qvec"), col("nvec")), col("nid")).as("top"))
      .select(col("qid"), explode(col("top")).as("e"))
      .select(col("qid"), col("e._2").as("nid"))
      .persist()
    val idx = Ann.ivfIndexFull(spark, sfDir)
    val preCents = idx.model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val pre = Ann.searchWithCentroids(queries, dr.assignedDrift, preCents, k, nprobe)
    println(s"[probe] recall PRE  nprobe=$nprobe: " +
      Ann.recallVsExact(pre, exact).head())
    val postCents = Ann.collectCentroids(dr.repaired)
    (nprobe to math.min(dr.cellsPost, nprobe + maxExtra)).foreach { np =>
      val post = Ann.searchWithCentroids(queries, dr.repaired, postCents, k, np)
      println(s"[probe] recall POST nprobe=$np: " +
        Ann.recallVsExact(post, exact).head())
    }
    spark.stop()
  }
}
