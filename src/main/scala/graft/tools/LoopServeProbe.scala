package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** q229's sweep (VERDICT r12 #5 — the ServeProbe convention applied to
  * the STANDING loop): recall of searches through the loop's FINAL
  * version on the drifted 5n corpus, swept over nprobe, next to the
  * never-repaired counterfactual at the default nprobe — so the
  * fraction-matched default's position on the curve is a measured fact
  * at sf0.1, not an sf0.001 pin.
  * (`runMain graft.tools.LoopServeProbe [sfDir] [maxExtraProbes]`) */
object LoopServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxExtra = if (args.length > 1) args(1).toInt else 6
    val spark = graft.GraftSession.local()
    val k = 2
    val loop = Ann.standingLoop(spark, sfDir, nBatches = 4, postBatches = 2)
    val nprobe = graft.GraftConf.resolveNprobe(
      graft.GraftConf.ivfNprobe(spark), loop.cells0)
    println(s"[loopprobe] cells0=${loop.cells0} servedCells=${loop.servedCells} " +
      s"nTotal=${loop.nTotal} finalSkew=${loop.finalSkew}")
    val queries = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("qvec"))
    val corpus = loop.served.select(col("vec_id").as("nid"), col("vec").as("nvec"))
    val topk = udaf(new graft.functions.TopKAggregator(k))
    val exact = queries.join(corpus, col("qid") =!= col("nid"))
      .groupBy(col("qid"))
      .agg(topk(graft.functions.VectorKernels.cosineFast(col("qvec"), col("nvec")),
        col("nid")).as("top"))
      .select(col("qid"), explode(col("top")).as("e"))
      .select(col("qid"), col("e._2").as("nid"))
      .persist()
    // the never-repaired counterfactual: the same 5n corpus assigned by
    // the frozen pre-drift quantizer, searched at the default nprobe
    val n = graft.plans.TableStats.embeddings(spark, sfDir).rows
    val cfCorpus = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .unionByName(Ann.driftReplicas(spark, sfDir, 0L, 4 * n))
    val idx = Ann.ivfIndexFull(spark, sfDir)
    val preCents = idx.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    val cf = Ann.searchWithCentroids(queries,
      Ann.assignCells(spark, sfDir, cfCorpus), preCents, k, nprobe)
    println(s"[loopprobe] counterfactual (never repaired) nprobe=$nprobe: " +
      Ann.recallVsExact(cf, exact).head())
    val postCents = Ann.collectCentroids(loop.served)
    val matched = math.max(nprobe,
      math.ceil(nprobe.toDouble * loop.servedCells / loop.cells0).toInt)
    (nprobe to math.min(loop.servedCells, matched + maxExtra)).foreach { np =>
      val mark = if (np == matched) "  <- fraction-matched default" else ""
      val post = Ann.searchWithCentroids(queries, loop.served, postCents, k, np)
      println(s"[loopprobe] loop-serve nprobe=$np: " +
        Ann.recallVsExact(post, exact).head() + mark)
    }
    spark.stop()
  }
}
