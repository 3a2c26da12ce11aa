package graft.tools

import org.apache.spark.sql.functions._

/** Wall decomposition of q210 (hybrid RRF — the bench suite's most
  * expensive query): times each stage of the fusion separately so
  * SCALE.md can name which stage owns the wall and whether it is
  * reducible at this shape (VERDICT r12 next-round #4).
  *
  * Stages (each run `iters` times, min reported; run 1 of the lex leg
  * additionally pays the tf/lens cache build, so its cold-vs-warm gap
  * isolates that cost):
  *   tf_cold      first lexScoredCandidates count (builds tf/lens cache)
  *   lex_gen      candidate generation + exact BM25 scoring (count)
  *   lex_topk     generation + the per-query bounded top-k heap
  *   vec          the vector tower (q181 router) top-k
  *   fused        the full rrfFusion(k=5, kCand=10)
  *
  * Usage: runMain graft.tools.HybridFloor [sfDir] [iters]
  */
object HybridFloor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local()

    def timeIt(label: String)(body: => Long): Unit = {
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val secs = runs.map(_._1)
      println(f"[floor] $label%-10s min=${secs.min}%6.2f s  " +
        f"max=${secs.max}%6.2f s  rows=${runs.head._2}")
    }

    // cold: includes the one-time tf/lens cache build
    val t0 = System.nanoTime()
    val coldRows = graft.operators.Hybrid.lexScoredCandidates(spark, dir,
      queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
      .count()
    println(f"[floor] tf_cold    ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$coldRows")

    timeIt("lex_gen") {
      graft.operators.Hybrid.lexScoredCandidates(spark, dir,
        queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
        .count()
    }
    timeIt("lex_topk") {
      graft.operators.Hybrid.bm25DocRetrieval(spark, dir, k = 10,
        queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
        .count()
    }
    timeIt("vec") {
      graft.operators.Similarity.knnAuto(spark, dir, k = 10, queryMod = 10)
        .count()
    }
    timeIt("fused") {
      graft.operators.Hybrid.rrfFusion(spark, dir, k = 5, kCand = 10,
        queryMod = 10).count()
    }
    spark.stop()
  }
}
