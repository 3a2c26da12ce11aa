package graft.tools

import org.apache.spark.sql.functions._

/** Cap/agreement sweep for the hybrid postings cap over an
  * already-materialized corpus (use ScaleRehearsal's zipf workDir):
  * runs q210 uncapped once as the reference, then each requested cap
  * under generate-only and verify-rerank, and prints wall + top-5
  * agreement for each — the curve SCALE.md's fixed-V section quotes.
  *
  * Usage: runMain graft.tools.ImpactSweep [corpusDir] [cap,cap,...]
  */
object ImpactSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_zipf_r12")
    val caps = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(500, 1000)
    val spark = graft.GraftSession.local()

    def fusedTop5(): (Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val res = graft.operators.Hybrid
        .rrfFusion(spark, dir, k = 5, kCand = 10, queryMod = 10)
        .select(col("qid"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (res, (System.nanoTime() - t0) / 1e9)
    }

    val (base, baseSec) = fusedTop5()
    println(f"[sweep] uncapped: sec=$baseSec%.1f rows=${base.size}")
    caps.foreach { cap =>
      Seq(false, true).foreach { rerank =>
        spark.conf.set("spark.graft.hybrid.maxPostingsPerTerm", cap.toString)
        spark.conf.set("spark.graft.hybrid.capRerank", rerank.toString)
        val (res, sec) = fusedTop5()
        val agree = res.intersect(base).size.toDouble / math.max(1, base.size)
        println(f"[sweep] cap=$cap rerank=$rerank: sec=$sec%.1f agreement=$agree%.3f")
        spark.conf.unset("spark.graft.hybrid.maxPostingsPerTerm")
        spark.conf.unset("spark.graft.hybrid.capRerank")
      }
    }
    spark.stop()
  }
}
