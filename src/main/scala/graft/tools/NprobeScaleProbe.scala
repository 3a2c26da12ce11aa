package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Ann, LateInteraction, Similarity}

/** Round-16 measurement for the scale-aware nprobe default (VERDICT r15
  * Next #2, the q238/q226 seam): recall + wall of the IVF kNN tier
  * (q34/q35 shape) and the IVF-routed MaxSim tier (q238/q239 shape) at
  * 1× and factor×, under the old fixed nprobe=6 vs the auto
  * round(√(3·cells)) resolution. The claim under measurement: auto
  * holds the 10× recall ≥ 0.95 where fixed-6 measured 0.85 (SCALE.md
  * r15), at a wall still far under the exact tier's.
  *
  * runMain graft.tools.NprobeScaleProbe [baseDir] [factor] [workDir]
  *   [nps=6,auto,...] [cands=16,...] [x10only]
  */
object NprobeScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val work = if (args.length > 2) args(2) else "/tmp/graft_ann_rehearsal"
    val spark = graft.GraftSession.local()

    // same deterministic upsample as AnnScaleRehearsal (shared marker,
    // so an existing rehearsal corpus is reused as-is)
    val marker = new java.io.File(s"$work/_UPSAMPLED_x$factor")
    if (!marker.exists()) {
      graft.Tables.embeddings(spark, baseDir)
        .select(col("vec_id"), col("embedding"), col("label"),
          explode(sequence(lit(0), lit(factor - 1))).as("e"))
        .select(
          (col("vec_id") * factor + col("e")).as("vec_id"),
          expr("transform(embedding, (x, j) -> CAST(x + ((e * 31 + j) % 7 - 3) * 0.001 AS FLOAT))")
            .as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      marker.getParentFile.mkdirs(); marker.createNewFile()
    }

    val nps = args.find(_.startsWith("nps=")).map(_.drop(4).split(",").toSeq)
      .getOrElse(Seq("6", "auto"))
    val candsList = args.find(_.startsWith("cands="))
      .map(_.drop(6).split(",").toSeq.map(_.toInt)).getOrElse(Seq(16))
    val dirs = (if (args.contains("x10only")) Seq() else Seq("base" -> baseDir)) ++
      Seq(s"x$factor" -> work)

    dirs.foreach { case (tag, dir) =>
      // ground truths, once per dir (the Q·N labeled baselines)
      var t0 = System.nanoTime()
      val exactKnn = Similarity.knnExact(spark, dir, k = 2, queryMod = 10)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exactKnnSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val exactMaxsim = LateInteraction.maxSimExact(spark, dir, g = 4, k = 3,
        queryMod = 10).select(col("qgid"), col("dgid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exactMaxsimSec = (System.nanoTime() - t0) / 1e9
      println(f"[nprobe] $tag exact_knn_sec=$exactKnnSec%.1f " +
        f"exact_maxsim_sec=$exactMaxsimSec%.1f")

      nps.foreach { npConf =>
        if (npConf == "auto") spark.conf.unset("spark.graft.ivf.nprobe")
        else spark.conf.set("spark.graft.ivf.nprobe", npConf)
        // nprobe is a SEARCH-time knob (not in the fit key): warm the
        // fit once so walls below measure the probe, not KMeans
        val cells = Ann.ivfIndexFull(spark, dir).model.getK
        val resolved = graft.GraftConf.resolveNprobe(
          graft.GraftConf.ivfNprobe(spark), cells)

        t0 = System.nanoTime()
        val ivf = Ann.ivfKnn(spark, dir, k = 2,
          nprobe = graft.GraftConf.ivfNprobe(spark), queryMod = 10)
          .select(col("qid"), col("nid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val ivfSec = (System.nanoTime() - t0) / 1e9
        val ivfRecall = (ivf & exactKnn).size.toDouble / exactKnn.size

        candsList.foreach { cands =>
          t0 = System.nanoTime()
          val ms = LateInteraction.maxSimIvf(spark, dir, g = 4, k = 3,
            queryMod = 10, cands = cands)
            .select(col("qgid"), col("dgid")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val msSec = (System.nanoTime() - t0) / 1e9
          val msRecall = (ms & exactMaxsim).size.toDouble / exactMaxsim.size

          println(f"[nprobe] $tag conf=$npConf cells=$cells resolved=$resolved " +
            f"cands=$cands ivf_recall@2=$ivfRecall%.4f ivf_sec=$ivfSec%.1f " +
            f"maxsim_recall@3=$msRecall%.4f maxsim_sec=$msSec%.1f")
        }
      }
      spark.conf.unset("spark.graft.ivf.nprobe")
    }
    spark.stop()
  }
}
