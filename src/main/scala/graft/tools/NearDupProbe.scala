package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.VectorKernels._

/** Dev probe (optimization guide §1): decompose graft.operators.Ann
  * ivfNearDup's cost at sf0.1 — probe relation, bucket join, verify,
  * dedup, sort — each timed with the noop sink so the measured number
  * is that sub-plan's computation. */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = graft.GraftSession.local()
    def noop(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      s.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val idx = graft.operators.Ann.ivfIndexFull(s, d)
    idx.assigned.count() // force the persist fill outside the timings
    val cents = idx.model.clusterCenters.map(_.toArray)
    val np = graft.GraftConf.resolveNprobe(graft.GraftConf.ivfNprobe(s), cents.length)
    println(s"[probe] cells=${cents.length} nprobe=$np")
    val probed = idx.assigned.select(col("vec_id"), col("vec"))
      .select(col("vec_id"), col("vec").as("embedding"), lit(0).as("ht"),
        explode(nearestCellsFast(col("vec"), cents, np)).as("bucket"))
    (1 to 2).foreach { i =>
      noop(probed, s"probed#$i")
      val salts = graft.GraftConf.lshBucketSalts(s)
      val a = probed.select(col("vec_id").as("id1"), col("embedding").as("v1"),
        col("ht"), col("bucket"), (col("vec_id") % salts).cast("int").as("salt"))
      val b = probed.select(col("vec_id").as("id2"), col("embedding").as("v2"),
        col("ht"), col("bucket"))
        .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
      val parts = s.sessionState.conf.numShufflePartitions
      val joined = a.repartition(parts, col("ht"), col("bucket"), col("salt"))
        .join(b.repartition(parts, col("ht"), col("bucket"), col("salt")),
          Seq("ht", "bucket", "salt"))
        .filter(col("id1") < col("id2"))
      noop(joined.select(col("id1"), col("id2")), s"join-only#$i")
      val scored = joined.select(col("id1"), col("id2"),
        round(cosineFast(col("v1"), col("v2")), 4).as("sim"))
      noop(scored, s"scored#$i")
      val thr = scored.filter(col("sim") >= 0.3)
      noop(thr, s"thresholded#$i")
      val dd = thr.dropDuplicates("id1", "id2")
      noop(dd, s"deduped#$i")
      noop(dd.orderBy(col("sim").desc, col("id1"), col("id2")), s"sorted#$i")
    }
    s.stop()
  }
}
