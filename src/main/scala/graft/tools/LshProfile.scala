package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the LSH near-dup query. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    graft.Tables.embeddings(spark, sfDir).count()
    t("lshIndex fit") { graft.operators.Ann.lshIndex(spark, sfDir) }
    t("hashBuckets count") {
      println("  rows=" + graft.operators.Ann.lshHashBuckets(spark, sfDir,
        graft.Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))).count())
    }
    t("full lshNearDup #1") {
      println("  pairs=" + graft.operators.Ann.lshNearDup(spark, sfDir, 0.35).count())
    }
    t("full lshNearDup #2 (model cached)") {
      println("  pairs=" + graft.operators.Ann.lshNearDup(spark, sfDir, 0.35).count())
    }
    t("ivfIndex fit+assign") {
      val (assigned, _) = graft.operators.Ann.ivfIndex(spark, sfDir)
      println("  assigned=" + assigned.count())
    }
    t("ivfKnn #1 (index cached)") {
      println("  rows=" + graft.operators.Ann.ivfKnn(spark, sfDir,
        k = 2, nprobe = 6, queryMod = 10).count())
    }
    t("ivfKnn #2") {
      println("  rows=" + graft.operators.Ann.ivfKnn(spark, sfDir,
        k = 2, nprobe = 6, queryMod = 10).count())
    }
    spark.stop()
  }
}
