package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Idempotent stage runner — the reference's file-existence stage cache
  * (S10: app/main.py:110-123 preprocess, :130-141 embeddings, :177-198
  * index) as a first-class engine component: each stage materializes to
  * parquet once and is skipped (read back) on re-run, so a multi-stage
  * pipeline (clean -> embed -> index -> search) restarts from the last
  * completed stage after a failure.
  *
  * A stage writes to `<root>/<name>/_DONE`-guarded parquet; the done
  * marker (not bare directory existence) is the commit point, so a
  * half-written stage from a crashed run is transparently recomputed.
  * Markers go through the workDir's Hadoop FileSystem — the same
  * filesystem the stage data is written to — so resume works identically
  * on local disk, HDFS, or S3A (java.nio would silently break anything
  * but local paths).
  * At 100 TB each stage boundary is also the natural place to repartition
  * or bucket for the next stage's join keys. */
final class Pipeline(spark: SparkSession, root: String) {

  private def dir(name: String) = s"$root/$name"
  private def doneMarker(name: String) = new Path(s"${dir(name)}/_DONE")
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True if the stage has committed output. */
  def isDone(name: String): Boolean = {
    val m = doneMarker(name)
    fs(m).exists(m)
  }

  /** Run (or skip) a stage: returns the materialized stage output. */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    if (!isDone(name)) {
      compute.write.mode(SaveMode.Overwrite).parquet(dir(name))
      val m = doneMarker(name)
      fs(m).create(m, true).close()
    }
    spark.read.parquet(dir(name))
  }

  /** Drop a stage's materialization (the M5 "rebuild the index" path). */
  def invalidate(name: String): Unit = {
    val m = doneMarker(name)
    val f = fs(m)
    if (f.exists(m)) f.delete(m, false)
    // a stage about to be recomputed must not serve stale cached stats
    // to planner-style consumers (JobPipeline stage 4 routing)
    TableStats.invalidate(dir(name))
  }

  /** Catalog table name for a bucketed stage — root-scoped so two
    * pipelines with different workDirs never collide in the catalog. */
  def bucketedTableName(name: String): String =
    s"graft_${name}_${Integer.toHexString(root.hashCode)}"

  /** Stage variant materialized as a table BUCKETED by `key` (external,
    * data at the stage dir): the "shuffle once at ingest, never per
    * query" layout — every downstream equi-join on `key` reads this side
    * with zero Exchange (asserted by JobPipelineSpec/BucketingSpec).
    * Bucket metadata lives in the session catalog; a fresh session that
    * finds the commit marker but no catalog entry rewrites the stage
    * from its (already materialized) inputs — a local layout rebuild,
    * not a recomputation of upstream stages. */
  def stageBucketed(name: String, key: String, buckets: Int)
      (compute: => DataFrame): DataFrame = {
    val table = bucketedTableName(name)
    if (!isDone(name) || !spark.catalog.tableExists(table)) {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      // the _DONE marker is underscore-prefixed, so parquet readers treat
      // it as hidden metadata and the table dir stays self-contained
      compute.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, key).sortBy(key)
        .option("path", dir(name)).format("parquet").saveAsTable(table)
      val m = doneMarker(name)
      fs(m).create(m, true).close()
    }
    spark.table(table)
  }
}
