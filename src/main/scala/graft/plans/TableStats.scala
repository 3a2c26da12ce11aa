package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Cheap, cached table statistics for planner-style decisions inside the
  * engine's own operators (the q116 ANALYZE relation made *actionable*):
  * row count comes from the parquet footers (a metadata count, no data
  * scan) and total bytes from the filesystem — both O(#files), never
  * O(rows). Cached per path for the life of the session, mirroring how a
  * catalog holds ANALYZE output; `invalidate` drops a stale entry after
  * a rewrite. First consumer: Similarity.nearDupPairsAuto routes
  * exact-all-pairs vs LSH by (rows, estimated in-memory corpus bytes)
  * instead of a bare count, so the O(N²) path can also be refused when
  * rows are few but vectors are wide. */
object TableStats {

  /** Footer/filesystem statistics for one parquet table. */
  final case class Stats(rows: Long, bytes: Long) {
    /** Average ON-DISK bytes per row (compressed parquet). */
    def avgRowBytes: Double = if (rows == 0) 0.0 else bytes.toDouble / rows
  }

  private val cache = TrieMap.empty[String, Stats]

  def invalidate(path: String): Unit = cache.remove(path)
  def clear(): Unit = cache.clear()

  /** Stats for a parquet file/dir, computed once per path per session. */
  def forParquet(s: SparkSession, path: String): Stats =
    cache.getOrElseUpdate(path, {
      // count() over a bare parquet scan is answered from row-group
      // metadata (no column is read); bytes via the filesystem summary
      val rows = s.read.parquet(path).count()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val bytes = fs.getContentSummary(p).getLength
      Stats(rows, bytes)
    })

  /** Stats for a dataset dir's embeddings table. */
  def embeddings(s: SparkSession, d: String): Stats =
    forParquet(s, s"$d/embeddings.parquet")
}
