package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operators live in graft.operators.* and are registered in
  * [[Registry]]; this object only adapts them to the driver's shape. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's end product: all near-duplicate embedding pairs above
    * a cosine threshold, canonicalized and sorted
    * (reference: app/main.py:201-280). Routed through the scale-aware
    * search: exact below GraftConf.exactPairCutoff, LSH candidates above
    * it (so the same entry point survives a 100 TB corpus). */
  def entry(spark: SparkSession): DataFrame =
    operators.Similarity.nearDupPairsAuto(
      spark, "/root/testdata/sf0.001", threshold = 0.35)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
