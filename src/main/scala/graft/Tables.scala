package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet test tables (see TESTDATA.md).
  *
  * All queries take a scale-factor directory (`/root/testdata/sf0.01` etc.)
  * and read parquet directly — Catalyst pushes column pruning and predicate
  * filters into the scan, so loaders stay schema-free and lazy.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    // pin the session timezone at the data boundary, not only in the
    // entry-point builders: the NTZ->TIMESTAMP cast in eventsWithTs (and
    // any date/timestamp function downstream) is session-tz-dependent,
    // and an external driver embedding SparkEntry outside our builders
    // would otherwise inherit the host JVM's zone and silently shift
    // every event instant vs the DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if (name == "events") {
      // older testdata generations store events.ts as parquet
      // TIMESTAMP(NANOS), which Spark's vectorized reader rejects; this
      // conf reads those nanos as LongType (no-op for timestamp[us]
      // generations). Use eventsWithTs for a uniform TimestampType ts.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with `ts` as TimestampType regardless of the testdata
    * generation: epoch-nanos LONG files convert via integer `div`
    * (NOT `/`: SQL `/` on longs goes through DOUBLE, and epoch nanos
    * ~1.7e18 exceed a double's 2^53 exact range, so the truncating
    * cast could land a microsecond off); timestamp[us] NTZ files cast
    * NTZ -> TIMESTAMP, value-preserving because every engine session
    * pins spark.sql.session.timeZone=UTC (the same instant DuckDB's
    * naive read of the file sees). */
  def eventsWithTs(spark: SparkSession, d: String): DataFrame = {
    val ev = load(spark, d, "events")
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        ev.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  def region(spark: SparkSession, d: String): DataFrame     = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = load(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame     = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
