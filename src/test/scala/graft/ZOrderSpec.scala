package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.Scale

/** Z-order clustering must buy measurable file skipping on BOTH
  * clustered dimensions. The check reads the per-file min/max envelope
  * (exactly the parquet footer stats a scan prunes with) via
  * input_file_name() and counts how many files a point filter on each
  * dimension could touch — the fraction a stats-pruning reader scans. */
class ZOrderSpec extends SparkSpec {

  /** fraction of files whose [min,max] of `c` contains the column's
    * global midpoint — what a point/short-range filter must scan */
  private def overlapFraction(dir: String, c: String): Double = {
    val back = spark.read.parquet(dir)
    val r = back.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head
    val p = (r.getDouble(0) + r.getDouble(1)) / 2
    val perFile = back.groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))
    val total = perFile.count().toDouble
    val touched = perFile.filter(col("lo") <= p && col("hi") >= p).count()
    touched / total
  }

  test("z-ordered files are skippable on both dimensions; linear sort is not") {
    val li = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val zDir = s"$base/z"
    val linDir = s"$base/lin"

    Scale.clusterZOrder(li, zDir, "l_orderkey", "l_partkey", files = 16)
    // baseline: the classic single-column layout (range sort by orderkey)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(linDir)

    // layout change only: same rows either way
    assert(spark.read.parquet(zDir).count() == li.count())

    val zA = overlapFraction(zDir, "l_orderkey")
    val zB = overlapFraction(zDir, "l_partkey")
    val linB = overlapFraction(linDir, "l_partkey")

    // linear sort leaves the non-leading column unskippable (every file
    // spans ~the full partkey range); z-order must beat it decisively
    assert(linB > 0.9, s"fixture too easy: linear already prunes partkey ($linB)")
    assert(zB <= 0.5, s"z-order does not prune the second dim: $zB of files overlap")
    // and the leading dim keeps real pruning too (a 4x4-ish grid of 16
    // files leaves ~a quarter of files overlapping any point)
    assert(zA <= 0.5, s"z-order lost first-dim pruning: $zA of files overlap")
  }

  test("zValue interleaves bits (known-answer + monotone locality)") {
    val df = spark.range(1).select(
      Scale.zValue(lit(3L), lit(5L), bits = 4).as("z"), // a=0011, b=0101
      Scale.zValue(lit(0L), lit(1L), bits = 4).as("z01"),
      Scale.zValue(lit(1L), lit(0L), bits = 4).as("z10"))
    val r = df.head
    // interleave a=0011, b=0101 -> b3a3 b2a2 b1a1 b0a0 = 00 10 01 11 = 0x27
    assert(r.getLong(0) == 0x27L)
    assert(r.getLong(1) == 2L) // b bit goes to the odd (higher) position
    assert(r.getLong(2) == 1L)
  }
}
