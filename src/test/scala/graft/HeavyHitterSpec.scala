package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Gates for q132 (exact heavy hitters via Misra-Gries candidates):
  * exactness against an in-test brute force at several thresholds, the
  * adversarial worst case for the pigeonhole bound (a barely-qualifying
  * term spread as thin as possible across partitions), and the
  * broadcast shape of the candidate-only exact pass. */
class HeavyHitterSpec extends SparkSpec {

  private def brute(d: String, denom: Int): Set[(String, Long)] = {
    val tok = Tables.documents(spark, d)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val total = tok.count()
    val minCount = (total + denom - 1) / denom
    tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("exact vs brute force at several thresholds on the real corpus") {
    for (denom <- Seq(200, 1000, 5000)) {
      val hh = TextAnalysis.heavyHitters(spark, sfTiny, denom)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val exact = brute(sfTiny, denom)
      assert(hh == exact,
        s"denom=$denom: ${(exact -- hh).size} missed, ${(hh -- exact).size} spurious")
    }
  }

  test("adversarial spread: a barely-qualifying term thin across all partitions") {
    // 64 docs of unique filler + exactly 2 'hotterm' each: the hot term's
    // local count is minimal everywhere, the worst case for the
    // per-partition catch bound; it must still be found, and nothing else.
    val docs = (0 until 64).map { p =>
      val filler = (0 until 400).map(j => s"u${p}x$j")
      (p.toLong, (filler ++ Seq("hotterm", "hotterm")).mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_hh").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .repartition(16) // force the spread across many partitions
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // total = 64*402 = 25728; denom 1000 -> minCount 26; hotterm = 128
    val hh = TextAnalysis.heavyHitters(spark, dir, denom = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(hh == List(("hotterm", 128L)),
      s"expected exactly [(hotterm,128)], got $hh")
  }

  test("exact pass broadcasts the candidate set (no vocabulary-wide shuffle)") {
    val plan = TextAnalysis.heavyHitters(spark, sfTiny, 1000)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate join is not broadcast:\n$plan")
  }
}
