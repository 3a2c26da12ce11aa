package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.streaming.StreamingJobs

/** Gates for the incremental Misra-Gries heavy-hitter path (q134 +
  * StreamingJobs.applyMgBatch/runStreamingHeavyHitters): exactness of
  * the final answer (must equal q132 — they share an oracle), the two
  * summary theorems the merge rule promises (state ≤ k counters;
  * undercount ≤ total/(k+1), hence no true heavy hitter ever dies),
  * batchId replay idempotency on the versioned state contract, and
  * drained-readStream state == sequential merge state. */
class MgStreamSpec extends SparkSpec {

  test("q134 incremental path returns exactly q132's answer") {
    val incr = TextAnalysis.streamedHeavyHitters(spark, sfTiny, denom = 1000, nBatches = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = TextAnalysis.heavyHitters(spark, sfTiny, denom = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(incr == batch, "incremental MG path diverged from the one-shot batch path")
    assert(batch.nonEmpty, "vacuous: corpus has no heavy hitters at 0.1%")
  }

  test("MG state stays <= k counters and undercounts by <= total/(k+1)") {
    val work = Files.createTempDirectory("graft_mg_bound").toString
    val docs = Tables.documents(spark, sfTiny)
    val k = 50 // tiny budget: forces many reductions
    (0 until 4).foreach { i =>
      assert(StreamingJobs.applyMgBatch(spark,
        docs.filter(pmod(col("doc_id"), lit(4)) === i), "text", i.toLong, k, work))
    }
    val state = StreamingJobs.latestAggState(spark, work).get._2.cache()
    val counters = state.filter(col("term").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counters.size <= k, s"state grew past the budget: ${counters.size} > $k")
    val total = state.agg(max(col("total_n"))).head().getLong(0)
    val truth = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(total == truth.values.sum, "running token total drifted")
    val maxErr = total / (k + 1)
    counters.foreach { case (t, est) =>
      val tc = truth.getOrElse(t, 0L)
      assert(est <= tc, s"'$t' overcounted: est $est > true $tc")
      assert(tc - est <= maxErr, s"'$t' undercount ${tc - est} > bound $maxErr")
    }
    // the catch theorem: every term with true count > total/(k+1) is alive
    truth.filter(_._2 > maxErr).keys.foreach { t =>
      assert(counters.contains(t), s"heavy term '$t' was evicted — bound violated")
    }
    state.unpersist()
  }

  test("applyMgBatch: replayed and stale batchIds are no-ops") {
    val work = Files.createTempDirectory("graft_mg_idem").toString
    val docs = Tables.documents(spark, sfTiny)
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 =!= 0)
    assert(StreamingJobs.applyMgBatch(spark, b0, "text", 0L, 100, work))
    assert(StreamingJobs.applyMgBatch(spark, b1, "text", 1L, 100, work))
    def snap() = StreamingJobs.latestAggState(spark, work).get._2
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val once = snap()
    assert(!StreamingJobs.applyMgBatch(spark, b1, "text", 1L, 100, work))
    assert(!StreamingJobs.applyMgBatch(spark, b0, "text", 0L, 100, work))
    assert(snap() == once, "replay changed the summary")
  }

  test("drained readStream state == sequential merge state") {
    val work = Files.createTempDirectory("graft_mg_stream").toString
    val docs = Tables.documents(spark, sfTiny).select(col("doc_id"), col("text"))
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$work/b1")
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.parquet(s"$work/b2")
    def firstPart(dir: String) =
      Files.list(Paths.get(dir)).filter(_.toString.endsWith(".parquet")).findFirst().get()
    val streamDir = Files.createTempDirectory("graft_mg_streamdir")
    val g1 = Files.copy(firstPart(s"$work/b1"), streamDir.resolve("b1.parquet"))
    val g2 = Files.copy(firstPart(s"$work/b2"), streamDir.resolve("b2.parquet"))
    g1.toFile.setLastModified(1000000L)
    g2.toFile.setLastModified(2000000L)
    StreamingJobs.runStreamingHeavyHitters(spark, streamDir.toString, "text",
      k = 100, stateDir = s"$work/state")
    def read(dir: String) = StreamingJobs.latestAggState(spark, dir).get._2
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val streamed = read(s"$work/state")
    val seqDir = s"$work/seq"
    assert(StreamingJobs.applyMgBatch(spark, docs.filter(col("doc_id") % 2 === 0), "text", 0L, 100, seqDir))
    assert(StreamingJobs.applyMgBatch(spark, docs.filter(col("doc_id") % 2 =!= 0), "text", 1L, 100, seqDir))
    assert(streamed == read(seqDir), "stream drain diverged from sequential merges")
  }
}
