package graft

import org.apache.spark.sql.functions._
import graft.operators.Hybrid

/** Gates for q210 hybrid retrieval beyond the DuckDB hash match: the
  * fusion actually fuses (both towers reach the fused top-k), the RRF
  * values are consistent with the reported tower ranks, and the run is
  * deterministic. */
class HybridSpec extends SparkSpec {

  test("both towers contribute to the fused top-k") {
    val r = Hybrid.rrfFusion(spark, sfSmall, k = 5, kCand = 10, queryMod = 10)
      .select(col("qid"), col("rank"), col("doc_id"),
        col("rrf"), col("r_lex"), col("r_vec"))
      .collect()
    val nLex = r.count(_.getInt(4) > 0)
    val nVec = r.count(_.getInt(5) > 0)
    info(s"${r.length} fused rows: $nLex lexical, $nVec vector")
    assert(nLex > r.length / 10, s"lexical tower starved: $nLex/${r.length}")
    assert(nVec > r.length / 10, s"vector tower starved: $nVec/${r.length}")
    // every reported rrf re-derives from its tower ranks (fixed order,
    // then the display rounding)
    r.foreach { row =>
      val (rl, rv) = (row.getInt(4), row.getInt(5))
      val expect = (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0)
      assert(math.abs(row.getDouble(3) - expect) < 1e-6,
        s"rrf mismatch at $row: expected $expect")
    }
  }

  test("fusion is deterministic across runs") {
    def run() = Hybrid.rrfFusion(spark, sfTiny, k = 5, kCand = 10, queryMod = 10)
      .collect().map(_.toSeq).toSeq
    assert(run() == run(), "repeat fusion diverged")
  }

  test("verify-rerank: capped-generation survivors carry their EXACT uncapped BM25 scores") {
    // the WAND verify step (VERDICT r11 #5): with the cap on and rerank
    // on (the default), every (qid, did) the capped lists generate must
    // score bit-identically to the uncapped relation — the cap may only
    // LOSE candidates, never mis-rank survivors. With rerank OFF the
    // tight cap must mis-score (that is the 0.38-agreement lever the
    // rerank exists to fix), and an over-wide cap must be a no-op under
    // both modes.
    def scored() = Hybrid.lexScoredCandidates(spark, sfTiny,
        queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def withConfs[A](kvs: (String, String)*)(body: => A): A = {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
    }
    val base = scored()
    assert(base.nonEmpty)
    val rerank = withConfs("spark.graft.hybrid.maxPostingsPerTerm" -> "5",
      "spark.graft.hybrid.capRerank" -> "true")(scored())
    assert(rerank.nonEmpty && rerank.size < base.size,
      "tight cap did not shrink the candidate relation")
    rerank.foreach { case (pair, ppm) =>
      assert(base.get(pair).contains(ppm),
        s"rerank survivor $pair scored $ppm, uncapped says ${base.get(pair)}")
    }
    val genOnly = withConfs("spark.graft.hybrid.maxPostingsPerTerm" -> "5",
      "spark.graft.hybrid.capRerank" -> "false")(scored())
    assert(genOnly.exists { case (pair, ppm) => !base.get(pair).contains(ppm) },
      "generate-only tight cap unexpectedly produced exact scores — the fixture cannot distinguish the modes")
    val wideRerank = withConfs("spark.graft.hybrid.maxPostingsPerTerm" -> "1000000",
      "spark.graft.hybrid.capRerank" -> "true")(scored())
    assert(wideRerank == base, "over-wide cap with rerank changed the relation")
  }
}
