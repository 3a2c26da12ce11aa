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
}
