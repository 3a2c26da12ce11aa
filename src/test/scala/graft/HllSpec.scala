package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** HyperLogLog register invariants (q167/q168) the oracle equality does
  * not already pin: estimate accuracy vs exact COUNT DISTINCT (the
  * sketch's reason to exist) and the two merge algebras the streamed
  * form's correctness rests on — max-merge composes (mergeability) AND
  * absorbs re-delivered inputs (idempotence, the property the CMS tier
  * lacks by design). */
class HllSpec extends SparkSpec {
  private val m = 256

  private def ranks(df: org.apache.spark.sql.DataFrame): Array[Int] =
    TextAnalysis.hllFill(spark, df, m)
      .collect().map(_.getInt(1))

  test("HLL estimate within 3 sigma (1.04/sqrt(m)) of exact distinct-term count") {
    val docs = Tables.documents(spark, sfSmall)
    val est = TextAnalysis.hllEstimate(
      ranks(TextAnalysis.hllRegisterDeltas(docs, "text", m)))
    val exact = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .agg(countDistinct(col("term"))).head().getLong(0)
    val relErr = math.abs(est - exact) / exact
    val bound = 3 * 1.04 / math.sqrt(m)
    assert(relErr <= bound,
      f"HLL estimate $est%.0f vs exact $exact: rel err $relErr%.4f > $bound%.4f")
  }

  test("register max-merge is mergeable AND idempotent under redelivery") {
    val docs = Tables.documents(spark, sfTiny)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    def regs(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.hllRegisterDeltas(df, "text", m)
    def merge(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.unionByName(y).groupBy(col("reg")).agg(max(col("max_rank")).as("max_rank"))
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val oneShot = toSet(regs(docs))
    // mergeability: sketch(a) max sketch(b) == sketch(a ++ b)
    assert(toSet(merge(regs(a), regs(b))) == oneShot)
    // idempotence: re-delivering half the corpus changes nothing —
    // the at-least-once story applyCmsBatch must document away, HLL
    // gets from the algebra
    assert(toSet(merge(regs(docs), regs(a))) == oneShot)
  }

  test("empty-register convention: rank 0 only for untouched registers, dense fill is m rows") {
    val filled = TextAnalysis.hllFill(spark,
      TextAnalysis.hllRegisterDeltas(Tables.documents(spark, sfTiny), "text", m), m)
    val rows = filled.collect()
    assert(rows.length == m)
    assert(rows.map(_.getLong(0)).toSeq == (0L until m).toSeq)
    // occupied registers carry rank >= 1 (rank = lzc + 1 is never 0)
    val occupied = TextAnalysis.hllRegisterDeltas(
      Tables.documents(spark, sfTiny), "text", m).collect()
    occupied.foreach(r => assert(r.getInt(1) >= 1))
  }
}
