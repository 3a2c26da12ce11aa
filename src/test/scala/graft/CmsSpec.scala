package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Count-Min sketch invariants (q151/q154) the oracle equality does not
  * already pin: the one-sided error theorem over the FULL vocabulary
  * (the oracle probes only the top-15) and cell-relation additivity
  * (the property the streamed form's correctness rests on). */
class CmsSpec extends SparkSpec {
  private val depth = 4
  private val width = 1024

  private def estimates(sketch: org.apache.spark.sql.DataFrame,
      terms: org.apache.spark.sql.DataFrame) =
    terms
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn("cell", TextAnalysis.cmsCell(col("term"), col("j"), width))
      .join(sketch, Seq("j", "cell"))
      .groupBy(col("term"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))

  test("CMS never underestimates any term; overestimates stay within the n/w regime") {
    val docs = Tables.documents(spark, sfTiny)
    val sketch = TextAnalysis.cmsCells(docs, "text", depth, width)
    val tok = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val exact = tok.groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
    val n = tok.count()
    val rows = estimates(sketch, exact).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, ex, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= ex, s"CMS underestimated '$t': $est < $ex")
      assert(est - ex <= 5 * n / width,
        s"'$t' overestimate ${est - ex} exceeds 5n/w = ${5 * n / width}")
    }
  }

  test("CMS cell relation is additive: sketch(a ++ b) == sketch(a) + sketch(b)") {
    val docs = Tables.documents(spark, sfTiny)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    def cells(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.cmsCells(df, "text", depth, width)
    val merged = cells(a).unionByName(cells(b))
      .groupBy(col("j"), col("cell")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = cells(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == oneShot,
      s"additivity broken: ${(merged -- oneShot).size} extra, ${(oneShot -- merged).size} missing")
  }
}
