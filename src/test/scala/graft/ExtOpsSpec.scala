package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Gates for the round-6 extension batch beyond their DuckDB oracles:
  * q138 delta-algebra generality (a DIFFERENT split must reproduce the
  * full view — the oracle only proves one split) and maintenance-leg
  * broadcast shape, q139 brute-force outlier equality, q140
  * non-vacuousness and support bounds. */
class ExtOpsSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.toList).toList

  test("q138: IVM algebra holds for an arbitrary other split") {
    val o = Tables.orders(spark, sfTiny).select(col("o_orderkey"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, sfTiny).select(col("l_orderkey"), col("l_quantity"))
    val keyEq = col("o_orderkey") === col("l_orderkey")
    def view(j: org.apache.spark.sql.DataFrame) = j.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    // split along different, co-prime residues than the registered query
    val (oldO, dO) = (o.filter(col("o_orderkey") % 3 =!= 0), o.filter(col("o_orderkey") % 3 === 0))
    val (oldL, dL) = (l.filter(col("l_orderkey") % 5 =!= 0), l.filter(col("l_orderkey") % 5 === 0))
    val maintained = view(oldO.join(oldL, keyEq))
      .unionByName(view(broadcast(dO).join(l, keyEq)
        .unionByName(oldO.join(broadcast(dL), keyEq))))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("n"), round(sum(col("qty")), 2).as("qty"))
      .orderBy(col("o_orderpriority"))
    val full = view(o.join(l, keyEq))
      .select(col("o_orderpriority"), col("n"), round(col("qty"), 2).as("qty"))
      .orderBy(col("o_orderpriority"))
    assert(canon(maintained) == canon(full),
      "delta-maintained view diverges from full recompute")
  }

  test("q138: both maintenance legs broadcast their delta side") {
    val df = Registry.byName("q138_ivm_join").run(spark, sfTiny)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 2,
      s"expected >= 2 BroadcastExchange (one per delta leg), got $broadcasts:\n$plan")
  }

  test("q139: outlier counts equal a driver-side brute force") {
    val got = TextAnalysis.groupOutliers(spark, sfTiny).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_outliers")).toMap
    val rows = Tables.documents(spark, sfTiny)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = rows.groupBy(_._1).map { case (lang, xs) =>
      val v = xs.map(_._2.toDouble)
      val n = v.length
      val mean = v.sum / n
      val sd = math.sqrt(v.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      lang -> v.count(x => math.abs(x - mean) > 2 * sd).toLong
    }
    assert(got == expect, s"outlier counts diverge: got $got expect $expect")
    assert(got.values.sum > 0, "vacuous: no outlier anywhere in the corpus")
  }

  test("q140: non-vacuous, canonical pair order, support bounded by min df") {
    val rows = TextAnalysis
      .cooccurrence(spark, sfTiny, minDfFrac = 0.005, maxDfFrac = 0.85, topK = 100)
      .collect()
    assert(rows.nonEmpty,
      "vacuous: df-cut selected no vocabulary — corpus assumption broke")
    val nDocs = Tables.documents(spark, sfTiny).count()
    rows.foreach { r =>
      assert(r.getAs[String]("t1") < r.getAs[String]("t2"), "pair not canonical")
      val nAb = r.getAs[Long]("n_ab")
      assert(nAb >= 1 && nAb <= nDocs, s"support $nAb out of range")
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }
}
