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

  test("q173 per-day grouped registers: each day's estimate tracks its exact distinct users") {
    val mw = 64
    val ev = Tables.eventsWithTs(spark, sfSmall).filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val regs = TextAnalysis.hllDeltasBy(ev, Seq("day"), col("user_id"), mw)
      .collect().groupBy(_.getAs[java.sql.Date]("day"))
    val exact = ev.groupBy(col("day")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("day") -> r.getLong(1)).toMap
    assert(regs.nonEmpty && regs.keySet == exact.keySet)
    val bound = 3 * 1.04 / math.sqrt(mw)
    regs.foreach { case (day, rows) =>
      val ranks = Array.fill(mw)(0)
      rows.foreach(r => ranks(r.getAs[Long]("reg").toInt) = r.getAs[Int]("max_rank"))
      val est = TextAnalysis.hllEstimate(ranks)
      val err = math.abs(est - exact(day)) / exact(day)
      assert(err <= bound, f"day $day: est $est%.0f vs ${exact(day)}, err $err%.3f > $bound%.3f")
    }
  }

  test("q175 inclusion-exclusion overlap estimate tracks the exact train/test term intersection") {
    val rows = TextAnalysis.splitOverlapRegisters(spark, sfSmall, m).collect()
    def ranks(side: String): Array[Int] = {
      val a = Array.fill(m)(0)
      rows.filter(_.getString(0) == side)
        .foreach(r => a(r.getAs[Long]("reg").toInt) = r.getAs[Int]("max_rank"))
      a
    }
    // union registers are the element-wise max of the sides (the algebra)
    val (tr, te, un) = (ranks("train"), ranks("test"), ranks("union"))
    (0 until m).foreach(i => assert(un(i) == math.max(tr(i), te(i))))
    val est = TextAnalysis.hllEstimate(tr) + TextAnalysis.hllEstimate(te) -
      TextAnalysis.hllEstimate(un)
    // exact intersection of the two sides' distinct shingle sets
    val bucket = conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 8), 16, 10).cast("long") % 100
    val terms = Tables.documents(spark, sfSmall)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.SketchFunctions.shingleArray(col("t"), 3)).as("term"))
      .withColumn("b", bucket)
    def side(p: org.apache.spark.sql.Column) =
      terms.filter(p).select(col("term")).distinct()
    val exact = side(col("b") < 80).intersect(side(col("b") >= 90)).count()
    // inclusion-exclusion compounds three estimators' errors; the
    // intersection here is large relative to both sides, so a 3x
    // single-sketch sigma stays meaningful
    val err = math.abs(est - exact) / exact
    assert(err <= 3 * 3 * 1.04 / math.sqrt(m),
      f"overlap est $est%.0f vs exact $exact, err $err%.3f")
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
