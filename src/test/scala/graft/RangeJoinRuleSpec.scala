package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRule

/** RangeJoinRule contract: a naive point-in-interval join (no equi key)
  * plans as a nested loop without the rule, becomes a binned equi-join
  * with it, and produces IDENTICAL rows either way — across numeric and
  * timestamp types, negative values, and bin-boundary points. Joins the
  * rule must not touch (equi-keyed, disabled-width) stay untouched. */
class RangeJoinRuleSpec extends SparkSpec {

  private def withWidth[A](w: Double)(f: => A): A = {
    RangeJoinRule.install(spark)
    spark.conf.set(RangeJoinRule.widthKey, w.toString)
    try f finally spark.conf.set(RangeJoinRule.widthKey, "0")
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // small but adversarial fixtures: negative values, points exactly on
  // bin edges, intervals of width 0, and an interval spanning many bins
  private def pts = {
    val ss = spark; import ss.implicits._
    Seq(-105.0, -100.0, -1.0, 0.0, 0.5, 10.0, 99.9, 100.0, 250.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("p_id", "x")
  }
  private def ivs = {
    val ss = spark; import ss.implicits._
    Seq((-110.0, -90.0), (-1.0, 1.0), (0.0, 0.0), (5.0, 205.0), (300.0, 310.0))
      .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iv_id", "lo", "hi")
  }
  private def naive = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))

  test("naive range join without the rule is a nested loop") {
    spark.conf.set(RangeJoinRule.widthKey, "0")
    assert(planOf(naive).contains("NestedLoop"),
      "fixture join unexpectedly not a nested loop — test premise broken")
  }

  test("rule rewrites to a binned equi-join with identical results") {
    val expected = naive.collect().map(_.toSeq).toSet
    withWidth(50.0) {
      val df = naive
      val plan = planOf(df)
      assert(!plan.contains("NestedLoop"), s"nested loop survived the rule:\n$plan")
      assert(plan.contains("__graft_bin"), s"bin key missing from plan:\n$plan")
      val got = df.collect().map(_.toSeq).toSet
      assert(got == expected,
        s"rewrite changed results: ${(got -- expected).size} extra, ${(expected -- got).size} missing")
    }
  }

  test("rule fires on ad-hoc spark.sql text too") {
    pts.createOrReplaceTempView("rj_pts")
    ivs.createOrReplaceTempView("rj_ivs")
    val sql = "SELECT p_id, iv_id FROM rj_pts JOIN rj_ivs ON x BETWEEN lo AND hi"
    val expected = spark.sql(sql).collect().map(_.toSeq).toSet
    withWidth(50.0) {
      val df = spark.sql(sql)
      assert(!planOf(df).contains("NestedLoop"))
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("strict bounds and reversed operand order still rewrite correctly") {
    // lo < x AND hi > x — point on the RIGHT side of each comparison.
    // NOTE: the DataFrame must be rebuilt inside withWidth — a collect()
    // memoizes QueryExecution, freezing the pre-rule plan.
    def j = pts.join(ivs, col("lo") < col("x") && col("hi") > col("x"))
    val expected = j.collect().map(_.toSeq).toSet
    withWidth(50.0) {
      val df = j
      assert(!planOf(df).contains("NestedLoop"))
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("timestamp point-in-interval rewrites with identical results") {
    val ss = spark; import ss.implicits._
    val evs = Seq(0L, 3600L, 86399L, 86400L, 172800L)
      .toDF("t").select(col("t"), timestamp_seconds(col("t")).as("ts"))
    val windows = Seq((0L, 86400L), (3600L, 7200L), (90000L, 100000L))
      .toDF("w_lo", "w_hi")
      .select(timestamp_seconds(col("w_lo")).as("w_start"),
        timestamp_seconds(col("w_hi")).as("w_end"))
    def j = evs.join(windows, col("ts") >= col("w_start") && col("ts") < col("w_end"))
    val expected = j.collect().map(_.toSeq).toSet
    withWidth(3600.0) {
      val df = j
      assert(!planOf(df).contains("NestedLoop"))
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("equi-keyed join with a range residual is left alone") {
    val ss = spark; import ss.implicits._
    val l = Seq((1L, 5.0), (2L, 50.0)).toDF("k", "x")
    val r = Seq((1L, 0.0, 10.0), (2L, 0.0, 10.0)).toDF("k2", "lo", "hi")
    val j = l.join(r, col("k") === col("k2") && col("x") >= col("lo") && col("x") <= col("hi"))
    withWidth(50.0) {
      assert(!planOf(j).contains("__graft_bin"),
        "rule rewrote a join Spark already hash-joins on its equi key")
      assert(j.count() == 1)
    }
  }

  test("outer range joins are left alone (bin fan-out would break null extension)") {
    def j = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"), "left")
    val expected = j.collect().map(_.toSeq).toSet
    withWidth(50.0) {
      val df = j
      assert(!planOf(df).contains("__graft_bin"))
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  // second interval relation for the overlap shape: offsets chosen so
  // some pairs share MANY bins (the duplicate hazard the first-shared-bin
  // guard exists for), some touch exactly at an endpoint, some miss
  private def ivsB = {
    val ss = spark; import ss.implicits._
    Seq((-100.0, -95.0), (-5.0, 0.5), (0.0, 50.0), (1.0, 204.0),
      (200.0, 210.0), (205.0, 300.0), (400.0, 410.0))
      .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("b_id", "b_lo", "b_hi")
  }
  private def naiveOverlap =
    ivs.join(ivsB, col("lo") <= col("b_hi") && col("b_lo") <= col("hi"))

  test("interval-overlap join rewrites to a binned equi-join: no nested loop, no duplicate pairs") {
    spark.conf.set(RangeJoinRule.widthKey, "0")
    val expected = naiveOverlap.collect().map(_.toSeq.toString).sorted
    assert(planOf(naiveOverlap).contains("NestedLoop"),
      "overlap fixture unexpectedly not a nested loop — test premise broken")
    withWidth(50.0) {
      val df = naiveOverlap
      val plan = planOf(df)
      assert(!plan.contains("NestedLoop"), s"nested loop survived the overlap arm:\n$plan")
      assert(plan.contains("__graft_bin_l") && plan.contains("__graft_bin_r"),
        s"bin keys missing from overlap plan:\n$plan")
      // MULTISET compare: the (5,205)x(1,204) pair shares 5 bins at
      // width 50 — any bin-dedup bug shows up as duplicated rows here
      val got = df.collect().map(_.toSeq.toString).sorted
      assert(got.sameElements(expected),
        s"overlap rewrite changed results: got ${got.length} rows vs ${expected.length}")
    }
  }

  test("overlap arm handles reversed spellings (>= with operands flipped)") {
    def j = ivs.join(ivsB, col("b_hi") >= col("lo") && col("hi") >= col("b_lo"))
    val expected = j.collect().map(_.toSeq.toString).sorted
    withWidth(50.0) {
      val df = j
      assert(!planOf(df).contains("NestedLoop"))
      assert(df.collect().map(_.toSeq.toString).sorted.sameElements(expected))
    }
  }

  test("null bounds and null points drop rows exactly like the naive join") {
    val ss = spark; import ss.implicits._
    val l = Seq(Some(5.0), None, Some(15.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("p_id", "x")
    val r = Seq((Some(0.0), Some(10.0)), (None, Some(20.0)), (Some(10.0), None))
      .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iv_id", "lo", "hi")
    def j = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    val expected = j.collect().map(_.toSeq).toSet
    withWidth(5.0) {
      val df = j
      assert(!planOf(df).contains("NestedLoop"))
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }
}
