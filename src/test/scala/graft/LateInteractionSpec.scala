package graft

import org.apache.spark.sql.functions._
import graft.operators.LateInteraction

/** Gates for the late-interaction (MaxSim) tier beyond q234's DuckDB
  * hash match: the retrieval tier's returned scores are BIT-EQUAL to
  * the exact tier's (the rescore is the exact kernel — only recall may
  * differ), the recall floor holds at the shipped parameters, the
  * centroid arm A/Bs as the measured-weaker candidate generator on this
  * corpus, and MaxSim degenerates to plain cosine ranking at g=1. */
class LateInteractionSpec extends SparkSpec {

  private val (g, k, qmod, cands) = (4, 3, 10, 16)

  test("retrieval-tier scores are bit-equal to exact scores for returned pairs") {
    val exact = LateInteraction.maxSimExact(spark, sfSmall, g, k = 1000000, qmod)
      .select(col("qgid"), col("dgid"), col("score").as("exact_score"))
    val served = LateInteraction.maxSimRetrieve(spark, sfSmall, g, k, qmod, cands)
      .select(col("qgid"), col("dgid"), col("score"))
    val joined = served.join(exact, Seq("qgid", "dgid"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(3), s"served pair missing from exact scoring: $r")
      assert(r.getDouble(2) == r.getDouble(3),
        s"rescored MaxSim diverged from exact at $r")
    }
  }

  test("recall@k vs exact >= 0.9 at the shipped parameters (sf0.01)") {
    val r = LateInteraction.maxSimRecall(spark, sfSmall, g, k, qmod, cands)
      .collect()(0)
    info(s"recall row: n=${r.getLong(0)} hits=${r.getLong(1)} recall=${r.getDouble(2)}")
    assert(r.getDouble(2) >= 0.9,
      s"token-vector retrieval recall ${r.getDouble(2)} < 0.9")
  }

  test("centroid arm is the measured-weaker candidate generator on this corpus") {
    val vec = LateInteraction
      .maxSimRecall(spark, sfSmall, g, k, qmod, cands, mode = "vector")
      .collect()(0).getDouble(2)
    val cent = LateInteraction
      .maxSimRecall(spark, sfSmall, g, k, qmod, cands, mode = "centroid")
      .collect()(0).getDouble(2)
    info(s"recall@$k: vector=$vec centroid=$cent")
    // the A/B the Scaladoc claims: sequential vec_id groups have no
    // topical coherence, so the mean-centroid arm must trail the
    // member-vector arm here (on a coherent corpus it wouldn't)
    assert(cent <= vec, s"centroid arm ($cent) beat vector arm ($vec)?")
    assert(vec >= 0.9, s"vector arm recall $vec < 0.9")
  }

  test("IVF-routed tier: recall floor holds and rescored scores are bit-equal to exact") {
    val r = operators.LateInteraction.q239MaxSimIvfRecall.run(spark, sfSmall)
      .collect()(0)
    info(s"ivf-routed recall: n=${r.getLong(0)} hits=${r.getLong(1)} recall=${r.getDouble(2)}")
    assert(r.getDouble(2) >= 0.9, s"IVF-routed MaxSim recall ${r.getDouble(2)} < 0.9")
    val exact = LateInteraction.maxSimExact(spark, sfSmall, g, k = 1000000, qmod)
      .select(col("qgid"), col("dgid"), col("score").as("exact_score"))
    val served = LateInteraction.maxSimIvf(spark, sfSmall, g, k, qmod, cands)
      .select(col("qgid"), col("dgid"), col("score"))
    served.join(exact, Seq("qgid", "dgid"), "left").collect().foreach { row =>
      assert(!row.isNullAt(3) && row.getDouble(2) == row.getDouble(3),
        s"IVF-routed rescore diverged from exact at $row")
    }
  }

  test("NSW-routed tier: recall floor holds and rescored scores are bit-equal to exact") {
    // the second ANN arm (round 16): same gates as the IVF arm, through
    // the graph tier's frame-generic lookup — the tier-agnostic claim
    val r = operators.LateInteraction.q241MaxSimNswRecall.run(spark, sfSmall)
      .collect()(0)
    info(s"nsw-routed recall: n=${r.getLong(0)} hits=${r.getLong(1)} recall=${r.getDouble(2)}")
    assert(r.getDouble(2) >= 0.9, s"NSW-routed MaxSim recall ${r.getDouble(2)} < 0.9")
    val exact = LateInteraction.maxSimExact(spark, sfSmall, g, k = 1000000, qmod)
      .select(col("qgid"), col("dgid"), col("score").as("exact_score"))
    val served = LateInteraction.maxSimNsw(spark, sfSmall, g, k, qmod, cands)
      .select(col("qgid"), col("dgid"), col("score"))
    served.join(exact, Seq("qgid", "dgid"), "left").collect().foreach { row =>
      assert(!row.isNullAt(3) && row.getDouble(2) == row.getDouble(3),
        s"NSW-routed rescore diverged from exact at $row")
    }
  }

  test("g=1 MaxSim top-k == exact kNN ranking (tenth-bp rounded)") {
    // with one vector per group, score = round(cos·10⁴)/10⁴ and the
    // ranking matches q30's exact kNN up to rounding-equal ties; spot
    // the degenerate-case contract on the top-1 neighbor where the
    // rounded margin is decisive
    val ms = LateInteraction.maxSimExact(spark, sfTiny, g = 1, k = 1, queryMod = 10)
      .select(col("qgid"), col("dgid"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val knn = operators.Similarity.knnExact(spark, sfTiny, k = 1, queryMod = 10)
      .select(col("qid"), col("nid"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(ms.length == knn.length)
    ms.zip(knn).foreach { case ((q1, d1, s1), (q2, d2, s2)) =>
      assert(q1 == q2)
      if (math.abs(s1 - s2) > 1e-9) // distinct rounded scores ⇒ same pick
        assert(d1 == d2, s"g=1 MaxSim picked $d1 (score $s1), kNN picked $d2 ($s2)")
    }
  }

  test("maxsim conf knobs reach the registered queries (defaults = oracle shape)") {
    // defaults replay the oracle shape
    assert(GraftConf.maxsimGroup(spark) == 4 && GraftConf.maxsimTopK(spark) == 3
      && GraftConf.maxsimCands(spark) == 16)
    val defRows = operators.LateInteraction.q234MaxSimExact.run(spark, sfTiny)
      .collect()
    assert(defRows.map(_.getInt(1)).max == 3)
    try {
      spark.conf.set("spark.graft.maxsim.topk", "1")
      spark.conf.set("spark.graft.maxsim.group", "2")
      val r = operators.LateInteraction.q234MaxSimExact.run(spark, sfTiny)
        .collect()
      assert(r.map(_.getInt(1)).max == 1, "topk knob did not reach the query")
      // g=2 doubles the group count: 500 vecs -> 250 groups, gid%10==0 -> 25
      assert(r.map(_.getLong(0)).distinct.length == 25,
        s"group knob did not reach the query: ${r.map(_.getLong(0)).distinct.length} queries")
    } finally {
      spark.conf.unset("spark.graft.maxsim.topk")
      spark.conf.unset("spark.graft.maxsim.group")
    }
  }

  test("q237: NFC-keyed dedup unifies precomposed/decomposed variants") {
    val r = operators.Dedup.q237NfcDedup.run(spark, sfTiny)
      .select(col("doc_id"), col("group_size")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(row => (row.getLong(0), row.getString(1)))
    val withE = docs.filter(_._2.contains("e")).map(_._1).toSet
    val withoutE = docs.map(_._1).toSet -- withE
    // docs containing 'e': original is a singleton, the two variants
    // NFC-unify into one group of 2 kept at the precomposed id
    withE.foreach { id =>
      assert(r.contains((id, 1L)), s"original $id not a singleton")
      assert(r.contains((id + 1000000L, 2L)),
        s"variant group of $id not unified at the precomposed id")
      assert(!r.exists(_._1 == id + 2000000L),
        s"decomposed variant of $id survived as its own keeper")
    }
    // docs without 'e': all three copies identical -> one group of 3
    withoutE.foreach { id =>
      assert(r.contains((id, 3L)), s"e-free doc $id did not collapse to 3")
    }
    // and the raw-key counterfactual: md5 over the UNnormalized text
    // keeps every decomposed variant distinct — the failure NFC closes
    val rawKeepers = {
      import org.apache.spark.sql.expressions.Window
      val docsDf = Tables.documents(spark, sfTiny).select(col("doc_id"), col("text"))
      val pre = docsDf.select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "e", "\u00e9").as("text"))
      val dec = docsDf.select((col("doc_id") + 2000000L).as("doc_id"),
        regexp_replace(col("text"), "e", "e\u0301").as("text"))
      val w = Window.partitionBy(col("k")).orderBy(col("doc_id"))
      docsDf.unionByName(pre).unionByName(dec)
        .select(col("doc_id"), md5(col("text")).as("k"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .count()
    }
    assert(rawKeepers.toInt == r.length + withE.size,
      s"raw-key dedup should inflate keepers by exactly the ${withE.size} " +
        s"unmerged decomposed variants: raw=$rawKeepers nfc=${r.length}")
  }
}
