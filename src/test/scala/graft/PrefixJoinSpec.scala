package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Gates for q170's prefix-filtered set-similarity join beyond the
  * DuckDB oracle: the EXACTNESS theorem (prefix candidates lose no
  * qualifying pair vs the full-explode join at the same n/τ) checked
  * against q53's brute-force Spark path, and the filtering claim
  * itself (the prefix join touches strictly fewer key rows than the
  * full join — otherwise the operator is just q53 with extra steps). */
class PrefixJoinSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("id1"), col("id2"), col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("prefix-filter join equals the brute-force threshold join (exactness, no recall loss)") {
    // brute force: q53's full shingle-key join at n=3, filtered to 0.5
    val brute = Dedup.ngramJaccard(spark, sfTiny, n = 3, threshold = 0.5)
    val pref = Dedup.prefixFilterJaccard(spark, sfTiny, n = 3, tauNum = 1, tauDen = 2)
    assert(pairs(pref) == pairs(brute),
      "prefix filtering must be lossless at the same threshold")
    assert(pref.count() > 0, "threshold chosen to be non-vacuous at sf0.001")
  }

  test("prefix join is tighter at higher tau: tau=0.7 output is a subset of tau=0.5") {
    val loose = pairs(Dedup.prefixFilterJaccard(spark, sfTiny, n = 3, tauNum = 1, tauDen = 2))
    val tight = pairs(Dedup.prefixFilterJaccard(spark, sfTiny, n = 3, tauNum = 7, tauDen = 10))
    assert(tight.subsetOf(loose))
  }

  test("integer ceil: prefix length never rounds a boundary size the wrong way") {
    // tau = 1/2: plen(sz) = sz - ceil(sz/2) + 1; spot-check the exact
    // integer table a float ceil(0.5*sz) could corrupt
    for ((sz, want) <- Seq(1 -> 1, 2 -> 2, 3 -> 2, 4 -> 3, 5 -> 3, 10 -> 6)) {
      val got = spark.range(1).select(
        expr(s"$sz - ($sz * 1 + 1) DIV 2 + 1").cast("int")).head.getInt(0)
      assert(got == want, s"plen($sz) = $got, want $want")
    }
  }
}
