package graft

import org.apache.spark.sql.functions._
import graft.plans.Scale

/** Gates for q171's rendezvous sharding beyond the DuckDB oracle: the
  * minimal-movement theorem (growing the topology moves keys ONLY to
  * the new shard) and the expected movement fraction — the properties
  * that make HRW re-sharding incremental where hash-mod is a full
  * rewrite. */
class ShardSpec extends SparkSpec {

  private def assign(shards: Int): Map[Long, Int] =
    Scale.rendezvousAssign(Tables.documents(spark, sfTiny), "doc_id", shards)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("growing S=8 -> 9 moves keys only to the NEW shard, ~1/9 of them") {
    val s8 = assign(8)
    val s9 = assign(9)
    assert(s8.keySet == s9.keySet)
    val moved = s8.keys.filter(k => s8(k) != s9(k)).toSeq
    moved.foreach { k =>
      assert(s9(k) == 8,
        s"key $k moved between OLD shards ${s8(k)} -> ${s9(k)}: HRW theorem violated")
    }
    val frac = moved.size.toDouble / s8.size
    // expected 1/9 ~ 0.111; generous band for a 500-doc corpus
    assert(frac > 0.03 && frac < 0.25, s"moved fraction $frac implausible for 1/9")
  }

  test("balance: every shard is populated and no shard exceeds 2x the fair share") {
    val s8 = assign(8)
    val sizes = s8.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 8, "some shard got no documents")
    val fair = s8.size / 8.0
    assert(sizes.max <= 2 * fair, s"max shard ${sizes.max} exceeds 2x fair share $fair")
  }

  test("hash-mod counterexample: S=8 -> 9 under mod sharding moves most keys") {
    val ids = Tables.documents(spark, sfTiny).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val movedMod = ids.count(id => id % 8 != id % 9).toDouble / ids.length
    // the contrast q171's Scaladoc claims: mod moves ~(S-1)/S, HRW ~1/(S+1)
    assert(movedMod > 0.7, s"mod-shard movement $movedMod unexpectedly low")
  }
}
