package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's own runtime-filter Bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.*`, reused here as a
  * first-class operator building block instead of an optimizer
  * internality).
  *
  * Why this exists: a membership pre-filter is the one join shape where
  * the BIG side should not shuffle at all. `df.filter(mightContain(blob,
  * key))` is a scan-stage predicate — codegen'd, no Exchange — that
  * admits only true members plus an FPP-bounded sliver of false
  * positives; an exact equi-join afterwards removes the FPs while
  * touching only the sliver. Contrast the plain semi-join, which
  * shuffles every distinct key of the big side.
  *
  * `BloomFilterMightContain` requires its filter input to be a constant
  * or scalar subquery (it deserializes the filter ONCE per task, not per
  * row), so the DataFrame-side API takes the serialized filter bytes and
  * embeds them as a [[Literal]]: build the blob with [[bloomAgg]] (a
  * scalar aggregate → one small binary row), collect it, pass it to
  * [[mightContain]]. The blob is sized by the SMALL side (estItems keys
  * at ~8.4 bits/key default ≈ 1 MB), which is exactly what makes the
  * pattern broadcast-safe at any corpus scale. SQL users get the same
  * pair as `graft_bloom_agg` / `graft_bloom_contains` (scalar-subquery
  * form) via [[graft.plans.GraftExtensions]]. */
object BloomFunctions {

  /** Aggregate a LONG key column into a serialized Bloom filter (one
    * BINARY row). `estItems`/`numBits` size the filter: FPP ≈
    * (1 - e^(-k·n/m))^k with k optimal ≈ 0.7·m/n; the 1M/8M default of
    * Spark's runtime filters gives ~2% at full load. */
  def bloomAgg(key: Column, estItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(GraftColumnBridge.expression(key),
        Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Membership predicate against a collected filter blob: true for
    * every inserted key (no false negatives), true for ~FPP of the rest.
    * Plans as a codegen'd scan-stage filter — no shuffle, no join. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(Literal.create(filter, BinaryType),
        GraftColumnBridge.expression(key)))
}
