package graft.plans

import org.apache.spark.sql.DataFrame

/** Compute-spread for kernel-heavy O(N²)/O(Q·N) scorers (optimization
  * r17, guide §2.2/§6 + the round brief's "derive partitioning from the
  * runtime, not a constant").
  *
  * The exact similarity tiers stream one side of a nested-loop/self
  * join through a codegen'd vector kernel. Their input is a single
  * small parquet file at the test scale factors, and Spark's split
  * packing (the 4 MB `spark.sql.files.openCostInBytes` floor) turns a
  * sub-4 MB file into ONE scan task — so the whole N² kernel loop runs
  * on one core while the other 31 idle (measured: q163's edge build ran
  * its 9M-cosine stage as a single 1.7 s task; spread, the same stage
  * is 32 × ~60 ms). `spread` redistributes the streamed side across
  * `defaultParallelism` before the kernel join.
  *
  * Scale safety: every call site is an EXACT tier that the stats
  * routers only admit under the exact cutoffs (rows ≤ knnExactCutoff /
  * exactPairCutoff, bytes ≤ exactPairMaxBytes), so the repartition
  * always moves a bounded, pre-fan-out relation — ids plus one vector
  * per row, never the N² pair volume. The partition count derives from
  * the session's runtime parallelism, not a constant tuned for either
  * local mode or a cluster. Round-robin repartition keeps Spark's
  * sort-before-repartition determinism for retries; no downstream
  * consumer is order-sensitive (top-k heaps and ranks carry total tie
  * orders; sums are integer or rounded after per-row computation).
  */
object Spread {
  /** Unconditional redistribute to the session's parallelism — for the
    * router-capped exact tiers, where the relation is bounded by
    * construction and the shuffle is always cheap relative to the
    * kernel loop it parallelizes. */
  def apply(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Conditional variant for one-time BUILD paths over possibly
    * corpus-sized inputs (the stored-table cold builds): a relation
    * already at (or above) the session's parallelism passes through
    * untouched, so at cluster scale — where the scan is wide — no
    * corpus-sized text is ever re-shuffled. The partition-count check
    * plans the subtree once, which is why this form is reserved for
    * build-once paths (measured: sprinkling it through per-query
    * chains cost 1-3 s of driver planning per evaluation). */
  def ifNarrow(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
