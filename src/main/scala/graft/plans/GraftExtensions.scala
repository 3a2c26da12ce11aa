package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{AdcDistance, CosineSimilarity, DotProduct, L2DistanceSq, L2NormalizeArray, MinhashSignature, NfcNormalize, NfkcNormalize, PqDistTable, PqEncode, ShingleArray, Simhash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst kernels as SQL functions, so `spark.sql("SELECT
  * graft_cosine(a.embedding, b.embedding) ...")` plans the same codegen'd
  * expressions the DataFrame API wrappers (VectorKernels/SketchFunctions)
  * use, and injects [[RangeJoinRule]] — the optimizer rule that rewrites
  * otherwise-cartesian point-in-interval joins into binned equi-joins
  * (inert until `spark.graft.rangejoin.binWidth` is set). Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * [[GraftExtensions.register]] on a live session.
  *
  * Every *operator* remains a composition Catalyst already plans well
  * (SURVEY §4 verdict) — the injected rule is a plan-shape rewrite, not
  * an operator: it exists so the O(N·M) nested-loop shape can never
  * reach execution on a naive range join, q88's manual binning made
  * automatic. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two numeric arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "squared L2 distance of two numeric arrays"),
      (args: Seq[Expression]) => L2DistanceSq(args(0), args(1))),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit simhash of a string array as [lo32, hi32]"),
      (args: Seq[Expression]) => Simhash64(args(0))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "minhash signature (md5) of a string array; arg2 = #hashes"),
      (args: Seq[Expression]) => MinhashSignature(args(0),
        args(1).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "Unicode NFC canonical composition of a string"),
      (args: Seq[Expression]) => NfcNormalize(args(0))),
    (FunctionIdentifier("graft_nfkc"),
      info("graft_nfkc", "Unicode NFKC compatibility composition; optional arg2 = casefold boolean"),
      (args: Seq[Expression]) => NfkcNormalize(args(0),
        args.length > 1 && args(1).eval() == true)),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "distinct n-word shingles of a string array; arg2 = n"),
      (args: Seq[Expression]) => ShingleArray(args(0),
        args(1).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("graft_pq_encode"),
      info("graft_pq_encode", "PQ codes of a vector; args = vec, codebook, m, k"),
      (args: Seq[Expression]) => PqEncode(args(0), args(1),
        args(2).eval().asInstanceOf[Number].intValue(),
        args(3).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("graft_pq_table"),
      info("graft_pq_table", "ADC distance table; args = query, codebook, m, k"),
      (args: Seq[Expression]) => PqDistTable(args(0), args(1),
        args(2).eval().asInstanceOf[Number].intValue(),
        args(3).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("graft_adc"),
      info("graft_adc", "ADC distance from a dist table and a code array"),
      (args: Seq[Expression]) => AdcDistance(args(0), args(1))),
    (FunctionIdentifier("graft_l2norm"),
      info("graft_l2norm", "L2-normalize a numeric array (zero vectors unchanged)"),
      (args: Seq[Expression]) => L2NormalizeArray(args(0), args(0))),
    // Spark's own runtime-filter Bloom pair, surfaced as user-callable SQL
    // (the analyzer wraps the bare AggregateFunction; might_contain's
    // filter arg must be a scalar subquery or constant — see
    // graft.functions.BloomFunctions for the DataFrame-side contract).
    (FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "Bloom filter over a LONG key column; optional args: estItems, numBits"),
      (args: Seq[Expression]) => args.length match {
        case 1 => new BloomFilterAggregate(args(0))
        case 2 => new BloomFilterAggregate(args(0), args(1))
        case _ => new BloomFilterAggregate(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "membership of a LONG key in a Bloom blob (scalar subquery/constant)"),
      (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1))))

  private def inject(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RangeJoinRule)
  }

  /** Register on an already-built session (test/REPL convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "scala_udf")
    }
    RangeJoinRule.install(spark)
  }
}
