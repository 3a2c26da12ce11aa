package graft

import org.apache.spark.sql.functions._
import graft.operators.LanguageModel

/** Gates for the q206/q207 LM perplexity tier beyond the DuckDB hash
  * match: the scores mean what they claim (the reference slice the
  * model was trained on must be the least surprising), the tercile
  * partition is balanced and monotone, and the integer-surprisal
  * pipeline is deterministic across runs. */
class LanguageModelSpec extends SparkSpec {

  test("train-slice docs score lower surprisal than out-of-slice docs") {
    val scored = LanguageModel.docSurprisal(spark, sfSmall)
      .join(Tables.documents(spark, sfSmall).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang") === "en")
      .agg(avg(col("mean_millibits")).as("avg_mb"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    val (en, rest) = (scored(true), scored(false))
    info(f"avg mean surprisal: en $en%.0f mb, non-en $rest%.0f mb")
    assert(en < rest,
      f"train slice should be least surprising: en $en%.0f >= rest $rest%.0f")
  }

  test("terciles are balanced within ties and monotone in surprisal") {
    val prof = LanguageModel.perplexityTerciles(spark, sfSmall)
      .groupBy(col("tercile"))
      .agg(sum(col("n_docs")).as("docs"),
        // per-tercile doc-weighted mean of the per-source integer means
        (sum(col("avg_millibits") * col("n_docs")) / sum(col("n_docs")))
          .as("avg_mb"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val m = prof.map(t => t._1 -> t).toMap
    val n = prof.map(_._2).sum
    prof.foreach { case (t, docs, avg) => info(f"$t%-6s $docs docs, $avg%.0f mb") }
    // value-comparison labeling can shift bucket sizes only by tie runs;
    // on this corpus ties at the cutoffs are sparse
    assert(prof.forall(t => t._2 > n / 4 && t._2 < n / 2),
      s"terciles badly unbalanced: $prof")
    assert(m("head")._3 < m("middle")._3 && m("middle")._3 < m("tail")._3,
      s"tercile means not monotone: $prof")
  }

  test("importance selection recovers the reference slice") {
    val sel = LanguageModel.q208ImportanceSelect.run(spark, sfSmall)
      .join(Tables.documents(spark, sfSmall).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
    val n = sel.count()
    val en = sel.filter(col("lang") === "en").count()
    info(s"top-$n importance draw: $en en")
    assert(en.toDouble / n >= 0.8,
      s"DSIR draw should be dominated by the target slice: $en/$n en")
  }

  test("integer-surprisal scoring is deterministic across runs") {
    val a = LanguageModel.docSurprisal(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    val b = LanguageModel.docSurprisal(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    assert(a == b, "repeat run diverged")
    assert(a.forall(_._2 > 0), "surprisal must be positive millibits")
  }
}
