package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftConf, GraftQuery, Tables}

/** Model-based corpus quality filter — the classifier step every public
  * LLM data pipeline runs after the heuristic gates (CCNet's fastText
  * LM-vs-crawl classifier; the LLaMA/GPT-3 "quality classifier trained
  * on a trusted subset" — public pattern, no external model needed):
  * distill a cheap supervised model from weak labels and score the
  * WHOLE corpus with it, so the per-document cost at 100 TB is one
  * dot product instead of the full heuristic battery, and the score is
  * smooth (rankable / threshold-tunable) instead of a hard boolean.
  *
  * Weak labels come from the engine's own q41 heuristic keep flag
  * (length + stopword + Gopher repetition gates); features are the M1
  * TF-IDF embedding (fit-once, [[Embedding]]'s cache + persistence);
  * the model is a seeded MLlib LogisticRegression, persisted via
  * [[ModelStore]] like every other fitted artifact (S6). Train/holdout
  * split is deterministic (doc_id mod), so the holdout AUC gate in
  * QualityFilterSpec is reproducible.
  *
  * Not SQL-expressible (feature hashing + LBFGS fit), so no DuckDB
  * oracle; QualityFilterSpec gates holdout AUC, agreement with the
  * heuristic labels, load-not-refit, and determinism.
  */
object QualityFilter {

  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), LogisticRegressionModel]

  private def sessionKey(s: SparkSession): String =
    System.identityHashCode(s).toString

  /** Fits performed by this JVM — QualityFilterSpec's no-refit probe. */
  private[graft] val fitCount = new java.util.concurrent.atomic.AtomicInteger(0)

  def clearCaches(): Unit = modelCache.clear()

  /** Hold out every 5th doc: trained on the rest, the AUC gate reads
    * only these. Deterministic, replayable in the spec. */
  private val HoldoutMod = 5

  /** (doc_id, features vector, label) — weak label = q41's heuristic
    * keep flag, features = the M1 embedding. */
  private[graft] def labeledFeatures(s: SparkSession, d: String): DataFrame = {
    val labels = TextAnalysis.q41QualityScore.run(s, d)
      .select(col("doc_id"), col("keep").cast("double").as("label"))
    Embedding.embed(s, d)
      .select(col("doc_id"), array_to_vector(col("embedding")).as("features"))
      .join(labels, Seq("doc_id"))
  }

  /** The fitted classifier for (dataset, dim): session cache, then the
    * persisted artifact, then a seeded fit on the training split. */
  private[graft] def model(s: SparkSession, d: String): LogisticRegressionModel = {
    val dim = GraftConf.embeddingDim(s)
    modelCache.getOrElseUpdate((sessionKey(s), s"$d@dim=$dim"),
      ModelStore.loadOrFit(s,
        ModelStore.artifactPath(s, "quality_lr", d, s"dim=$dim"),
        LogisticRegressionModel.load) {
        fitCount.incrementAndGet()
        new LogisticRegression()
          .setMaxIter(100).setRegParam(0.01).setStandardization(true)
          .fit(labeledFeatures(s, d).filter(col("doc_id") % HoldoutMod =!= 0))
      })
  }

  /** Score every document: (doc_id, label, p_keep, keep). p_keep is the
    * classifier's probability of the positive class; keep applies the
    * conf'd threshold (spark.graft.quality.minScore). */
  def scored(s: SparkSession, d: String): DataFrame = {
    val thr = GraftConf.qualityMinScore(s)
    model(s, d).transform(labeledFeatures(s, d))
      .select(col("doc_id"), col("label").cast("int").as("label"),
        round(element_at(vector_to_array(col("probability")), 2), 4).as("p_keep"))
      .withColumn("keep", (col("p_keep") >= thr).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** q131: classifier-based quality scores over the corpus (no SQL
    * oracle: hashed features + LBFGS fit are procedural; spec-gated). */
  val q131QualityClassifier = GraftQuery(
    "q131_quality_classifier",
    "M ext; distilled quality classifier (CCNet-style; spec-gated AUC)",
    (s, d) => scored(s, d),
    None)

  def queries: Seq[GraftQuery] = Seq(q131QualityClassifier)
}
