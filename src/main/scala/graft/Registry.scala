package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operator/query.
  *
  * @param name   stable key (drives Verify parquet dump + oracle pairing)
  * @param doc    which SURVEY.md §2 operator IDs this covers
  * @param run    the Spark-side query builder (sfDir = parquet table dir)
  * @param oracle equivalent DuckDB ANSI SQL over the same tables; None for
  *               non-SQL-expressible ops (those get a rows-only check and a
  *               ScalaTest property test instead)
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Central registry: SparkEntry derives its `queries`/`oracleSql` maps from
  * here so a query and its oracle can never drift apart. */
object Registry {
  def all: Seq[GraftQuery] =
    operators.Relational.queries ++
      operators.Similarity.queries ++
      operators.Ann.queries ++
      operators.Nsw.queries ++
      operators.Embedding.queries ++
      operators.Graph.queries ++
      operators.Dedup.queries ++
      operators.QualityFilter.queries ++
      operators.LanguageModel.queries ++
      operators.Hybrid.queries ++
      operators.LateInteraction.queries ++
      operators.TextAnalysis.queries ++
      operators.QuantileSketch.queries ++
      operators.Multimodal.queries ++
      operators.Events.queries ++
      sources.Sources.queries ++
      plans.Scale.queries ++
      plans.CurationPipeline.queries

  def byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}
