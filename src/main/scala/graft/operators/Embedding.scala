package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftConf, GraftQuery, Tables}

/** M1 — text -> embedding. The reference encodes with a sentence
  * transformer (app/generate_embeddings.py:25-50, all-MiniLM-L6-v2,
  * 384-d L2-normalized float32); a transformer needs an external model
  * server, so the engine's public-knowledge stand-in is the classic
  * sparse-projection pipeline: RegexTokenizer -> HashingTF -> IDF ->
  * Normalizer(p=2), dimension from GraftConf.embeddingDim (reference
  * default 384; specs pin 64 to match the synthetic embeddings table).
  * The contract the rest of the engine relies on is
  * identical: a deterministic, L2-normalized fixed-dim vector per
  * document, co-located with its key (no positional id_map — the
  * reference's fragile parallel-array design, app/vector_search.py:289-292,
  * is structurally impossible here).
  *
  * Not SQL-expressible (murmur3 feature hashing), so no DuckDB oracle;
  * EmbeddingSpec asserts unit norms, determinism, and that near-dup text
  * pairs embed closer than random pairs. */
object Embedding {

  /** Configured output dimension (spark.graft.embedding.dim). */
  def dim(s: SparkSession): Int = GraftConf.embeddingDim(s)

  /** Fit + apply the embedding pipeline; returns (doc_id, embedding). */
  def embed(s: SparkSession, d: String): DataFrame =
    embedDocs(Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** Same, over any (doc_id, text) frame (the composed-pipeline entry). */
  def embedDocs(docs: DataFrame): DataFrame = {
    val d = GraftConf.embeddingDim(docs.sparkSession)
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("toks")
        .setPattern("\\s+").setToLowercase(true),
      new HashingTF().setInputCol("toks").setOutputCol("tf").setNumFeatures(d),
      new IDF().setInputCol("tf").setOutputCol("tfidf"),
      new Normalizer().setInputCol("tfidf").setOutputCol("emb").setP(2.0)))
    pipe.fit(docs).transform(docs)
      .select(col("doc_id"), vector_to_array(col("emb")).as("embedding"))
  }

  /** Alternative M1 backend: Word2Vec (dense learned vectors, the other
    * public-knowledge stand-in SURVEY §7.1 step 5 names). Seeded and
    * single-partitioned for determinism; dimension matches the main
    * pipeline so downstream similarity operators are backend-agnostic. */
  def embedWord2Vec(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("toks"))
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("toks").setOutputCol("emb")
      .setVectorSize(GraftConf.embeddingDim(s)).setMinCount(1).setSeed(42L)
      .setMaxIter(1).setNumPartitions(1)
      .fit(docs)
    model.transform(docs)
      .select(col("doc_id"), vector_to_array(col("emb")).as("embedding"))
  }

  /** q39: embedding-stage output profile — per-doc norm and sparsity.
    * (rows-only check; EmbeddingSpec holds the real assertions). */
  val q39EmbedPipeline = GraftQuery(
    "q39_embed_pipeline",
    "M1; embedding stage (no SQL oracle: murmur3 HashingTF)",
    (s, d) =>
      embed(s, d)
        .select(col("doc_id"),
          round(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x * x)), 4).as("norm"),
          size(filter(col("embedding"), x => x =!= 0.0)).as("nnz"))
        .orderBy(col("doc_id")),
    None)

  def queries: Seq[GraftQuery] = Seq(q39EmbedPipeline)
}
