package graft.operators

import org.apache.spark.ml.{Pipeline, PipelineModel}
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

  // fit-once-embed-many (S6 parity for M1, same policy as Ann's
  // quantizer): IDF's fit is an extra full corpus scan, so the fitted
  // PipelineModel is an index artifact, not part of any single query.
  // One fit per (session, dataset, dim) per JVM; with
  // spark.graft.index.dir set, one fit per CLUSTER, loaded thereafter
  // (reference persists the encoder output the same way,
  // app/generate_embeddings.py + vector_search.py:207-294).
  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), PipelineModel]

  private def sessionKey(s: SparkSession): String =
    System.identityHashCode(s).toString

  /** Fits performed by this JVM — EmbeddingSpec's no-refit probe. */
  private[graft] val fitCount = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Drop cached fitted embedding models (spec hook / M5 rebuild). */
  def clearCaches(): Unit = { modelCache.clear(); w2vCache.clear() }

  private def fitModel(docs: DataFrame, dim: Int): PipelineModel = {
    fitCount.incrementAndGet()
    new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("toks")
        .setPattern("\\s+").setToLowercase(true),
      new HashingTF().setInputCol("toks").setOutputCol("tf").setNumFeatures(dim),
      new IDF().setInputCol("tf").setOutputCol("tfidf"),
      new Normalizer().setInputCol("tfidf").setOutputCol("emb").setP(2.0)))
      .fit(docs)
  }

  /** The fitted model for (dataset key, dim): session cache first, then
    * the persisted artifact, then fit (and save if persistence is on).
    * `key=None` (anonymous frame) always fits — there is no sound cache
    * identity for arbitrary intermediate frames. */
  private def model(docs: DataFrame, key: Option[String], dim: Int): PipelineModel = {
    val s = docs.sparkSession
    key match {
      case Some(k) =>
        modelCache.getOrElseUpdate((sessionKey(s), s"$k@dim=$dim"),
          ModelStore.loadOrFit(s,
            ModelStore.artifactPath(s, "embed_pipeline", k, s"dim=$dim"),
            PipelineModel.load)(fitModel(docs, dim)))
      case None => fitModel(docs, dim)
    }
  }

  /** Fit-or-load + apply the embedding pipeline; (doc_id, embedding). */
  def embed(s: SparkSession, d: String): DataFrame =
    embedDocs(Tables.documents(s, d).select(col("doc_id"), col("text")), Some(d))

  /** Same, over any (doc_id, text) frame (the composed-pipeline entry).
    * Pass `cacheKey` when the frame is a deterministic function of a
    * dataset (e.g. a pipeline stage) so the fitted model is cached and
    * persisted under that identity. */
  def embedDocs(docs: DataFrame, cacheKey: Option[String] = None): DataFrame = {
    val d = GraftConf.embeddingDim(docs.sparkSession)
    model(docs, cacheKey, d).transform(docs)
      .select(col("doc_id"), vector_to_array(col("emb")).as("embedding"))
  }

  /** Alternative M1 backend: Word2Vec (dense learned vectors, the other
    * public-knowledge stand-in SURVEY §7.1 step 5 names). Seeded;
    * dimension matches the main pipeline so downstream similarity
    * operators are backend-agnostic. Fit parallelism is conf-gated
    * (GraftConf.w2vNumPartitions): the default 1 keeps the fit
    * bit-reproducible, >1 trades that for fit throughput on big corpora
    * (MLlib merges per-partition updates non-deterministically). */
  private val w2vCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.ml.feature.Word2VecModel]

  def embedWord2Vec(s: SparkSession, d: String): DataFrame = {
    val dim = GraftConf.embeddingDim(s)
    val parts = GraftConf.w2vNumPartitions(s)
    val docs = Tables.documents(s, d).select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("toks"))
    // same lifecycle as the main pipeline: session cache + persisted
    // artifact keyed by every fit parameter
    val model = w2vCache.getOrElseUpdate(
      (sessionKey(s), s"$d@dim=$dim,np=$parts"),
      ModelStore.loadOrFit(s,
        ModelStore.artifactPath(s, "w2v", d, s"dim=$dim,np=$parts"),
        org.apache.spark.ml.feature.Word2VecModel.load) {
        fitCount.incrementAndGet()
        new org.apache.spark.ml.feature.Word2Vec()
          .setInputCol("toks").setOutputCol("emb")
          .setVectorSize(dim).setMinCount(1).setSeed(42L)
          .setMaxIter(1).setNumPartitions(parts)
          .fit(docs)
      })
    model.transform(docs)
      .select(col("doc_id"), vector_to_array(col("emb")).as("embedding"))
  }

  /** q39: embedding-stage invariant profile — the vectors themselves
    * are murmur3-HashingTF outputs no SQL engine can replay, but the
    * pipeline's CONTRACT is fully checkable: every document embeds
    * (n_docs), every embedding is exactly conf-dim wide (n_dim_ok), and
    * every vector is unit-norm or exactly zero (n_norm_ok — the
    * Normalizer stage; zero when IDF kills every term of a doc). The
    * Spark side computes all three from the real vectors; the DuckDB
    * oracle states each must equal count(*) of documents — the
    * shape-invariant oracle round 6 asked for. Per-vector assertions
    * (determinism, no-refit, backend parity) stay in EmbeddingSpec. */
  val q39EmbedPipeline = GraftQuery(
    "q39_embed_pipeline",
    "M1; embedding stage invariants (vectors themselves are murmur3-hashed)",
    (s, d) => {
      val dim = GraftConf.embeddingDim(s)
      embed(s, d)
        .select(
          sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x * x)).as("norm"),
          size(col("embedding")).as("sz"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum((col("sz") === dim).cast("long")).as("n_dim_ok"),
          sum((abs(col("norm") - 1.0) < 1e-6 || col("norm") === 0.0)
            .cast("long")).as("n_norm_ok"))
    },
    Some("""SELECT count(*) AS n_docs, count(*) AS n_dim_ok,
      count(*) AS n_norm_ok FROM documents"""))

  def queries: Seq[GraftQuery] = Seq(q39EmbedPipeline)
}
