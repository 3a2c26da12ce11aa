package graft

import org.apache.spark.sql.SparkSession

/** Engine configuration surface — the Spark-native equivalent of the
  * reference's env-driven knobs (reference: .env:4-11 and app/main.py:31-58
  * read EMBEDDING_DIM / FAISS_INDEX_TYPE / SIMILARITY_THRESHOLD etc. from
  * the environment). Every knob is a SparkConf entry so it can be set per
  * session (`spark.conf.set(...)`), per job submit (`--conf`), or left at
  * the SURVEY default. Reads are dynamic (no caching) so a conf change
  * takes effect on the next operator call.
  */
object GraftConf {

  /** M1 embedding dimension. Reference default 384 (all-MiniLM-L6-v2,
    * app/main.py:43-46); the synthetic `embeddings` test table is 64-d but
    * that table carries its own dimension — this knob only drives the
    * text->embedding stage. */
  def embeddingDim(s: SparkSession): Int =
    s.conf.get("spark.graft.embedding.dim", "384").toInt

  /** IVF coarse-quantizer cell count (reference `IVF100,Flat`, .env:7 —
    * 100 cells at 90k rows; 12 matches the test corpus' natural cluster
    * count, ~sqrt-N-scaled at real data sizes). */
  def ivfCells(s: SparkSession): Int =
    s.conf.get("spark.graft.ivf.cells", "12").toInt

  /** IVF probe width: how many nearest cells each query searches. */
  def ivfNprobe(s: SparkSession): Int =
    s.conf.get("spark.graft.ivf.nprobe", "6").toInt

  /** BRP-LSH bucket length (dev sweep in tools.LshTune: 0.5 keeps recall
    * 0.993 on sf0.1 while cutting candidate volume ~15% vs 1.0). */
  def lshBucketLength(s: SparkSession): Double =
    s.conf.get("spark.graft.lsh.bucketLength", "0.5").toDouble

  /** BRP-LSH hash-table count (more tables = higher recall, more
    * candidates). */
  def lshNumTables(s: SparkSession): Int =
    s.conf.get("spark.graft.lsh.numHashTables", "5").toInt

  /** Directory for persisted ANN index models (S6 parity with the
    * reference's faiss.write_index/read_index round-trip,
    * app/vector_search.py:207-294). Unset = in-memory only (fit per JVM). */
  def indexDir(s: SparkSession): Option[String] =
    s.conf.getOption("spark.graft.index.dir")

  /** Corpus-size cutoff above which the composed pipeline's pair search
    * routes through the LSH candidate path instead of the exact join. */
  def exactPairCutoff(s: SparkSession): Long =
    s.conf.get("spark.graft.pairs.exactCutoff", "20000").toLong
}
