package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftConf, GraftQuery, Tables}

/** Graph-ANN tier: sharded navigable-small-world (NSW) search — the
  * structural counterpart of the reference's HNSW index strings
  * (app/main.py:47 `HNSW32`; factory app/vector_search.py:40-47), which
  * COVERAGE §2.9 previously mapped by role only.
  *
  * HNSW's sequential greedy graph descent is not join-expressible, so
  * this is the one operator family on the (d) tier of the build plan —
  * `mapPartitions` — and it uses the same distribution shape every
  * production graph-ANN deployment uses (Vespa, OpenSearch, Milvus):
  * SHARD the corpus, build an independent in-memory proximity graph per
  * shard, scatter each query to every shard, gather and merge per-shard
  * top-k. Per-shard state is O(|shard| · 2M) adjacency — bounded by
  * choosing shard count, never by corpus size — and shards build and
  * search with zero cross-shard traffic; the only shuffle in the plan is
  * the one hash-repartition that forms the shards, and the merge is a
  * per-query window over |queries| · shards · k rows.
  *
  * The graph is single-layer NSW (Malkov et al.'s precursor; public
  * algorithm): insert points in vec_id order, connect each to its M
  * nearest among already-inserted nodes found by greedy best-first
  * search, keep adjacency bidirectional and pruned to the closest 2M.
  * Every insertion links to an earlier node, so each shard's graph is
  * connected by construction (NswSpec asserts it). Layering's log-like
  * entry shortcut matters at millions of points per shard; at that size
  * a real deployment also raises efSearch — both are conf knobs here.
  *
  * Queries are collected and broadcast: the scatter side of
  * scatter-gather, identical in role (and size discipline) to the build
  * side of a broadcast join — bounded by the query batch, never the
  * corpus. Deterministic end to end: no RNG, ties broken by node id.
  * No SQL oracle (graph construction is procedural); q128 reports
  * recall@k vs the exact kernel join as data, gated >= 0.9 in NswSpec.
  */
object Nsw {

  /** Insert points `from` onward into an NSW graph whose nodes before
    * `from` are already linked (empty `from`=1 state = fresh build;
    * reconstructed adjacency = incremental add). Insertion order is
    * array order; nodes at/after `from` must have empty adjacency. */
  private[graft] def insertPoints(vecs: Array[Array[Double]],
      norms: Array[Double], adj: Array[mutable.ArrayBuffer[Int]],
      from: Int, m: Int, efConstruct: Int): Unit = {
    // symmetric shrink: an edge is dropped on BOTH endpoints, keeping
    // the adjacency an undirected graph (NswSpec asserts bidirectional)
    def prune(i: Int): Unit = if (adj(i).length > 2 * m) {
      val ranked = adj(i).toArray.distinct
        .map(j => (j, cosine(vecs(i), norms(i), vecs(j), norms(j))))
        .sortBy { case (j, s) => (-s, j) }.map(_._1)
      val (kept, dropped) = ranked.splitAt(2 * m)
      adj(i).clear(); adj(i) ++= kept
      dropped.foreach(x => adj(x) -= i)
    }
    var i = math.max(from, 1)
    while (i < vecs.length) {
      val nn = searchGraph(adj, vecs, norms, vecs(i), norms(i),
        ef = efConstruct, k = m)
      nn.foreach { case (j, _) =>
        adj(i) += j; adj(j) += i; prune(j)
      }
      prune(i)
      i += 1
    }
  }

  /** Build the NSW adjacency for `vecs` (insertion order = array order).
    * Exposed for NswSpec's structural assertions. */
  private[graft] def buildGraph(vecs: Array[Array[Double]], m: Int,
      efConstruct: Int): Array[Array[Int]] = {
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    val adj = Array.fill(vecs.length)(mutable.ArrayBuffer.empty[Int])
    insertPoints(vecs, norms, adj, from = 1, m = m, efConstruct = efConstruct)
    adj.map(_.toArray)
  }

  private def cosine(a: Array[Double], na: Double, b: Array[Double],
      nb: Double): Double = {
    if (na == 0.0 || nb == 0.0) return 0.0
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s / (na * nb)
  }

  /** Greedy best-first search over the current graph from entry node 0:
    * expand the best unexpanded candidate, stop when it can no longer
    * improve the ef-bounded result set. Returns the k best (node, sim),
    * sim descending, id-tiebroken — deterministic. */
  private[graft] def searchGraph(adj: IndexedSeq[mutable.ArrayBuffer[Int]],
      vecs: Array[Array[Double]], norms: Array[Double],
      q: Array[Double], qn: Double, ef: Int, k: Int): Array[(Int, Double)] = {
    if (adj.isEmpty) return Array.empty
    val visited = new java.util.BitSet(vecs.length)
    // candidates: best sim first; results: worst sim first (bounded ef)
    val cand = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by { case (s, j) => (s, -j) })
    val result = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by { case (s, j) => (-s, j) })
    val s0 = cosine(q, qn, vecs(0), norms(0))
    visited.set(0); cand.enqueue((s0, 0)); result.enqueue((s0, 0))
    while (cand.nonEmpty) {
      val (cs, cj) = cand.dequeue()
      if (result.size >= ef && cs < result.head._1) { cand.clear() }
      else adj(cj).foreach { nb =>
        if (!visited.get(nb)) {
          visited.set(nb)
          val s = cosine(q, qn, vecs(nb), norms(nb))
          if (result.size < ef || s > result.head._1) {
            cand.enqueue((s, nb)); result.enqueue((s, nb))
            if (result.size > ef) result.dequeue()
          }
        }
      }
    }
    result.toArray.map { case (s, j) => (j, s) }
      .sortBy { case (j, s) => (-s, j) }.take(k)
  }

  /** Artifact slot for the persisted shard graphs, if
    * `spark.graft.index.dir` is set (S6, same mechanics as [[Ann]]). */
  private[graft] def graphArtifactPath(s: SparkSession, d: String): Option[String] =
    ModelStore.artifactPath(s, "nsw_graph", d,
      s"shards=${GraftConf.nswShards(s)},m=${GraftConf.nswM(s)},efc=${GraftConf.nswEfConstruct(s)}")

  /** Build the sharded graphs as a self-contained relation
    * (shard, vec_id, vec, nbrs by GLOBAL vec_id) — the Spark-native form
    * of a written faiss index, vectors included, so a later JVM searches
    * straight from the artifact without touching the corpus table.
    * Shard membership is pmod(hash(vec_id), shards): deterministic, so
    * the persisted graph and a fresh build are the same graph. */
  private def buildGraphsDF(s: SparkSession, d: String): DataFrame =
    graphsForFrame(Tables.embeddings(s, d))

  /** Build the sharded graphs over any (vec_id, embedding) frame. */
  private[graft] def graphsForFrame(frame: DataFrame): DataFrame = {
    val s = frame.sparkSession
    val shards = GraftConf.nswShards(s)
    val m = GraftConf.nswM(s)
    val efC = GraftConf.nswEfConstruct(s)
    import s.implicits._
    frame
      .select(pmod(hash(col("vec_id")), lit(shards)).as("shard"), col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      .repartition(shards, col("shard"))
      .as[(Int, Long, Seq[Double])]
      .mapPartitions { it =>
        // a partition may hold several shard values (hash collisions on
        // the shard column): group first, one independent graph per shard
        it.toArray.groupBy(_._1).iterator.flatMap { case (shard, rows) =>
          val pts = rows.map { case (_, id, v) => (id, v.toArray) }.sortBy(_._1)
          val ids = pts.map(_._1)
          val vecs = pts.map(_._2)
          val adj = buildGraph(vecs, m, efC)
          ids.indices.iterator.map { i =>
            (shard, ids(i), pts(i)._2.toSeq, adj(i).map(ids(_)).toSeq)
          }
        }
      }
      .toDF("shard", "vec_id", "vec", "nbrs")
  }

  /** M3 "add" for the graph tier: insert a batch of new vectors into
    * existing shard graphs without rebuilding them. Each new point hashes
    * to its shard, reaches that shard's partition alongside the stored
    * graph rows, and is inserted by the same greedy routine the build
    * uses — per-shard work is O(|batch ∩ shard| · ef · degree), never
    * O(|shard|²). Batch vec_ids must be disjoint from the index's.
    *
    * Exactness property (NswSpec): the NSW build inserts in vec_id
    * order, so when every batch id sorts after every indexed id the
    * incremental result is BIT-IDENTICAL to a full rebuild over the
    * union — the base insertions replay exactly, then the batch
    * insertions continue the same sequence. Out-of-order ids still
    * produce a valid graph (insertion order is then index-then-batch),
    * just not the rebuild-identical one. */
  private[graft] def addToGraphs(graphs: DataFrame, batch: DataFrame): DataFrame = {
    val s = graphs.sparkSession
    val shards = GraftConf.nswShards(s)
    val m = GraftConf.nswM(s)
    val efC = GraftConf.nswEfConstruct(s)
    import s.implicits._
    val newRows = batch
      .select(pmod(hash(col("vec_id")), lit(shards)).as("shard"), col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"),
        lit(null).cast("array<bigint>").as("nbrs"))
    graphs.select(col("shard"), col("vec_id"), col("vec"), col("nbrs"))
      .unionByName(newRows)
      .repartition(shards, col("shard"))
      .as[(Int, Long, Seq[Double], Seq[Long])]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (shard, rows) =>
          val (oldR, newR) = rows.partition(_._4 != null)
          val pts = oldR.sortBy(_._2) ++ newR.sortBy(_._2)
          val realIds = pts.map(_._2)
          val pos = realIds.zipWithIndex.toMap
          val vecs = pts.map(_._3.toArray)
          val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
          val adj = Array.fill(pts.length)(mutable.ArrayBuffer.empty[Int])
          var i = 0
          while (i < oldR.length) {
            adj(i) ++= pts(i)._4.flatMap(pos.get)
            i += 1
          }
          insertPoints(vecs, norms, adj,
            from = if (oldR.isEmpty) 1 else oldR.length, m = m, efConstruct = efC)
          realIds.indices.iterator.map { i =>
            (shard, realIds(i), pts(i)._3, adj(i).map(realIds(_)).toSeq)
          }
        }
      }
      .toDF("shard", "vec_id", "vec", "nbrs")
  }

  /** The shard graphs: loaded from the artifact when persistence is on
    * and a committed (_SUCCESS) copy exists — build-once/search-many —
    * else built (and saved when persistence is on). */
  private[graft] def shardGraphs(s: SparkSession, d: String): DataFrame =
    graphArtifactPath(s, d) match {
      case Some(p) =>
        val marker = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
        val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker))
          buildGraphsDF(s, d).write.mode("overwrite").parquet(p)
        s.read.parquet(p)
      case None => buildGraphsDF(s, d)
    }

  /** k-NN via sharded NSW: hash-shard the corpus, NSW graph per shard,
    * every query searches every shard, global per-query top-k merge.
    * Output shape identical to q30/q34 (qid, rank, nid, sim). */
  def nswKnn(s: SparkSession, d: String, k: Int, queryMod: Int): DataFrame =
    searchFrame(s, d,
      Tables.embeddings(s, d)
        .filter(col("vec_id") % queryMod === 0)
        .select(col("vec_id").as("qid"),
          transform(col("embedding"), x => x.cast("double")).as("qvec")),
      k)

  /** k-NN of an ARBITRARY bounded (qid, qvec ARRAY&lt;DOUBLE&gt;) query
    * frame through the sharded NSW graphs — the frame-generic serving
    * entry (round 16, the [[Ann.searchWithCentroids]] counterpart for
    * the graph tier), so other operators can use NSW as their per-token
    * lookup primitive (the MaxSim NSW routing arm, q240). The query
    * batch must be broadcast-bounded: its collect plays exactly the
    * role of a broadcast join's build side, scattered to every shard's
    * graph. A query id equal to a corpus id is treated as the self
    * point and excluded, as in the sampled form. */
  private[graft] def searchFrame(s: SparkSession, d: String,
      queries: DataFrame, k: Int): DataFrame = {
    val shards = GraftConf.nswShards(s)
    val efS = GraftConf.nswEfSearch(s)
    val queryArr = queries.select(col("qid"), col("qvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val bc = s.sparkContext.broadcast(queryArr)
    import s.implicits._
    val perShard = shardGraphs(s, d)
      .select(col("shard"), col("vec_id"), col("vec"), col("nbrs"))
      .repartition(shards, col("shard"))
      .as[(Int, Long, Seq[Double], Seq[Long])]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (_, rows) =>
          val pts = rows.map { case (_, id, v, nb) => (id, v.toArray, nb) }
            .sortBy(_._1)
          val ids = pts.map(_._1)
          val pos = ids.zipWithIndex.toMap
          val vecs = pts.map(_._2)
          val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
          val adj: IndexedSeq[mutable.ArrayBuffer[Int]] =
            pts.map(p => mutable.ArrayBuffer(p._3.flatMap(pos.get): _*)).toIndexedSeq
          bc.value.iterator.flatMap { case (qid, qv) =>
            val qn = math.sqrt(qv.map(x => x * x).sum)
            // k+1 then drop self: the query sample is part of the corpus
            searchGraph(adj, vecs, norms, qv, qn, ef = efS, k = k + 1)
              .collect { case (j, sim) if ids(j) != qid => (qid, ids(j), sim) }
              .take(k)
          }
        }
      }
      .toDF("qid", "nid", "sim")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    perShard.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("sim"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q127: sharded-NSW k-NN, same query shape as exact q30 / IVF q34. */
  val q127NswKnn = GraftQuery(
    "q127_nsw_knn",
    "M2-M4 graph tier; sharded NSW k-NN (no SQL oracle: procedural graph)",
    (s, d) => nswKnn(s, d, k = 2, queryMod = 10),
    None)

  /** q128: NSW recall@2 vs the exact join (>= 0.9 gated in NswSpec;
    * reported here as data, like q35/q67). */
  val q128NswRecall = GraftQuery(
    "q128_nsw_recall",
    "M4 quality gate; J1a vs graph tier",
    (s, d) => Ann.recallVsExact(
      nswKnn(s, d, k = 2, queryMod = 10),
      Similarity.knnExact(s, d, k = 2, queryMod = 10)),
    None)

  def queries: Seq[GraftQuery] = Seq(q127NswKnn, q128NswRecall)
}
