package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.VectorKernels.cosineFast

/** Late-interaction multi-vector retrieval (MaxSim).
  *
  * The reference scores a document with ONE vector per document
  * (vector_search.py: a single faiss embedding per job post). Modern
  * retrieval stacks that feed LLM training/eval pipelines keep SEVERAL
  * vectors per document (one per token/chunk) and score with late
  * interaction: score(q, d) = Σ_{u ∈ q} max_{v ∈ d} cos(u, v) — each
  * query vector picks its best-matching document vector, then the picks
  * sum (public pattern: Khattab & Zaharia, "ColBERT", SIGIR 2020; the
  * centroid-prefiltered serving shape is Santhanam et al., "PLAID",
  * CIKM 2022). This module expresses both tiers Spark-first over the
  * engine's embeddings table, with vector groups as multi-vector
  * documents (gid = vec_id div g — deterministic, so the DuckDB oracle
  * replays the same grouping).
  *
  * Numeric discipline (the q78 transcendental lesson, applied the q30
  * way): the per-(query-vector, doc-group) max cosine is computed by the
  * codegen double kernel and ROUNDED TO A TENTH-BASIS-POINT INTEGER
  * (round(mx·10⁴) — an integral double, so the long cast is exact);
  * the MaxSim sum then runs in exact integer arithmetic and the
  * presented score is the deterministic IEEE division sum/10⁴. Both
  * engines round the same double, sum the same integers, divide the
  * same way — no accumulated-float drift can reach the hash compare.
  *
  * Scale shape (100 TB):
  *  - the EXACT tier is the audit path: a Q·N kernel join exactly like
  *    q30's, grouped twice ((qgid, qvid, dgid) max, then (qgid, dgid)
  *    sum). Both aggregations key on qgid so the explicit fanout
  *    exchange of the hybrid tower applies unchanged past the cutoff.
  *  - the RETRIEVAL tier is the serving path: each query VECTOR
  *    retrieves its own top-C targets (member vectors, or per-group
  *    centroids as the cheaper N/g-target arm), the nominated groups'
  *    ≤ g·C·g² kernel evals rescore with EXACT MaxSim, and recall is
  *    the only approximation — reported as data by [[maxSimRecall]]
  *    the way q35/q37/q150 report theirs. The per-token lookup is the
  *    same (query vector → top-C by cosine) primitive the engine's ANN
  *    tiers already serve, so at scale it routes through IVF cells /
  *    NSW hops / LSH buckets (the knnAuto discipline) with this
  *    operator's shape unchanged.
  */
object LateInteraction {

  /** Embeddings with their multi-vector group id: gid = vec_id div g
    * (g consecutive vectors = one document; the tail group may be
    * smaller). Deterministic grouping keeps the oracle a faithful
    * replay — a real deployment would carry a (doc_id, vec_id) map. */
  private def grouped(s: SparkSession, d: String, g: Int): DataFrame =
    Tables.embeddings(s, d)
      .select(expr(s"vec_id div $g").as("gid"), col("vec_id"), col("embedding"))

  private def queryVecs(base: DataFrame, queryMod: Int): DataFrame =
    base.filter(col("gid") % queryMod === 0)
      .select(col("gid").as("qgid"), col("vec_id").as("qvid"),
        col("embedding").as("qvec"))

  /** (qgid, qvid, dgid, mxi): per query vector and candidate doc group,
    * the max cosine over the group's member vectors, as an exact
    * tenth-bp integer. `pairs` must carry qgid/qvid/qvec/dgid/dvec. */
  private def tokenMax(pairs: DataFrame): DataFrame =
    pairs
      .select(col("qgid"), col("qvid"), col("dgid"),
        cosineFast(col("qvec"), col("dvec")).as("sim"))
      .groupBy(col("qgid"), col("qvid"), col("dgid"))
      .agg(round(max(col("sim")) * 10000).cast("long").as("mxi"))

  /** (qgid, rank, dgid, score): integer-exact MaxSim sum, top-k per
    * query group (score desc, dgid asc — the engine's universal tie
    * discipline). */
  private def topkByMaxSim(tok: DataFrame, k: Int): DataFrame = {
    val scored = tok.groupBy(col("qgid"), col("dgid"))
      .agg(sum(col("mxi")).as("ssum"))
    val w = Window.partitionBy(col("qgid"))
      .orderBy(col("ssum").desc, col("dgid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qgid"), col("rank"), col("dgid"),
        (col("ssum") / lit(10000.0)).as("score"))
      .orderBy(col("qgid"), col("rank"))
  }

  /** Exact MaxSim top-k — the audit tier (and the oracle-replayable
    * one, like q30 for single-vector search). */
  def maxSimExact(s: SparkSession, d: String, g: Int, k: Int,
      queryMod: Int): DataFrame = {
    // spread ONLY the exact Q·N tier (graft.plans.Spread doc): a tiny
    // parquet input scans as one task and serializes the kernel loop.
    // The approximate tiers are deliberately NOT spread — their work is
    // already bounded, and the centroid arm's avg() partials must keep
    // their scan grouping (a repartition reorders double summation)
    val base = graft.plans.Spread(grouped(s, d, g))
    val q = queryVecs(base, queryMod)
    val c = base.select(col("gid").as("dgid"), col("embedding").as("dvec"))
    topkByMaxSim(tokenMax(q.join(c, col("qgid") =!= col("dgid"))), k)
  }

  /** Per-group centroids (gid, cvec ARRAY<DOUBLE>): element-wise mean of
    * the member vectors. posexplode → (gid, pos) avg → re-assemble keeps
    * the build one shuffle keyed by gid whatever g is; the result is
    * N/g rows of dim doubles. */
  private[graft] def centroidsOf(base: DataFrame): DataFrame =
    base
      .select(col("gid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("gid"), col("pos")).agg(avg(col("v")).as("cv"))
      .groupBy(col("gid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("cvec"))

  private[graft] def centroids(s: SparkSession, d: String, g: Int): DataFrame =
    centroidsOf(grouped(s, d, g))

  /** Candidate (qgid, dgid) pairs by TOKEN-LEVEL retrieval — each query
    * vector retrieves its own top-`cands` by cosine, a group is a
    * candidate if ANY query vector nominated it (≤ g·cands groups per
    * query after the distinct). Two arms:
    *
    *  - `"vector"`: retrieve against the member VECTORS and map each
    *    hit to its group — ColBERT's own serving shape (per-token ANN
    *    lookup, then doc-level rescoring). Measured recall@3 vs exact
    *    on the sf0.01 corpus: 0.97 at cands=16, 1.00 at 32.
    *  - `"centroid"`: retrieve against the per-group CENTROIDS — the
    *    cheaper first pass (N/g targets instead of N). On THIS corpus
    *    it is the measured-failure arm (recall@3 0.54 at the same
    *    budget): the synthetic groups are sequential vec_id slices with
    *    no topical coherence, so the mean washes out exactly the
    *    single-strong-token matches MaxSim rewards. Kept as the A/B
    *    negative control (LateInteractionSpec) and because on a REAL
    *    corpus — where a document's vectors are correlated — it is the
    *    right first tier (PLAID's k-means centroids).
    *
    * Query-LEVEL centroid ranking (one centroid per query, one ranked
    * list) measured worse still (recall@3 0.44) and is not kept. */
  private def tokenCandidates(base: DataFrame, q: DataFrame, g: Int,
      cands: Int, mode: String): DataFrame = {
    val targets = mode match {
      case "vector" =>
        base.select(col("gid").as("dgid"), col("vec_id").as("tid"),
          col("embedding").as("tvec"))
      case "centroid" =>
        centroidsOf(base).select(col("gid").as("dgid"),
          col("gid").as("tid"), col("cvec").as("tvec"))
      case other => throw new IllegalArgumentException(
        s"maxsim candidate mode must be vector|centroid, got $other")
    }
    // no broadcast hint: like knnExact's Q·N kernel join, the planner
    // broadcasts the SMALLER side (the sampled query vectors — at scale
    // the corpus-sized target relation streams, queries broadcast).
    // Top-C per query vector via the BOUNDED TopKAggregator heap, not a
    // window: row_number() over (qgid, qvid) must shuffle and SORT the
    // whole Q·N scored relation, which made this tier SLOWER than the
    // exact tier it prefilters for (10× rehearsal: 63 s vs 31 s); the
    // heap is partial-aggregatable, so each map task ships ≤ C rows per
    // query vector and the big sort never exists. Same (csim desc,
    // tid asc) tie discipline as the window form. The group id folds
    // back out of the retrieved target id (vector mode: tid div g;
    // centroid mode: tid IS the gid), so the heap carries one long.
    val topc = udaf(new graft.functions.TopKAggregator(cands))
    q.join(targets, col("qgid") =!= col("dgid"))
      .select(col("qgid"), col("qvid"), col("tid"),
        cosineFast(col("qvec"), col("tvec")).as("csim"))
      .groupBy(col("qgid"), col("qvid"))
      .agg(topc(col("csim"), col("tid")).as("top"))
      .select(col("qgid"), explode(col("top._2")).as("tid"))
      .select(col("qgid"),
        (if (mode == "vector") expr(s"tid div $g") else col("tid")).as("dgid"))
      .distinct()
  }

  /** Retrieval-tier MaxSim — the serving path: token-level candidate
    * generation (see [[tokenCandidates]]), then EXACT MaxSim rescoring
    * over only the nominated groups. Same output shape and tie
    * discipline as [[maxSimExact]]; returned scores are bit-identical
    * to the exact tier's for the pairs it returns (the rescore IS the
    * exact kernel) — recall is the only approximation and ships as data
    * via [[maxSimRecall]]. At this SF the per-token retrieval is the
    * exact kernel join; at 100 TB it is precisely the lookup the
    * engine's ANN tiers already serve (IVF cells / NSW hops / LSH
    * buckets over the same embeddings relation — the knnAuto routing),
    * so the tier substitutes without changing this operator's shape. */
  def maxSimRetrieve(s: SparkSession, d: String, g: Int, k: Int,
      queryMod: Int, cands: Int, mode: String = "vector"): DataFrame = {
    val base = grouped(s, d, g)
    val q = queryVecs(base, queryMod)
    rescoreTopK(base, q, tokenCandidates(base, q, g, cands, mode), k)
  }

  /** The shared rescore tail of every retrieval tier: EXACT MaxSim over
    * the nominated (qgid, dgid) candidate set, top-k. Work is bounded
    * by the nomination set whatever tier produced it — the structural
    * reason the routing arms are interchangeable. */
  private def rescoreTopK(base: DataFrame, q: DataFrame, cand: DataFrame,
      k: Int): DataFrame = {
    val dv = base.select(col("gid").as("dgid"), col("embedding").as("dvec"))
    topkByMaxSim(tokenMax(cand.join(q, Seq("qgid")).join(dv, Seq("dgid"))), k)
  }

  /** IVF-routed MaxSim — the claim "at scale the per-token lookup is
    * the primitive the ANN tiers already serve" as CODE: each query
    * vector retrieves its top candidates through the engine's fitted
    * IVF index ([[Ann.searchWithCentroids]] — codegen centroid ranking,
    * nprobe-cell equi-join probe, bounded top-k heap; nothing
    * corpus-sized is scanned or sorted), hits map to their groups, and
    * the nominated groups rescore with EXACT MaxSim as in every other
    * tier. The per-token ask is padded by g so the post-hoc self-group
    * exclusion cannot starve the candidate budget. Index fit/load rides
    * the ivfIndex fit-once-query-many cache and the ModelStore
    * artifact, like q34/q156. */
  def maxSimIvf(s: SparkSession, d: String, g: Int, k: Int,
      queryMod: Int, cands: Int): DataFrame = {
    val base = grouped(s, d, g)
    val q = queryVecs(base, queryMod)
    val tokens = q.select(col("qvid").as("qid"),
      transform(col("qvec"), x => x.cast("double")).as("qvec"))
    val (assigned, centroidDf) = Ann.ivfIndex(s, d)
    val cents = centroidDf.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val hits = Ann.searchWithCentroids(tokens, assigned, cents,
      k = cands + g, nprobe = graft.GraftConf.ivfNprobe(s))
    rescoreTopK(base, q, groupsOfHits(hits, g), k)
  }

  /** Map per-token ANN hits (qid, nid) to their nominated (qgid, dgid)
    * candidate groups, self-group excluded. */
  private def groupsOfHits(hits: DataFrame, g: Int): DataFrame =
    hits
      .select(expr(s"qid div $g").as("qgid"), expr(s"nid div $g").as("dgid"))
      .filter(col("qgid") =!= col("dgid"))
      .distinct()

  /** NSW-routed MaxSim — the SECOND ANN arm (round 16, VERDICT r15
    * Next #6): the same per-token top-C lookup routed through the
    * sharded NSW graph tier ([[Nsw.searchFrame]] — the graph artifact,
    * broadcast query scatter, per-shard beam search, bounded merge)
    * instead of IVF cells. Everything after the lookup is the shared
    * [[rescoreTopK]]/[[groupsOfHits]] tail, which is the point: the
    * "ANN tiers serve the per-token lookup" claim is structural —
    * tier-agnostic — not an IVF-specific integration. Recall ships as
    * data (q241); scores are bit-equal to exact for returned pairs by
    * construction (the rescore IS the exact kernel). */
  def maxSimNsw(s: SparkSession, d: String, g: Int, k: Int,
      queryMod: Int, cands: Int): DataFrame = {
    val base = grouped(s, d, g)
    val q = queryVecs(base, queryMod)
    val tokens = q.select(col("qvid").as("qid"),
      transform(col("qvec"), x => x.cast("double")).as("qvec"))
    val hits = Nsw.searchFrame(s, d, tokens, k = cands + g)
    rescoreTopK(base, q, groupsOfHits(hits, g), k)
  }

  /** Recall@k of the centroid tier vs the exact tier, shipped as data
    * (the q35/q37/q150 convention). */
  def maxSimRecall(s: SparkSession, d: String, g: Int, k: Int,
      queryMod: Int, cands: Int, mode: String = "vector"): DataFrame =
    Ann.recallVsExact(
      maxSimRetrieve(s, d, g, k, queryMod, cands, mode)
        .select(col("qgid").as("qid"), col("dgid").as("nid")),
      maxSimExact(s, d, g, k, queryMod)
        .select(col("qgid").as("qid"), col("dgid").as("nid")))

  // ---------------------------------------------------------------------
  // registry
  // ---------------------------------------------------------------------

  // The registered shapes read GraftConf (spark.graft.maxsim.{group,
  // topk,cands}) — the minhash-knob convention: the DEFAULTS are what
  // the q234 oracle replays, ad-hoc sessions may retune. queryMod stays
  // fixed: it is the test-corpus query sampling, not an engine knob.
  private val QMOD = 10

  // The oracle replays the conf DEFAULTS, interpolated from the same
  // GraftConf constants the readers above resolve (single source of
  // truth — a default change moves both sides of the pair at once;
  // GraftConfSpec asserts the SQL and the conf defaults agree).
  //
  // Known hash-compare boundary (ADVICE r15, accepted as the q30
  // convention): round(max(sim)·10⁴) assumes cosineFast and DuckDB's
  // list_cosine_similarity round the same double to the same integer.
  // A cosine within ~1 ulp of a 0.5e-4 boundary (different sqrt/
  // accumulation order across engines) could flip one mxi and with it a
  // rank. Never observed on the test corpus; if a future q234 oracle
  // mismatch appears with rows/schema matching and a near-tie in the
  // diff, classify here first (diagnostic: |frac − 0.5| of sim·10⁴ for
  // the disputed pair) before suspecting the kernel.
  val q234MaxSimExact = GraftQuery(
    "q234_maxsim_exact",
    "J1 ext: late-interaction multi-vector retrieval (exact MaxSim top-k)",
    (s, d) => maxSimExact(s, d, graft.GraftConf.maxsimGroup(s),
      graft.GraftConf.maxsimTopK(s), QMOD),
    Some(s"""WITH base AS (
        SELECT vec_id // ${graft.GraftConf.MaxsimGroupDefault} AS gid, vec_id,
          CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings),
      q AS (SELECT gid AS qgid, vec_id AS qvid, emb AS qvec
            FROM base WHERE gid % $QMOD = 0),
      tok AS (
        SELECT qgid, qvid, d.gid AS dgid,
          CAST(round(max(list_cosine_similarity(qvec, d.emb)) * 10000)
            AS BIGINT) AS mxi
        FROM q, base d WHERE qgid <> d.gid
        GROUP BY qgid, qvid, d.gid),
      scored AS (
        SELECT qgid, dgid, sum(mxi) AS ssum FROM tok GROUP BY qgid, dgid),
      ranked AS (
        SELECT qgid, dgid, ssum,
          row_number() OVER (PARTITION BY qgid ORDER BY ssum DESC, dgid)
            AS rank
        FROM scored)
      SELECT qgid, rank, dgid, CAST(ssum AS DOUBLE) / 10000.0 AS score
      FROM ranked WHERE rank <= ${graft.GraftConf.MaxsimTopKDefault}
      ORDER BY qgid, rank"""))

  /** No oracle: the candidate cut is approximate BY DESIGN (recall is
    * the trade) — gated in LateInteractionSpec (returned scores
    * bit-equal to exact for returned pairs; recall floor; centroid-arm
    * A/B) and by q236's recall-as-data. */
  val q235MaxSimRetrieve = GraftQuery(
    "q235_maxsim_retrieve",
    "J1 ext: token-retrieval MaxSim (late-interaction serving tier)",
    (s, d) => maxSimRetrieve(s, d, graft.GraftConf.maxsimGroup(s),
      graft.GraftConf.maxsimTopK(s), QMOD, graft.GraftConf.maxsimCands(s)),
    None)

  val q236MaxSimRecall = GraftQuery(
    "q236_maxsim_recall",
    "J1 ext: retrieval-tier recall@k vs exact MaxSim, as data",
    (s, d) => maxSimRecall(s, d, graft.GraftConf.maxsimGroup(s),
      graft.GraftConf.maxsimTopK(s), QMOD, graft.GraftConf.maxsimCands(s)),
    None)

  val q238MaxSimIvf = GraftQuery(
    "q238_maxsim_ivf",
    "J1c × J1 ext: MaxSim with IVF-routed token retrieval (the scale tier)",
    (s, d) => maxSimIvf(s, d, graft.GraftConf.maxsimGroup(s),
      graft.GraftConf.maxsimTopK(s), QMOD, graft.GraftConf.maxsimCands(s)),
    None)

  val q239MaxSimIvfRecall = GraftQuery(
    "q239_maxsim_ivf_recall",
    "J1 ext: IVF-routed MaxSim recall@k vs exact, as data",
    (s, d) => Ann.recallVsExact(
      maxSimIvf(s, d, graft.GraftConf.maxsimGroup(s),
        graft.GraftConf.maxsimTopK(s), QMOD, graft.GraftConf.maxsimCands(s))
        .select(col("qgid").as("qid"), col("dgid").as("nid")),
      maxSimExact(s, d, graft.GraftConf.maxsimGroup(s),
        graft.GraftConf.maxsimTopK(s), QMOD)
        .select(col("qgid").as("qid"), col("dgid").as("nid"))),
    None)

  val q240MaxSimNsw = GraftQuery(
    "q240_maxsim_nsw",
    "J1 ext × graph tier: MaxSim with NSW-routed token retrieval (second ANN arm)",
    (s, d) => maxSimNsw(s, d, graft.GraftConf.maxsimGroup(s),
      graft.GraftConf.maxsimTopK(s), QMOD, graft.GraftConf.maxsimCands(s)),
    None)

  val q241MaxSimNswRecall = GraftQuery(
    "q241_maxsim_nsw_recall",
    "J1 ext: NSW-routed MaxSim recall@k vs exact, as data",
    (s, d) => Ann.recallVsExact(
      maxSimNsw(s, d, graft.GraftConf.maxsimGroup(s),
        graft.GraftConf.maxsimTopK(s), QMOD, graft.GraftConf.maxsimCands(s))
        .select(col("qgid").as("qid"), col("dgid").as("nid")),
      maxSimExact(s, d, graft.GraftConf.maxsimGroup(s),
        graft.GraftConf.maxsimTopK(s), QMOD)
        .select(col("qgid").as("qid"), col("dgid").as("nid"))),
    None)

  def queries: Seq[GraftQuery] =
    Seq(q234MaxSimExact, q235MaxSimRetrieve, q236MaxSimRecall,
      q238MaxSimIvf, q239MaxSimIvfRecall, q240MaxSimNsw, q241MaxSimNswRecall)
}
