package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftConf, GraftQuery, Tables}
import graft.functions.VectorFunctions._
import graft.functions.VectorKernels._

/** Vector similarity operators — the reference's headline capability
  * (Faiss k-NN self-search + threshold near-dup pairs,
  * reference: app/vector_search.py:143-205, app/main.py:201-280).
  *
  * Physical strategies (SURVEY §2.6 J1):
  *  - exact: block-join + window top-k (here); O(Q·N), correct baseline
  *  - IVF:   KMeans centroid prefilter (graft.operators.Ivf) — the 100 TB
  *           scale path: prunes the candidate set to nprobe partitions
  *  - LSH:   random-hyperplane bucketing (graft.operators.Lsh)
  */
object Similarity {

  /** Embeddings with a unit-normalized vector column.
    * Normalizing once up front turns cosine into a plain dot product in the
    * join — the same trick the reference relies on (MiniLM output is
    * L2-normalized; app/evaluation.py:24-26 docstring). */
  def normalized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), l2Normalize(col("embedding")).as("vec"))

  /** Exact k-NN join: every query vector against the full corpus, per-query
    * top-k by cosine. Query side is a deterministic systematic sample so the
    * DuckDB oracle can replay it. At cluster scale the corpus side is the
    * broadcast candidate (or IVF-pruned); queries stream. */
  def knnExact(s: SparkSession, d: String, k: Int, queryMod: Int): DataFrame = {
    // Raw float arrays + the codegen'd cosine kernel: cosine(raw) ==
    // dot(normalized) but skips the per-row normalize pass and stays in
    // whole-stage codegen for the O(Q·N) inner loop.
    // spread the corpus side across the session's cores before the Q·N
    // kernel join: a tiny parquet input scans as ONE task and would run
    // the whole scoring loop single-threaded (graft.plans.Spread doc)
    val base = graft.plans.Spread(Tables.embeddings(s, d))
    val q = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = base.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineFast(col("qvec"), col("nvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("sim"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** All near-duplicate pairs at cosine >= threshold, canonicalized
    * (id1 < id2) and deduplicated — the reference's end product
    * (app/main.py:252-263: threshold 0.90, canonical pair set, sort).
    * Label equi-prefilter plays the role of the IVF cell: vectors produced
    * from the same cluster are the only plausible near-dups, so the join is
    * an equi-join, not a cross join. The unfiltered exact variant is
    * `entry`'s flagship on sf0.001. */
  def nearDupPairs(s: SparkSession, d: String, threshold: Double,
      prefilterLabel: Boolean): DataFrame = {
    val base = graft.plans.Spread(Tables.embeddings(s, d))
    val a = base.select(col("vec_id").as("id1"), col("label").as("lab1"), col("embedding").as("v1"))
    val b = base.select(col("vec_id").as("id2"), col("label").as("lab2"), col("embedding").as("v2"))
    val joinCond =
      if (prefilterLabel) col("id1") < col("id2") && col("lab1") === col("lab2")
      else col("id1") < col("id2")
    a.join(b, joinCond)
      .select(col("id1"), col("id2"), cosineFast(col("v1"), col("v2")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), round(col("sim"), 4).as("sim"))
      .orderBy(col("sim").desc, col("id1"), col("id2"))
  }

  /** Scale-aware near-dup pair search: exact all-pairs only while BOTH
    * stats say it is safe — row count under GraftConf.exactPairCutoff
    * AND on-disk corpus bytes under GraftConf.exactPairMaxBytes (a small
    * corpus of very wide vectors still makes N² kernel work the wrong
    * plan) — otherwise LSH bucket-join candidates + exact verify. The
    * same trade the reference makes choosing an ANN index over brute
    * force (app/main.py:201-280; .env:7 `IVF100,Flat`). Stats come from
    * the session-cached plans.TableStats relation (parquet footers +
    * filesystem summary — metadata, never a data scan), and the routing
    * decision is logged so a plan flip at scale is visible in the driver
    * log, not silent. */
  /** The routing decision behind [[nearDupPairsAuto]], as a pure
    * function of corpus stats + conf so specs can exercise every branch
    * without running a query. Tiers, cheapest-admissible first:
    *
    *  - `exact`: rows AND on-disk bytes under the exact cutoffs — N²
    *    kernel work fits, and the labeled baseline is the best answer.
    *  - `ivf`: the largest corpora (rows over ivfPairRowCutoff). The
    *    stored index is one cell id per vector (vs numHashTables rows
    *    per vector for any LSH tier), candidate volume Σ|cell|² is
    *    tunable via ncells, and the quantizer artifact persists.
    *  - `multiprobe-lsh`: loose thresholds (under loosePairThreshold),
    *    where boundary-split pairs dominate the misses — ±1-bucket
    *    probing recovers them at the single-probe index size.
    *  - `lsh`: the default mid-size, tight-threshold tier.
    */
  private[graft] def pairTier(s: SparkSession, rows: Long, bytes: Long,
      threshold: Double): String =
    if (rows <= GraftConf.exactPairCutoff(s) && bytes <= GraftConf.exactPairMaxBytes(s)) "exact"
    else if (rows > GraftConf.ivfPairRowCutoff(s)) "ivf"
    else if (threshold < GraftConf.loosePairThreshold(s)) "multiprobe-lsh"
    else "lsh"

  def nearDupPairsAuto(s: SparkSession, d: String, threshold: Double): DataFrame = {
    val st = graft.plans.TableStats.embeddings(s, d)
    val tier = pairTier(s, st.rows, st.bytes, threshold)
    println(s"[graft] nearDupPairsAuto: rows=${st.rows} " +
      s"(exactCutoff ${GraftConf.exactPairCutoff(s)}, " +
      s"ivfCutoff ${GraftConf.ivfPairRowCutoff(s)}), bytes=${st.bytes} " +
      s"(cutoff ${GraftConf.exactPairMaxBytes(s)}), " +
      s"threshold=$threshold (loose<${GraftConf.loosePairThreshold(s)}), " +
      s"avgRowBytes=${st.avgRowBytes.toLong} -> $tier")
    tier match {
      case "exact" => nearDupPairs(s, d, threshold, prefilterLabel = false)
      case "ivf" => Ann.ivfNearDup(s, d, threshold, GraftConf.ivfNprobe(s))
      case "multiprobe-lsh" => Ann.lshMultiProbeNearDup(s, d, threshold)
      case "lsh" => Ann.lshNearDup(s, d, threshold)
    }
  }

  /** The routing decision behind [[knnAuto]], pure function of stats +
    * conf (the pairTier discipline applied to search): the exact scorer
    * IS the right plan while Q·N kernel work fits — it is also the
    * oracle-replayable tier — and past the cutoff the measured
    * sub-linear tier is NSW (AnnScaleRehearsal: 0.97 s at 10× where
    * exact takes 34.9 s and √N-IVF 3.9 s; graph hops grow ~log N, scans
    * grow ~N). `spark.graft.knn.tier` pins a branch — ivf for
    * memory-constrained executors (no resident shard graphs), exact for
    * audits. */
  private[graft] def knnTier(s: SparkSession, rows: Long, bytes: Long): String =
    GraftConf.knnTier(s) match {
      case "auto" =>
        if (rows <= GraftConf.knnExactCutoff(s) &&
          bytes <= GraftConf.exactPairMaxBytes(s)) "exact"
        else "nsw"
      case t => t
    }

  /** Stats-routed k-NN search over the embeddings table — one entry
    * point, the tier picked the way [[nearDupPairsAuto]] picks pair
    * tiers. Every branch emits the identical (qid, rank, nid, sim)
    * shape with the same tie discipline (sim DESC, nid ASC). */
  def knnAuto(s: SparkSession, d: String, k: Int, queryMod: Int): DataFrame = {
    val st = graft.plans.TableStats.embeddings(s, d)
    val tier = knnTier(s, st.rows, st.bytes)
    println(s"[graft] knnAuto: rows=${st.rows} " +
      s"(exactCutoff ${GraftConf.knnExactCutoff(s)}), bytes=${st.bytes} " +
      s"(cutoff ${GraftConf.exactPairMaxBytes(s)}), " +
      s"forced=${GraftConf.knnTier(s)} -> $tier")
    tier match {
      case "exact" => knnExact(s, d, k, queryMod)
      case "ivf" => Ann.ivfKnnAgg(s, d, k, GraftConf.ivfNprobe(s), queryMod)
      case "nsw" => Nsw.nswKnn(s, d, k, queryMod)
    }
  }

  /** q30: exact k-NN, k=2, sampled queries — mirrors the pipeline's
    * index.search(k=2) (app/main.py:228). */
  val q30KnnExact = GraftQuery(
    "q30_knn_cosine_topk",
    "J1a,M4,T3,F10",
    (s, d) => knnExact(s, d, k = 2, queryMod = 10),
    Some("""WITH base AS (
        -- DOUBLE[]: DuckDB's list kernels compute in the input's element
        -- type; float32 accumulation rounds differently from the engine's
        -- double kernels at 4th-decimal boundaries
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
      q AS (SELECT vec_id AS qid, embedding AS qvec FROM base WHERE vec_id % 10 = 0),
      scored AS (
        SELECT qid, vec_id AS nid,
          list_cosine_similarity(qvec, embedding) AS sim
        FROM q, base WHERE qid <> vec_id),
      ranked AS (
        SELECT qid, nid, sim,
          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        FROM scored)
      SELECT qid, rank, nid, round(sim, 4) AS sim
      FROM ranked WHERE rank <= 2 ORDER BY qid, rank"""))

  /** q31: near-dup pairs at cos >= 0.35 over the full corpus (the synthetic embeddings have no true near-dups; max pairwise cos ~ 0.51) (exact; no
    * prefilter so the oracle is a faithful replay). */
  val q31NearDupPairs = GraftQuery(
    "q31_neardup_pairs",
    "D5,J1a,P5,P6,D4,T1,F9,F10",
    (s, d) => nearDupPairs(s, d, threshold = 0.35, prefilterLabel = false),
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings)
      SELECT a.vec_id AS id1, b.vec_id AS id2,
        round(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
      ORDER BY sim DESC, id1, id2"""))

  /** q32: L2 distance search + faiss-style L2->cosine conversion
    * (app/evaluation.py:24-27, app/main.py:250; F9). */
  val q32KnnL2 = GraftQuery(
    "q32_knn_l2_to_cosine",
    "J1a,M4,F9,F12",
    (s, d) => {
      val base = graft.plans.Spread(normalized(s, d))
      val q = base.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      val c = base.select(col("vec_id").as("nid"), col("vec").as("nvec"))
      val scored = q.join(c, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"), l2DistFast(col("qvec"), col("nvec")).as("dist"))
      val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 2)
        .select(col("qid"), col("rank"), col("nid"),
          round(col("dist"), 4).as("dist"),
          round(l2ToCosine(col("dist")), 4).as("cos_from_l2"))
        .orderBy(col("qid"), col("rank"))
    },
    Some("""WITH fl AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(list_inner_product(embedding, embedding)) AS nrm, embedding
        FROM fl),
      unit AS (
        SELECT vec_id,
          list_transform(embedding, x -> CASE WHEN nrm = 0 THEN CAST(x AS DOUBLE) ELSE x / nrm END) AS vec
        FROM norms),
      q AS (SELECT vec_id AS qid, vec AS qvec FROM unit WHERE vec_id % 20 = 0),
      scored AS (
        SELECT qid, vec_id AS nid, list_distance(qvec, vec) AS dist
        FROM q, unit WHERE qid <> vec_id),
      ranked AS (
        SELECT qid, nid, dist,
          row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rank
        FROM scored)
      SELECT qid, rank, nid, round(dist, 4) AS dist,
        round(least(1.0, greatest(-1.0, 1.0 - dist * dist / 2)), 4) AS cos_from_l2
      FROM ranked WHERE rank <= 2 ORDER BY qid, rank"""))

  /** q33: per-label vector statistics — norms and centroid norm (M2/M7
    * index-metadata surface; validates the normalize step). */
  val q33VectorStats = GraftQuery(
    "q33_vector_stats",
    "M7,F13,A1,A5",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), norm(col("embedding")).as("nrm"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("nrm")), 4).as("avg_norm"),
          round(min(col("nrm")), 4).as("min_norm"),
          round(max(col("nrm")), 4).as("max_norm"))
        .orderBy(col("label")),
    Some("""SELECT label, count(*) AS n,
        round(avg(nrm), 4) AS avg_norm,
        round(min(nrm), 4) AS min_norm,
        round(max(nrm), 4) AS max_norm
      FROM (SELECT label,
              sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))) AS nrm
            FROM embeddings)
      GROUP BY label ORDER BY label"""))

  /** q38: the reference's qualitative-neighbors report (SURVEY §3.2,
    * app/evaluation.py:103-180): top-5 neighbors per sampled query, label
    * looked up via a broadcast-able left join (J3, missing -> "N/A"),
    * pivoted wide to n{r}_id / n{r}_lab / n{r}_sim columns. */
  val q38QualReport = GraftQuery(
    "q38_qualitative_report",
    "J1a,J3,J5,T5,pivot; §3.2 qualitative report",
    (s, d) => {
      val labels = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val ranked = knnExact(s, d, k = 5, queryMod = 20)
        .join(labels.select(col("vec_id").as("nid"),
          col("label").as("nlab")), Seq("nid"), "left")
        .select(col("qid"), col("rank"), col("nid"),
          coalesce(col("nlab").cast("string"), lit("N/A")).as("nlab"), col("sim"))
      ranked.groupBy(col("qid"))
        .pivot("rank", Seq(1, 2, 3, 4, 5))
        .agg(first(col("nid")).as("id"), first(col("nlab")).as("lab"),
          first(col("sim")).as("sim"))
        .select(col("qid") +: (1 to 5).flatMap(r => Seq(
          col(s"${r}_id").as(s"n${r}_id"),
          col(s"${r}_lab").as(s"n${r}_lab"),
          col(s"${r}_sim").as(s"n${r}_sim"))): _*)
        .orderBy(col("qid"))
    },
    Some {
      val cols = (1 to 5).map(r =>
        s"""max(CASE WHEN rank = $r THEN nid END) AS n${r}_id,
           max(CASE WHEN rank = $r THEN nlab END) AS n${r}_lab,
           max(CASE WHEN rank = $r THEN sim END) AS n${r}_sim""").mkString(",\n")
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding, label FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qvec FROM base WHERE vec_id % 20 = 0),
        scored AS (
          SELECT qid, vec_id AS nid, list_cosine_similarity(qvec, embedding) AS sim
          FROM q, base WHERE qid <> vec_id),
        ranked AS (
          SELECT qid, nid, round(sim, 4) AS sim,
            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
          FROM scored),
        labeled AS (
          SELECT r.qid, r.rank, r.nid,
            coalesce(CAST(b.label AS VARCHAR), 'N/A') AS nlab, r.sim
          FROM ranked r LEFT JOIN base b ON r.nid = b.vec_id
          WHERE r.rank <= 5)
        SELECT qid, $cols FROM labeled GROUP BY qid ORDER BY qid"""
    })

  /** q83: the threshold-justification evidence (SURVEY §3.2 / §5 item 2,
    * app/evaluation.py:182-232): nearest-neighbor similarities vs a
    * baseline-pair population, 50-bin histogram by type — the data behind
    * similarity_distribution.png. Both populations are *sampled*, like the
    * reference's (50 NN queries, 5,000 random baseline pairs,
    * app/evaluation.py:117,245-247), but systematically (query side:
    * vec_id % 10; baseline side: fixed-offset partner vec_id + 137)
    * instead of unseeded random.sample (SURVEY §7.3 non-determinism risk),
    * so the oracle can replay it bit-for-bit. No driver-side action at
    * plan build (the old variant counted the corpus eagerly and scored all
    * N^2 pairs — 100x data meant 10,000x work; this is O(N^2/10) scoring
    * on the sampled query side only, and the offset join is linear). */
  val q83SimHistogram = GraftQuery(
    "q83_similarity_histogram",
    "A8,X3,X4; §3.2 distribution evidence",
    (s, d) => {
      val base = graft.plans.Spread(Tables.embeddings(s, d))
      // top-1 as a hash aggregate (max of (sim, -nid) struct) instead of a
      // row_number window: partial agg collapses the scored pairs
      // map-side, so nothing sorts the candidate rows just to keep one
      val q = base.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = base.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
      val nn = q.join(c, col("qid") =!= col("nid"))
        .select(col("qid"),
          struct(cosineFast(col("qvec"), col("nvec")).as("sim"),
            (-col("nid")).as("negnid")).as("sn"))
        .groupBy(col("qid")).agg(max(col("sn")).as("best"))
        .select(round(col("best.sim"), 4).as("sim"), lit("nn").as("type"))
      val rand = base.select(col("vec_id").as("a"), col("embedding").as("va"))
        .join(base.select(col("vec_id").as("b"), col("embedding").as("vb")),
          col("b") === col("a") + 137)
        .select(round(cosineFast(col("va"), col("vb")), 4).as("sim"),
          lit("baseline").as("type"))
      nn.unionByName(rand)
        .select(col("type"),
          least(floor((col("sim") + 1.0) * 25.0), lit(49.0)).cast("long").as("bin"))
        .groupBy(col("type"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("type"), col("bin"))
    },
    Some("""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
      nn AS (
        SELECT round(sim, 4) AS sim, 'nn' AS type FROM (
          SELECT qid, sim,
            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
          FROM (
            SELECT a.vec_id AS qid, b.vec_id AS nid,
              list_cosine_similarity(a.embedding, b.embedding) AS sim
            FROM base a JOIN base b ON a.vec_id <> b.vec_id
            WHERE a.vec_id % 10 = 0))
        WHERE rank = 1),
      rand AS (
        SELECT round(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim,
          'baseline' AS type
        FROM base a JOIN base b ON b.vec_id = a.vec_id + 137),
      u AS (SELECT * FROM nn UNION ALL SELECT * FROM rand)
      SELECT type, CAST(least(floor((sim + 1.0) * 25.0), 49.0) AS BIGINT) AS bin,
        count(*) AS cnt
      FROM u GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Hard-negative mining for embedding training — for each sampled
    * query vector, the nearest SAME-label neighbor (the positive the
    * contrastive pair would anchor on) plus the top-n nearest
    * CROSS-label neighbors (the hard negatives: closest in embedding
    * space while semantically wrong — the pairs that carry nearly all
    * of the InfoNCE gradient; Robinson et al., ICLR 2021 — public
    * pattern; every embedding-training pipeline mines these right
    * after ANN index build, reference analogue: the k-NN self-search
    * the pipeline already runs, app/main.py:228).
    *
    * Scale shape: stats-routed like [[knnAuto]] — under the exact
    * cutoff the scorer is the labeled O(Q·N) kernel join (the
    * replayable baseline the oracle checks); past it the scorer is the
    * IVF-probed candidate relation (nprobe cells per query, the q156
    * candidate kernel) with labels equi-joined on the two id sides.
    * Either way the per-query top-n runs through the bounded
    * [[graft.functions.TopKAggregator]] heaps, one heap per
    * (query, same-label?) group — ≤ n rows per group per map task,
    * never a corpus-wide window sort. */
  def hardNegatives(s: SparkSession, d: String, nNeg: Int, queryMod: Int): DataFrame = {
    val st = graft.plans.TableStats.embeddings(s, d)
    val exactTier = st.rows <= GraftConf.knnExactCutoff(s) &&
      st.bytes <= GraftConf.exactPairMaxBytes(s)
    println(s"[graft] hardNegatives: rows=${st.rows} " +
      s"(exactCutoff ${GraftConf.knnExactCutoff(s)}), bytes=${st.bytes} " +
      s"(cutoff ${GraftConf.exactPairMaxBytes(s)}) -> " +
      (if (exactTier) "exact" else "ivf"))
    val base =
      if (exactTier) graft.plans.Spread(Tables.embeddings(s, d))
      else Tables.embeddings(s, d)
    val scored =
      if (exactTier) {
        val q = base.filter(col("vec_id") % queryMod === 0)
          .select(col("vec_id").as("qid"), col("label").as("qlab"),
            col("embedding").as("qvec"))
        val c = base.select(col("vec_id").as("nid"), col("label").as("nlab"),
          col("embedding").as("nvec"))
        q.join(c, col("qid") =!= col("nid"))
          .select(col("qid"), col("nid"),
            (col("qlab") === col("nlab")).as("same"),
            cosineFast(col("qvec"), col("nvec")).as("sim"))
      } else {
        val labels = base.select(col("vec_id"), col("label"))
        Ann.ivfScoredCandidates(s, d, GraftConf.ivfNprobe(s), queryMod)
          .join(labels.select(col("vec_id").as("qid"), col("label").as("qlab")),
            Seq("qid"))
          .join(labels.select(col("vec_id").as("nid"), col("label").as("nlab")),
            Seq("nid"))
          .select(col("qid"), col("nid"),
            (col("qlab") === col("nlab")).as("same"), col("sim"))
      }
    val topk = udaf(new graft.functions.TopKAggregator(nNeg))
    val heaps = scored.groupBy(col("qid"), col("same"))
      .agg(topk(col("sim"), col("nid").cast("long")).as("top"))
    val pos = heaps.filter(col("same"))
      .select(col("qid"), col("top")(0)("_2").as("pos_id"),
        round(col("top")(0)("_1"), 4).as("pos_sim"))
    val negs = heaps.filter(!col("same"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col._2").as("neg_id"), round(col("col._1"), 4).as("neg_sim"))
    // inner join: a query whose label appears nowhere else has no
    // positive to anchor, so it emits no training pairs (oracle agrees)
    negs.join(pos, Seq("qid"))
      .select(col("qid"), col("rank"), col("neg_id"), col("neg_sim"),
        col("pos_id"), col("pos_sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q211: hard-negative mining, n=5 negatives per anchored query.
    * Every test SF sits under the exact cutoff, so the routed scorer is
    * the labeled exact kernel and the oracle is a faithful full replay
    * (the q181/q195 carried-oracle convention); OperatorSpec forces the
    * IVF branch and gates its agreement with the exact answer. */
  val q211HardNegatives = GraftQuery(
    "q211_hard_negatives",
    "LLM-pipeline embedding-training ext: hard-negative mining (same-label positive + top-n cross-label negatives)",
    (s, d) => hardNegatives(s, d, nNeg = 5, queryMod = 10),
    Some("""WITH base AS MATERIALIZED (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS embedding
        FROM embeddings),
      scored AS MATERIALIZED (
        SELECT q.vec_id AS qid, b.vec_id AS nid,
          (q.label = b.label) AS same,
          list_cosine_similarity(q.embedding, b.embedding) AS sim
        FROM base q JOIN base b
          ON q.vec_id % 10 = 0 AND q.vec_id <> b.vec_id),
      pos AS (
        SELECT qid, nid AS pos_id, round(sim, 4) AS pos_sim FROM (
          SELECT qid, nid, sim,
            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
          FROM scored WHERE same) WHERE rn = 1),
      neg AS (
        SELECT qid, CAST(rn AS INTEGER) AS rank, nid AS neg_id,
          round(sim, 4) AS neg_sim FROM (
          SELECT qid, nid, sim,
            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
          FROM scored WHERE NOT same) WHERE rn <= 5)
      SELECT n.qid, n.rank, n.neg_id, n.neg_sim, p.pos_id, p.pos_sim
      FROM neg n JOIN pos p USING (qid) ORDER BY qid, rank"""))

  /** q181: the stats-routed kNN entry point, registered so the router
    * itself is gate-checked: at every test scale factor the corpus sits
    * under the exact cutoff, so the routed plan IS the exact scorer and
    * q181 carries q30's full oracle (the same carried-oracle trick as
    * the streamed twins). GraftConfSpec proves the other branches
    * reachable and output-identical to their direct tiers. */
  val q181KnnAuto = GraftQuery(
    "q181_knn_auto",
    "J1a/J1b/J1c router: stats-routed kNN (exact | ivf | nsw), carried exact oracle",
    (s, d) => knnAuto(s, d, k = 2, queryMod = 10),
    q30KnnExact.oracle)

  def queries: Seq[GraftQuery] = Seq(
    q30KnnExact, q31NearDupPairs, q32KnnL2, q33VectorStats, q38QualReport,
    q83SimHistogram, q181KnnAuto, q211HardNegatives)
}
