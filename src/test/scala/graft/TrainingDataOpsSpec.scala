package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextAnalysis}
import graft.plans.Scale

/** Gates for the round-9 training-data additions: hard-negative mining
  * (q211), token-exact context chunking (q212), and the seeded
  * deterministic corpus shuffle (q213). The registered queries carry
  * full DuckDB oracles; these specs add the properties an oracle can't
  * see — the IVF-routed q211 branch agreeing with the exact tier, the
  * chunk-coverage algebra, and the permutation bijection. */
class TrainingDataOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // q211 hard-negative mining
  // ------------------------------------------------------------------

  test("hard negatives: labels split correctly and ranks are contiguous") {
    val out = Similarity.hardNegatives(spark, sfTiny, nNeg = 5, queryMod = 10)
      .cache()
    val labels = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("label"))
    val qlab = labels.select(col("vec_id").as("qid"), col("label").as("qlab"))
    val nlab = labels.select(col("vec_id").as("neg_id"), col("label").as("nlab"))
    val plab = labels.select(col("vec_id").as("pos_id"), col("label").as("plab"))
    val joined = out.join(qlab, Seq("qid")).join(nlab, Seq("neg_id"))
      .join(plab, Seq("pos_id")).cache()
    assert(joined.count() == out.count(), "label joins must not drop rows")
    assert(joined.filter(col("qlab") === col("nlab")).count() == 0,
      "every negative must be cross-label")
    assert(joined.filter(col("qlab") =!= col("plab")).count() == 0,
      "every positive must be same-label")
    // ranks 1..n per query, negative sims non-increasing in rank
    val bad = out.groupBy(col("qid"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        min(col("rank")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0, "ranks must be contiguous from 1")
    val inv = out.withColumn("prev",
        lag(col("neg_sim"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("rank"))))
      .filter(col("prev").isNotNull && col("prev") < col("neg_sim"))
    assert(inv.count() == 0, "negative sims must be non-increasing in rank")
    out.unpersist(); joined.unpersist()
  }

  test("hard negatives: forced IVF branch agrees with the exact tier") {
    val exact = Similarity.hardNegatives(spark, sfTiny, nNeg = 5, queryMod = 10)
      .cache()
    val prev = spark.conf.getOption("spark.graft.knn.exactCutoff")
    spark.conf.set("spark.graft.knn.exactCutoff", "1")
    try {
      val ivf = Similarity.hardNegatives(spark, sfTiny, nNeg = 5, queryMod = 10)
        .cache()
      assert(ivf.schema == exact.schema, "branches must agree on schema")
      val nq = exact.select(col("qid")).distinct().count()
      // positives: fraction of queries where both tiers anchor on the
      // same positive
      val posAgree = exact.select(col("qid"), col("pos_id")).distinct()
        .join(ivf.select(col("qid"), col("pos_id")).distinct(),
          Seq("qid", "pos_id"))
        .count()
      assert(posAgree >= (nq * 0.8).toLong,
        s"IVF positive agreement $posAgree/$nq below 0.8")
      // negatives: top-5 set overlap per query
      val negOverlap = exact.select(col("qid"), col("neg_id"))
        .join(ivf.select(col("qid"), col("neg_id")), Seq("qid", "neg_id"))
        .count()
      val negTotal = exact.count()
      assert(negOverlap >= (negTotal * 0.6).toLong,
        s"IVF negative overlap $negOverlap/$negTotal below 0.6")
      ivf.unpersist()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.knn.exactCutoff", v)
        case None => spark.conf.unset("spark.graft.knn.exactCutoff")
      }
    }
    exact.unpersist()
  }

  // ------------------------------------------------------------------
  // q212 token-window chunking
  // ------------------------------------------------------------------

  test("token chunks: count formula, full coverage, stride layout") {
    val docs = Tables.documents(spark, sfTiny)
    val model = TextAnalysis.bpeModel(spark, sfTiny, 6)
    val (win, stride) = (16, 12)
    val enc = TextAnalysis.bpeEncodeDocs(docs, model)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"))
    val ch = TextAnalysis.chunkTokensBpe(docs, model, win, stride).cache()
    val byDoc = ch.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("start_tok") + col("n_chunk_tokens")).as("covered"),
        min(col("start_tok")).as("first_start"),
        max(col("chunk_id")).as("last_chunk"))
      .join(enc, Seq("doc_id")).cache()
    assert(byDoc.count() == enc.count(), "every non-empty doc chunks")
    val expected = byDoc.withColumn("want",
        when(col("n_tokens") <= win, lit(1L))
          .otherwise(ceil((col("n_tokens") - win).cast("double") / stride) + 1))
      .filter(col("n_chunks") =!= col("want"))
    assert(expected.count() == 0, "chunk count must match the contract")
    assert(byDoc.filter(col("covered") =!= col("n_tokens")).count() == 0,
      "the last chunk must reach exactly the end of the token stream")
    assert(byDoc.filter(col("first_start") =!= 0).count() == 0,
      "chunk 0 starts at token 0")
    // every chunk but the last is a full window
    val short = ch.join(byDoc.select(col("doc_id"), col("last_chunk")), Seq("doc_id"))
      .filter(col("chunk_id") < col("last_chunk") &&
        col("n_chunk_tokens") =!= win)
    assert(short.count() == 0, "interior chunks must be full windows")
    // starts advance by exactly the stride
    val strideBad = ch.filter(col("start_tok") =!= col("chunk_id") * stride)
    assert(strideBad.count() == 0, "start_tok must be chunk_id * stride")
    ch.unpersist(); byDoc.unpersist()
  }

  test("token chunks: deterministic across runs") {
    val docs = Tables.documents(spark, sfTiny)
    val model = TextAnalysis.bpeModel(spark, sfTiny, 6)
    val a = TextAnalysis.chunkTokensBpe(docs, model, 16, 12)
      .select(col("doc_id"), col("chunk_id"),
        expr("array_join(transform(token_ids, x -> CAST(x AS STRING)), ',')")
          .as("t"))
    val b = TextAnalysis.chunkTokensBpe(docs, model, 16, 12)
      .select(col("doc_id"), col("chunk_id"),
        expr("array_join(transform(token_ids, x -> CAST(x AS STRING)), ',')")
          .as("t"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  // ------------------------------------------------------------------
  // q213 seeded shuffle
  // ------------------------------------------------------------------

  test("seeded shuffle: affine permutation is a bijection with contiguous shard positions") {
    val docs = Tables.documents(spark, sfTiny)
    val n = docs.count()
    val out = Scale.seededShuffleAssign(docs, "doc_id", shards = 8, seed = 42L)
      .cache()
    assert(out.count() == n, "one row per key")
    assert(out.select(col("perm")).distinct().count() == n,
      "perm must be collision-free (affine bijection)")
    val posBad = out.groupBy(col("shard"))
      .agg(count(lit(1)).as("cnt"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("cnt") || col("mn") =!= 1)
    assert(posBad.count() == 0, "pos must be contiguous 1..n per shard")
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // q214 length-bucketed batching
  // ------------------------------------------------------------------

  test("length batching: strategies agree on totals, bucketing cuts the waste") {
    val out = TextAnalysis.lengthBucketedBatches(spark, sfTiny, k = 6,
      shards = 8, seed = 42L, batchSize = 8, bucketWidth = 32).cache()
    val b = out.filter(col("strategy") === "bucketed")
      .select(col("shard"), col("n_seqs"), col("real_tok"),
        col("padded_tok").as("pb"))
    val n = out.filter(col("strategy") === "naive")
      .select(col("shard"), col("n_seqs"), col("real_tok"),
        col("padded_tok").as("pn"))
    // both strategies batch the SAME sequences per shard
    val j = b.join(n, Seq("shard", "n_seqs", "real_tok")).cache()
    assert(j.count() == 8, "per-shard n_seqs/real_tok must match across strategies")
    assert(out.filter(col("padded_tok") < col("real_tok")).count() == 0,
      "padding can only add tokens")
    // the operator's reason to exist: corpus-wide, bucketed padding
    // waste must undercut arrival-order waste
    val Array(wb, wn) = out.groupBy(col("strategy"))
      .agg((sum(col("padded_tok")) - sum(col("real_tok"))).as("waste"))
      .orderBy(col("strategy")).collect().map(_.getLong(1))
    assert(wb < wn, s"bucketed waste $wb must beat naive $wn")
    out.unpersist(); j.unpersist()
  }

  // ------------------------------------------------------------------
  // q215 span corruption
  // ------------------------------------------------------------------

  test("span corruption: mask accounting is consistent and seed-driven") {
    val docs = Tables.documents(spark, sfTiny)
    val model = TextAnalysis.bpeModel(spark, sfTiny, 6)
    val a = TextAnalysis.spanCorruptionPlan(docs, model, seed = 42L,
      rateInv = 20, maxSpan = 5).cache()
    assert(a.filter(col("n_masked") > col("n_tokens")).count() == 0,
      "merged spans can never exceed the token stream")
    assert(a.filter(col("n_masked") < col("n_spans")).count() == 0,
      "every merged span masks at least one token")
    assert(a.filter(col("mask_ppm") < 0 || col("mask_ppm") > 1000000).count() == 0,
      "mask_ppm must be a fraction in ppm")
    // corpus-wide density should sit near the design point
    // ((maxSpan+1)/2 / rateInv = 15%) — wide tolerance, it's a hash draw
    val r0 = a.agg(sum(col("n_masked")), sum(col("n_tokens"))).collect()(0)
    val density = r0.getLong(0).toDouble / r0.getLong(1)
    assert(density > 0.05 && density < 0.30,
      f"corpus mask density $density%.3f outside [0.05, 0.30]")
    val b = TextAnalysis.spanCorruptionPlan(docs, model, seed = 42L,
      rateInv = 20, maxSpan = 5)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "same seed must reproduce the identical plan")
    val c = TextAnalysis.spanCorruptionPlan(docs, model, seed = 7L,
      rateInv = 20, maxSpan = 5)
    assert(c.exceptAll(a).count() > 0, "a different seed must move spans")
    a.unpersist()
  }

  test("seeded shuffle: reproducible per seed, different across seeds") {
    val docs = Tables.documents(spark, sfTiny)
    val a = Scale.seededShuffleAssign(docs, "doc_id", 8, seed = 42L)
    val b = Scale.seededShuffleAssign(docs, "doc_id", 8, seed = 42L)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "same seed must reproduce the identical assignment")
    val c = Scale.seededShuffleAssign(docs, "doc_id", 8, seed = 7L)
      .withColumnRenamed("pos", "pos2").withColumnRenamed("perm", "perm2")
      .withColumnRenamed("shard", "shard2")
    val moved = a.join(c, Seq("doc_id"))
      .filter(col("shard") =!= col("shard2") || col("pos") =!= col("pos2"))
      .count()
    assert(moved > 0, "a different seed must produce a different order")
  }

  // ------------------------------------------------------------------
  // q216 epoch-capped waterfilling allocation
  // ------------------------------------------------------------------

  /** Independent reference: the textbook ITERATIVE waterfilling loop
    * (allocate proportionally among uncapped, cap violators, repeat),
    * run with exact integer cross-products — the closed-form sorted
    * prefix must land on the identical fixed point. */
  private def iterativeWaterfill(rows: Array[(String, Long, Long)],
      budget: Long): Map[String, Long] = {
    var capped = Set.empty[String]
    var changed = true
    while (changed) {
      val r = budget - rows.filter(x => capped(x._1)).map(_._3).sum
      val wu = rows.filterNot(x => capped(x._1)).map(_._2).sum
      val newly = rows.filter(x =>
        !capped(x._1) && r * x._2 > x._3 * wu).map(_._1)
      changed = newly.nonEmpty
      capped ++= newly
    }
    val r = budget - rows.filter(x => capped(x._1)).map(_._3).sum
    val wu = rows.filterNot(x => capped(x._1)).map(_._2).sum
    rows.map { x =>
      x._1 -> (if (capped(x._1)) x._3 else (r * x._2) / wu)
    }.toMap
  }

  test("waterfilling: closed form equals the iterative fixed point") {
    val out = TextAnalysis.waterfillAllocation(spark, sfTiny,
      budgetTokens = 25000L, maxEpochs = 2, k = 6).cache()
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5)))
    val ref = iterativeWaterfill(rows.map(x => (x._1, x._3, x._4)), 25000L)
    rows.foreach { x =>
      assert(x._6 == ref(x._1),
        s"${x._1}: closed-form alloc ${x._6} != iterative ${ref(x._1)}")
    }
    assert(rows.map(_._6).sum <= 25000L, "allocation must respect the budget")
    assert(rows.forall(x => x._6 <= x._4), "allocation must respect every cap")
    // capped set is a prefix of the cap/w water order: every capped
    // ratio must sit at or below every uncapped ratio
    val cappedMax = rows.filter(_._5).map(x => x._4.toDouble / x._3)
    val openMin = rows.filterNot(_._5).map(x => x._4.toDouble / x._3)
    if (cappedMax.nonEmpty && openMin.nonEmpty)
      assert(cappedMax.max <= openMin.min, "capped set must be a ratio prefix")
    out.unpersist()
  }

  test("waterfilling edges: saturating budget caps all, loose caps cap none") {
    // budget beyond 2x the corpus: every source pinned at its cap
    val all = TextAnalysis.waterfillAllocation(spark, sfTiny,
      budgetTokens = 100000000L, maxEpochs = 2, k = 6)
    assert(all.filter(!col("capped") ||
      col("alloc_tok") =!= col("cap_tok")).count() == 0,
      "a budget above the total cap mass must pin every source")
    // effectively-unbounded epochs: nobody caps, allocation is the
    // plain integer-proportional share
    val none = TextAnalysis.waterfillAllocation(spark, sfTiny,
      budgetTokens = 25000L, maxEpochs = 1000000, k = 6).cache()
    assert(none.filter(col("capped")).count() == 0,
      "unbounded caps must never pin a source")
    val wsum = none.agg(sum(col("w"))).collect()(0).getLong(0)
    assert(none.filter(col("alloc_tok") =!=
        expr(s"(25000L * w) div ${wsum}L")).count() == 0,
      "with no caps binding the allocation is the proportional floor")
    none.unpersist()
  }

  // ------------------------------------------------------------------
  // q218 epoch manifest
  // ------------------------------------------------------------------

  test("epoch manifest: full passes complete, partial epoch within one doc of the allocation") {
    val out = TextAnalysis.epochManifest(spark, sfTiny,
      budgetTokens = 25000L, maxEpochs = 2, k = 6, seed = 42L).cache()
    val alloc: Map[String, (Long, Long)] =
      TextAnalysis.waterfillAllocation(spark, sfTiny,
        budgetTokens = 25000L, maxEpochs = 2, k = 6)
      .select(col("source"), col("tok_total"), col("alloc_tok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // per-source token law: alloc <= manifest tokens < alloc + max doc
    // (the start-offset rule overshoots by at most the straddling doc)
    val per = out.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("mtok"), max(col("n_tok")).as("mx"),
        max(col("epoch")).as("maxep"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    per.foreach { case (src, mtok, mx, maxep) =>
      val (tot, al) = alloc(src)
      assert(mtok >= al && mtok < al + math.max(mx, 1L),
        s"$src: manifest tokens $mtok outside [$al, $al + $mx)")
      val fullEp = al / tot
      assert(maxep <= fullEp, s"$src: epoch $maxep beyond full_ep $fullEp")
    }
    // every full epoch contains every doc of the source exactly once
    val nDocs = Tables.documents(spark, sfTiny)
      .groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val fullCounts = out
      .join(nDocs, Seq("source"))
      .groupBy(col("source"), col("epoch"), col("nd"))
      .agg(countDistinct(col("doc_id")).as("docs"),
        count(lit(1)).as("rows"))
    val badFull = fullCounts.filter(col("docs") =!= col("rows")).count()
    assert(badFull == 0, "a doc may appear at most once per (source, epoch)")
    val incompleteFull = fullCounts
      .join(out.groupBy(col("source"))
        .agg(max(col("epoch")).as("maxep")), Seq("source"))
      .filter(col("epoch") < col("maxep") && col("docs") =!= col("nd"))
      .count()
    assert(incompleteFull == 0,
      "every non-final epoch must contain the whole source")
    // determinism + seed sensitivity on the partial epochs
    val again = TextAnalysis.epochManifest(spark, sfTiny,
      budgetTokens = 25000L, maxEpochs = 2, k = 6, seed = 42L)
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0, "same seed must reproduce exactly")
    val other = TextAnalysis.epochManifest(spark, sfTiny,
      budgetTokens = 25000L, maxEpochs = 2, k = 6, seed = 43L)
    val bigRem = per.exists { case (src, _, _, _) =>
      val (tot, al) = alloc(src); al % tot > 200 }
    if (bigRem)
      assert(out.exceptAll(other).count() > 0,
        "a different seed must draw a different partial prefix")
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // q219 cross-source containment matrix
  // ------------------------------------------------------------------

  test("containment matrix: pair-symmetric, bounded, mass-consistent") {
    val out = graft.operators.Dedup
      .sourceContainment(spark, sfTiny, threshold = 0.8).cache()
    // n_pairs is symmetric: the (a,b) and (b,a) cells count the same
    // unordered pair set from opposite ends
    val t = out.select(col("src_a").as("sa"), col("src_b").as("sb"),
      col("n_pairs").as("np2"))
    val asym = out.join(t, col("src_a") === col("sb") &&
        col("src_b") === col("sa"))
      .filter(col("n_pairs") =!= col("np2")).count()
    assert(asym == 0, "n_pairs must be symmetric across the diagonal")
    // coverage never exceeds the source's document count
    val tot = Tables.documents(spark, sfTiny)
      .groupBy(col("source")).agg(count(lit(1)).as("nd"))
      .withColumnRenamed("source", "src_a")
    assert(out.join(tot, Seq("src_a"))
      .filter(col("n_docs_dup") > col("nd") ||
        col("containment_ppm") > 1000000L).count() == 0,
      "containment is a fraction of the source")
    // total matrix mass = 2 x the verified pair count
    val nPairs = graft.operators.Dedup
      .sketchVerifiedPairs(spark, sfTiny, 0.8).count()
    val mass = out.agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    assert(mass == 2 * nPairs,
      s"matrix mass $mass != 2 x verified pairs $nPairs")
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // q217 cluster representatives
  // ------------------------------------------------------------------

  test("cluster reps: exactly one keeper per closure, the longest member") {
    val out = graft.operators.Dedup
      .clusterRepresentatives(spark, sfTiny, threshold = 0.8).cache()
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("k"),
        count(lit(1)).as("n"), max(col("cluster_size")).as("sz"))
    assert(perCluster.filter(col("k") =!= 1L).count() == 0,
      "every cluster must keep exactly one representative")
    assert(perCluster.filter(col("n") =!= col("sz")).count() == 0,
      "cluster_size must equal the member count")
    // the keeper dominates its cluster under (n_char desc, doc_id asc)
    val keepers = out.filter(col("keep"))
      .select(col("cluster_id"), col("n_char").as("kc"),
        col("doc_id").as("kd"))
    val dominated = out.join(keepers, Seq("cluster_id"))
      .filter(col("n_char") > col("kc") ||
        (col("n_char") === col("kc") && col("doc_id") < col("kd")))
    assert(dominated.count() == 0,
      "no member may outrank its cluster's keeper")
    out.unpersist()
  }
}
