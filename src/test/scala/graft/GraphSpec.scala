package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Properties of the k-NN-graph analytics (q163/q164) that the DuckDB
  * hash oracle can't state: PageRank's probability-distribution
  * invariants, power-iteration convergence, and tier-agnosticism of
  * the edge contract. */
class GraphSpec extends SparkSpec {

  private lazy val edges = Graph.knnEdges(spark, sfTiny, k = 5).cache()
  private lazy val nodes =
    Tables.embeddings(spark, sfTiny).select(col("vec_id")).cache()
  private lazy val n = nodes.count()

  test("k-NN edge set: out-degree exactly k for every node, no self loops") {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    assert(deg.filter(col("d") =!= 5).count() === 0)
    assert(deg.count() === n)
    assert(edges.filter(col("src") === col("dst")).count() === 0)
  }

  test("PageRank is a probability distribution: mass 1, floor (1-d)/N") {
    val pr = Graph.pageRank(nodes, edges, k = 5, iters = 5, damping = 0.85)
    val mass = pr.agg(sum(col("r"))).head.getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9, s"mass drifted: $mass")
    val floor = 0.15 / n
    assert(pr.filter(col("r") < floor - 1e-12).count() === 0)
  }

  test("fixed-point PageRank: exact integer mass n·(20k)^iters; matches the double iteration") {
    val scaled = Graph.pageRankScaled(nodes, edges, k = 5, iters = 5)
    // mass invariant holds EXACTLY — no float drift to tolerate
    val mass = scaled.agg(sum(col("r"))).head.getLong(0)
    val denom = n * 100L * 100L * 100L * 100L * 100L
    assert(mass === denom, s"integer mass $mass != n*(20k)^5 $denom")
    // normalized, the integer state is the same distribution the double
    // power iteration computes, up to float summation error
    val dbl = Graph.pageRank(nodes, edges, k = 5, iters = 5, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Graph.pageRankScaled(nodes, edges, k = 5, iters = 5).collect().foreach { r =>
      val exact = r.getLong(1).toDouble / denom
      assert(math.abs(exact - dbl(r.getLong(0))) < 1e-9,
        s"node ${r.getLong(0)}: exact $exact vs double ${dbl(r.getLong(0))}")
    }
  }

  test("fixed-point PageRank repairs deficient out-degree: mass invariant holds, k-regular input untouched") {
    // drop every out-edge of one node and one edge of another — the
    // ANN-tier deficiency shape (probed cells holding < k candidates).
    // Without the self-loop repair both leak rank mass and the exact
    // invariant breaks.
    val victims = nodes.limit(2).collect().map(_.getLong(0))
    val deficient = edges
      .filter(!(col("src") === victims(0)))
      .filter(!(col("src") === victims(1) && col("dst") === edges
        .filter(col("src") === victims(1)).select(col("dst"))
        .head.getLong(0)))
    val scaled = Graph.pageRankScaled(nodes, deficient, k = 5, iters = 5)
    val mass = scaled.agg(sum(col("r"))).head.getLong(0)
    val denom = n * 100L * 100L * 100L * 100L * 100L
    assert(mass === denom,
      s"deficient-degree mass $mass != n*(20k)^5 $denom — repair leaked")
    // the repair is self-loops, not edge restoration: the state must
    // genuinely differ from the full-edge ranking
    val full = Graph.pageRankScaled(nodes, edges, k = 5, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rep = scaled.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(full != rep, "repair silently reconstructed the dropped edges?")
  }

  test("power iteration converges: L1 residual shrinks geometrically") {
    def ranksAt(i: Int): Map[Long, Double] =
      Graph.pageRank(nodes, edges, k = 5, iters = i, damping = 0.85)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (r4, r5, r6) = (ranksAt(4), ranksAt(5), ranksAt(6))
    def l1(a: Map[Long, Double], b: Map[Long, Double]): Double =
      a.map { case (k, v) => math.abs(v - b(k)) }.sum
    val (d45, d56) = (l1(r4, r5), l1(r5, r6))
    // contraction factor is ≤ damping = 0.85 per iteration in L1
    assert(d56 <= d45 * 0.85 + 1e-12, s"residual not contracting: $d45 -> $d56")
  }

  test("pageRank is edge-tier-agnostic: runs on an approximate edge relation") {
    // any (src, dst) relation with uniform out-degree k fits the
    // contract — here a cheap structural stand-in for an IVF/NSW tier:
    // ring + stride edges (k=2) instead of the exact cosine ranking
    val ring = nodes
      .select(col("vec_id").as("src"), ((col("vec_id") + 1) % n).as("dst"))
      .union(nodes.select(col("vec_id").as("src"), ((col("vec_id") + 7) % n).as("dst")))
    val pr = Graph.pageRank(nodes, ring, k = 2, iters = 3, damping = 0.85)
    assert(math.abs(pr.agg(sum(col("r"))).head.getDouble(0) - 1.0) < 1e-9)
    // a vertex-transitive graph gives the uniform distribution exactly
    val spreadRow = pr.agg(max(col("r")).as("hi"), min(col("r")).as("lo")).head
    assert(spreadRow.getDouble(0) - spreadRow.getDouble(1) < 1e-12)
  }

  test("q166 label propagation: seeds keep their label; held-out accuracy beats chance") {
    val out = Registry.byName("q166_label_propagation").run(spark, sfTiny).cache()
    assert(out.count() === n)
    // clamp invariant: a seed's own clamped count k^iters strictly
    // dominates any incoming label mass, so every seed predicts itself
    assert(out.filter(col("is_seed") && col("pred_label") =!= col("true_label"))
      .count() === 0)
    // coverage: with 1/3 seeds and out-degree 5, 3 rounds reach
    // essentially everyone — an unreached majority would mean votes
    // flowed the wrong way along the edges
    val reached = out.filter(col("pred_label").isNotNull).count()
    assert(reached.toDouble / n > 0.9, s"only $reached/$n nodes reached")
    // NO accuracy gate on purpose: measured homophily of this synthetic
    // corpus's k-NN graph is 0.089 ≈ 10-class chance (labels carry no
    // geometric signal), so held-out accuracy here measures the DATA,
    // not the operator; prediction correctness vs the seed-path-count
    // argmax is what the DuckDB oracle hash-checks exactly
    val rerun = Registry.byName("q166_label_propagation").run(spark, sfTiny)
    assert(rerun.collect().toSeq === out.orderBy(col("vec_id")).collect().toSeq,
      "label propagation is not deterministic across runs")
    out.unpersist()
  }

  test("q163 degree scores: in-degree sums to N*k and covers every node") {
    val out = Registry.byName("q163_knn_graph_degree").run(spark, sfTiny)
    assert(out.count() === n)
    val total = out.agg(sum(col("in_degree"))).head.getLong(0)
    assert(total === n * 5)
  }

  test("ANN edge relation (q188 substrate): k-regular, no self loops, edge recall >= 0.9 vs exact") {
    val ann = Graph.annKnnEdges(spark, sfTiny, k = 5).cache()
    val deg = ann.groupBy(col("src")).agg(count(lit(1)).as("d"))
    assert(deg.filter(col("d") =!= 5).count() === 0,
      "ANN edge build must stay 5-regular at the test corpus")
    assert(deg.count() === n)
    assert(ann.filter(col("src") === col("dst")).count() === 0)
    val exactSet = edges.select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val annSet = ann.select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (annSet & exactSet).size.toDouble / exactSet.size
    assert(recall >= 0.9, s"ANN edge recall $recall (${exactSet.size} exact edges)")
    ann.unpersist()
  }

  test("q188 degree scores agree with exact-edge q163 (mean |Δdeg| <= 0.2·k)") {
    val exact = Registry.byName("q163_knn_graph_degree").run(spark, sfTiny)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = Registry.byName("q188_ann_graph_degree").run(spark, sfTiny)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ann.keySet === exact.keySet, "q188 must cover every node like q163")
    val meanAbsDelta = exact.map { case (id, d) => math.abs(d - ann(id)) }.sum.toDouble / n
    assert(meanAbsDelta <= 0.2 * 5,
      s"per-node in-degree drifted: mean |Δ| $meanAbsDelta at k=5")
  }

  test("q189 ANN PageRank agrees with the exact-edge ranking (top-decile overlap >= 0.8)") {
    // both outputs are ordered rank_scaled DESC, vec_id — the head IS
    // the top of the ranking
    def topDecile(q: String): Set[Long] = {
      val rows = Registry.byName(q).run(spark, sfTiny).collect()
      rows.take(math.max(1, rows.length / 10)).map(_.getLong(0)).toSet
    }
    val exactTop = topDecile("q164_knn_graph_pagerank")
    val annTop = topDecile("q189_ann_graph_pagerank")
    val overlap = (exactTop & annTop).size.toDouble / exactTop.size
    assert(overlap >= 0.8, s"top-decile overlap $overlap (${exactTop.size} nodes)")
  }

  test("q190 ANN k-core survivors agree with exact-edge q169 (Jaccard >= 0.9)") {
    val exact = Registry.byName("q169_kcore").run(spark, sfTiny)
      .collect().map(_.getLong(0)).toSet
    val ann = Registry.byName("q190_ann_kcore").run(spark, sfTiny)
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty)
    val jac = (exact & ann).size.toDouble / (exact | ann).size
    assert(jac >= 0.9, s"survivor Jaccard $jac (${exact.size} exact, ${ann.size} ann)")
  }

  test("q195 routed edges: exact branch under the cutoff; NN-Descent branch reachable by conf") {
    // default conf at sfTiny: under the cutoff -> the routed output IS
    // the exact q163 result (the carried oracle depends on this)
    val routed = Registry.byName("q195_graph_degree_auto").run(spark, sfTiny)
      .collect().map(_.toSeq).toSeq
    val exact = Registry.byName("q163_knn_graph_degree").run(spark, sfTiny)
      .collect().map(_.toSeq).toSeq
    assert(routed == exact, "routed tier diverged from exact under the cutoff")
    // force the scale branch: routed == the registered ANN form
    spark.conf.set("spark.graft.knn.exactCutoff", "0")
    try {
      val ann = Registry.byName("q195_graph_degree_auto").run(spark, sfTiny)
        .collect().map(_.toSeq).toSeq
      val annDirect = Registry.byName("q188_ann_graph_degree").run(spark, sfTiny)
        .collect().map(_.toSeq).toSeq
      assert(ann == annDirect, "forced NN-Descent branch diverged from q188")
      assert(ann != exact, "forcing the cutoff must actually flip the branch")
    } finally spark.conf.unset("spark.graft.knn.exactCutoff")
  }

  test("q169 k-core peel: non-vacuous, monotone, and k-core-true at the fixed point") {
    import graft.operators.Graph
    val edges = Graph.similarityEdges(spark, sfTiny, threshold = 0.3)
    def survivors(rounds: Int): Set[Long] =
      Graph.kCorePeel(edges, c = 4, rounds = rounds)
        .collect().map(_.getLong(0)).toSet
    val r3 = survivors(3)
    assert(r3.nonEmpty, "3-round peel must keep a dense community at sf0.001")
    // monotone: more rounds never resurrect a peeled node
    val r4 = survivors(4)
    assert(r4.subsetOf(r3))
    // fixed point: once two consecutive rounds agree, the peel has
    // converged and EVERY remaining node holds the true k-core
    // invariant deg >= c
    var prev = r4
    var cur = survivors(5)
    var rounds = 5
    while (cur != prev && rounds < 15) {
      rounds += 1; prev = cur; cur = survivors(rounds)
    }
    assert(cur == prev, s"peel did not converge within $rounds rounds")
    val fixedPoint = Graph.kCorePeel(edges, c = 4, rounds = rounds).collect()
    fixedPoint.foreach { r =>
      assert(r.getLong(1) >= 4,
        s"converged survivor ${r.getLong(0)} has degree ${r.getLong(1)} < c")
    }
  }
}
