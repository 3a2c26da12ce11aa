package graft

import org.apache.spark.sql.functions._
import graft.plans.Scale

/** Bucketed co-located join: pre-bucketing both sides on the join key must
  * eliminate every Exchange from the join plan — the "shuffle once at
  * ingest, never per query" contract the engine relies on at scale. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with zero Exchange") {
    spark.sql("DROP TABLE IF EXISTS emb_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS emb_bucketed_b")
    val emb = Tables.embeddings(spark, sfTiny).select(col("vec_id"), col("label"))
    Scale.writeBucketed(emb, "emb_bucketed_a", "vec_id", buckets = 4)
    Scale.writeBucketed(emb.withColumn("label2", col("label") + 1)
      .select(col("vec_id"), col("label2")), "emb_bucketed_b", "vec_id", buckets = 4)

    // disable broadcast so the planner must pick the shuffle-free
    // sort-merge-on-buckets path (at real scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("emb_bucketed_a")
        .join(spark.table("emb_bucketed_b"), Seq("vec_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and it is still correct
      assert(joined.count() == emb.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q124 dict-encoded join: per-code agg AND fact-agg join plan with zero Exchange") {
    // the claimed 100 TB win of dictionary encoding, proven on the plan:
    // once the encoded fact is bucketed by the dense code, the aggregate
    // and the join back both reuse the bucket partitioning — no shuffle
    // anywhere, and the only joins touching strings are broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Scale.dictEncodedJoin(spark, sfTiny)
      df.collect() // finalize AQE before inspecting the plan
      // flatten through AQE wrappers (query stages hold their subtree in
      // .plan, invisible to a plain collect)
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(walk)) ++ (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case _ => Seq.empty
        })
      val nodes = walk(df.queryExecution.executedPlan)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"fact scan not bucketed:\n$plan")
      // the encoded FACT must never pass through a shuffle: every
      // ShuffleExchange in the plan belongs to the vocabulary build
      // (bounded by key cardinality, not corpus size) under a
      // BroadcastExchange — none may sit above the bucketed scan
      val factShuffles = nodes.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.toString.contains("Bucketed: true") => e
      }
      assert(factShuffles.isEmpty,
        s"dict-encoded fact still shuffles:\n$plan")
      // and the fact-agg join itself is exchange-free sort-merge on the
      // bucket partitioning (Sort yes, Exchange no)
      val smjs = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty && smjs.forall(j =>
        !j.toString.contains("Exchange hashpartitioning")),
        s"fact-agg join re-partitions:\n$plan")
      // and the pipeline is semantically invisible: shares sum to 1 per source
      val bySource = df.groupBy(col("source"))
        .agg(round(sum(col("share")), 2).as("s")).collect()
      assert(bySource.nonEmpty && bySource.forall(r => math.abs(r.getDouble(1) - 1.0) < 0.02))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF probe join over a centroid-bucketed assignment table: corpus side never re-shuffles") {
    // The 100 TB IVF layout (SCALE.md): the "index add" writes the
    // assignment table bucketed by centroid_id, so every probe query
    // shuffles only its (tiny) probe list — the corpus-side Exchange that
    // would move the whole index per search must not exist.
    spark.sql("DROP TABLE IF EXISTS ivf_assign_bucketed")
    val (assigned, _) = operators.Ann.ivfIndex(spark, sfTiny)
    plans.Scale.writeBucketed(
      assigned.select(col("vec_id"), col("centroid_id"), col("vec")),
      "ivf_assign_bucketed", "centroid_id", buckets = 4)
    val probes = assigned.select(col("centroid_id")).distinct().limit(3)
      .withColumnRenamed("centroid_id", "probe_cell")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ivf_assign_bucketed")
        .join(probes, col("centroid_id") === col("probe_cell"))
      val exec = joined.queryExecution.executedPlan
      val plan = exec.toString
      assert(plan.contains("Bucketed: true"), s"corpus scan not bucketed:\n$plan")
      // probe-side shuffles are fine (the probe list is tiny); what must
      // NOT exist is any Exchange above the bucketed corpus scan
      val shuffleOverCorpus = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.toString.contains("Bucketed: true") => e
      }
      assert(shuffleOverCorpus.isEmpty,
        s"the bucketed corpus side re-shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LSH candidate join keeps its explicit salted fan-out (AQE must not re-serialize it)") {
    // regression guard for the r3 finding: the bucket join's shuffle
    // INPUT is tiny, so AQE coalesced it to 1-2 partitions and the huge
    // join OUTPUT (all in-bucket pairs) was generated serially. The plan
    // must keep the user repartition on the salted key (REPARTITION_BY_NUM
    // is the marker Catalyst gives an explicit-numPartitions repartition,
    // which AQE is contractually not allowed to coalesce).
    val df = operators.Ann.lshNearDup(spark, sfTiny, 0.35)
    val plan = df.queryExecution.optimizedPlan.toString
    val parts = spark.sessionState.conf.numShufflePartitions
    // an explicit-numPartitions RepartitionByExpression on the salted key;
    // AQE is contractually not allowed to coalesce user repartitions that
    // pin a partition count
    assert(plan.contains(s"RepartitionByExpression") && plan.contains(s", $parts"),
      s"explicit $parts-way repartition missing from LSH join plan:\n$plan")
    assert(plan.contains("salt"), s"salt column missing from LSH join plan:\n$plan")
  }

  test("compact: fragmented append dir collapses to few files, data identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val docs = Tables.documents(spark, sfTiny).select(col("doc_id"), col("source"))
    // simulate 8 micro-batch appends -> >= 8 part files
    (0 until 8).foreach { i =>
      docs.filter(col("doc_id") % 8 === i).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    def partFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    val before = partFiles
    assert(before >= 8, s"fixture not fragmented: $before files")
    val expected = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val n = plans.Scale.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(n == 1 && partFiles == 1, s"expected 1 file, got $partFiles")
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == expected, "compaction changed the data")
  }

  test("partitioned write: a partition-key filter prunes at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang"), col("source"))
    plans.Scale.writePartitioned(docs, dir, "source")
    val sources = docs.select(col("source")).distinct().count()
    assert(sources > 1, "fixture needs multiple partitions")

    val one = docs.filter(col("source") === "src0").count()
    val read = spark.read.parquet(dir).filter(col("source") === "src0")
    val plan = read.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the filter must appear as a PartitionFilters entry on the scan —
    // planned directory pruning, not a post-scan row filter
    assert("PartitionFilters: \\[[^\\]]*source".r.findFirstIn(plan).isDefined,
      s"source filter not pushed to partition pruning:\n$plan")
    assert(read.count() == one)
    // and the pruned scan reads only the matching partition's files
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    val files = scannedFiles(read)
    val allFiles = scannedFiles(spark.read.parquet(dir))
    assert(files < allFiles, s"pruning read all $allFiles files")
  }

  test("partitioned+bucketed layout: one plan gets pruning AND a shuffle-free join") {
    // the canonical ingest layout: partition by source (pruning), bucket
    // by doc_id (co-located joins) — both properties on the same table
    spark.sql("DROP TABLE IF EXISTS docs_part_bucketed")
    spark.sql("DROP TABLE IF EXISTS scores_bucketed")
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang"), col("source"))
    Scale.writePartitionedBucketed(docs, "docs_part_bucketed",
      partKey = "source", bucketKey = "doc_id", buckets = 4)
    Scale.writeBucketed(docs.select(col("doc_id"), length(col("lang")).as("score")),
      "scores_bucketed", "doc_id", buckets = 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("docs_part_bucketed")
        .filter(col("source") === "src0")
        .join(spark.table("scores_bucketed"), Seq("doc_id"))
      val exec = joined.queryExecution.executedPlan
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert("PartitionFilters: \\[[^\\]]*source".r.findFirstIn(plan).isDefined,
        s"source filter not pushed to partition pruning:\n$plan")
      assert(exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, s"partitioned+bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        docs.filter(col("source") === "src0").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals direct aggregation") {
    val direct = Tables.lineitem(spark, sfTiny)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Scale.saltedAgg(
        Tables.lineitem(spark, sfTiny), col("l_returnflag"), col("l_quantity"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
