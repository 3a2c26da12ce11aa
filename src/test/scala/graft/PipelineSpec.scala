package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.plans.{GraftExtensions, Pipeline}
import graft.sources.ReportSink

/** Stage-cache runner (S10), report sink (S8), SQL function registration. */
class PipelineSpec extends SparkSpec {

  test("pipeline stages materialize once, skip on re-run, recompute after invalidate") {
    val root = Files.createTempDirectory("graft_pipe").toString
    val pipe = new Pipeline(spark, root)
    var computes = 0
    def run() = pipe.stage("clean") {
      computes += 1
      Tables.documents(spark, sfTiny).select(col("doc_id"), col("lang"))
    }
    val first = run().count()
    val second = run().count()
    assert(computes == 1, "second run must be served from the stage cache")
    assert(first == second)
    assert(pipe.isDone("clean"))
    pipe.invalidate("clean")
    run()
    assert(computes == 2, "invalidate must force recompute")
  }

  test("half-written stage (no _DONE marker) is recomputed, not trusted") {
    val root = Files.createTempDirectory("graft_pipe2").toString
    val pipe = new Pipeline(spark, root)
    // simulate a crashed run: data directory exists, no commit marker
    Tables.documents(spark, sfTiny).limit(1).write.parquet(s"$root/stage1")
    assert(!pipe.isDone("stage1"))
    val n = pipe.stage("stage1") {
      Tables.documents(spark, sfTiny).select(col("doc_id"))
    }.count()
    assert(n == Tables.documents(spark, sfTiny).count())
  }

  test("curation pipeline (q193): resume-from-checkpoint recomputes only the invalidated suffix") {
    import graft.plans.CurationPipeline
    val work = Files.createTempDirectory("graft_cur_resume").toString
    def mtime(stage: String): Long =
      new java.io.File(s"$work/$stage/_DONE").lastModified()
    val m1 = CurationPipeline.manifest(
      CurationPipeline.runStages(spark, sfTiny, work, withClassifier = false,
        budget = 60)).collect().map(_.toSeq).toSeq
    assert(m1.size == 8, s"expected 8 stage rows, got ${m1.size}")
    val (t1Gate, t1Split) = (mtime("s1_gate"), mtime("s5_split_hx"))
    // full re-run: every stage served from the cache, manifest identical
    val m2 = CurationPipeline.manifest(
      CurationPipeline.runStages(spark, sfTiny, work, withClassifier = false,
        budget = 60)).collect().map(_.toSeq).toSeq
    assert(m2 == m1, "cached re-run changed the manifest")
    assert(mtime("s1_gate") == t1Gate && mtime("s5_split_hx") == t1Split,
      "cached re-run rewrote a committed stage")
    // crash recovery: invalidate a mid-chain stage, resume — only the
    // invalidated stage is recomputed (downstream stages are still
    // committed and content-identical, so their caches stay valid)
    new graft.plans.Pipeline(spark, work).invalidate("s5_split_hx")
    val m3 = CurationPipeline.manifest(
      CurationPipeline.runStages(spark, sfTiny, work, withClassifier = false,
        budget = 60)).collect().map(_.toSeq).toSeq
    assert(m3 == m1, "resume after invalidate changed the manifest")
    assert(mtime("s1_gate") == t1Gate, "resume recomputed an upstream stage")
    assert(mtime("s5_split_hx") > t1Split, "invalidated stage was not recomputed")
  }

  test("curation pipeline with the classifier stage on: 9 rows, monotone counts") {
    import graft.plans.CurationPipeline
    val work = Files.createTempDirectory("graft_cur_clf").toString
    val m = CurationPipeline.manifest(
      CurationPipeline.runStages(spark, sfTiny, work, withClassifier = true,
        budget = 60)).collect()
    val names = m.map(_.getString(1)).toSeq
    assert(names == Seq("input", "gate", "classifier", "sketch_dedup",
      "excise", "decontaminate", "split", "mixture", "pack"))
    // every doc-shaped stage can only shrink the corpus
    val counts = m.take(7).map(_.getLong(2)).toSeq
    assert(counts == counts.sorted.reverse, s"counts not monotone: $counts")
    assert(counts.last > 0, "pipeline emptied the corpus — vacuous")
  }

  test("JSONL source tolerates corrupt lines (PERMISSIVE null rows, no job failure)") {
    // a 100 TB JSONL landing zone WILL contain malformed lines; the scan
    // must quarantine them as null rows, not kill the job
    val dir = Files.createTempDirectory("graft_jsonl_corrupt")
    Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "good line"}
        |this is not json at all
        |{"doc_id": 2, "text": "another good line"}
        |{"doc_id": "not-a-number", "text": 3}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val read = spark.read.schema(schema).json(dir.toString)
    val rows = read.collect()
    assert(rows.length == 4) // every line produces a row
    val good = read.filter(col("doc_id").isNotNull)
      .collect().map(_.getLong(0)).toSet
    assert(good == Set(1L, 2L), s"good rows: $good")
    // corrupt lines arrive as all-null rows — countable, quarantinable
    assert(read.filter(col("doc_id").isNull).count() == 2)
  }

  test("markdown report sink renders header, separator, and escaped cells") {
    val df = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang")).orderBy(col("doc_id")).limit(3)
    val md = ReportSink.toMarkdown(df)
    val lines = md.split("\n")
    assert(lines(0) == "| doc_id | lang |")
    assert(lines(1) == "| --- | --- |")
    assert(lines.length == 5)
  }

  test("native kernels are callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT round(graft_cosine(array(1.0, 0.0), array(1.0, 0.0)), 4) AS c,
                graft_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d,
                graft_shingles(array('a', 'b', 'c'), 2) AS sh""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[String](2) == Seq("a b", "b c"))

    // PQ kernels: 2 subspaces x 2 codes over a 2-d toy codebook
    // [(0,): {0.0, 1.0}; (1,): {0.0, 1.0}] — the vector (1, 0) encodes
    // to codes [1, 0], its self-ADC distance is 0, and normalization
    // leaves unit vectors unchanged
    val p = spark.sql(
      """SELECT graft_pq_encode(array(1.0, 0.0), array(0.0, 1.0, 0.0, 1.0), 2, 2) AS codes,
                graft_adc(graft_pq_table(array(1.0, 0.0), array(0.0, 1.0, 0.0, 1.0), 2, 2),
                          graft_pq_encode(array(1.0, 0.0), array(0.0, 1.0, 0.0, 1.0), 2, 2)) AS selfd,
                graft_l2norm(array(3.0, 4.0)) AS nv""").head()
    assert(p.getSeq[Int](0) == Seq(1, 0))
    assert(p.getDouble(1) == 0.0)
    assert(p.getSeq[Double](2) == Seq(0.6, 0.8))
  }
}
