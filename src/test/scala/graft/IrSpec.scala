package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import graft.operators.TextAnalysis

/** Gates for the IR pair (q135 inverted index, q136 conjunctive
  * retrieval): posting-list shape under truncation, df exactness,
  * retrieval correctness vs a brute-force recompute, and the top-k
  * plan property. */
class IrSpec extends SparkSpec {

  test("q135: capped champion lists — exact df, bounded postings, ascending doc ids") {
    val idx = TextAnalysis.invertedIndex(spark, sfTiny, maxPost = 5).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val df = r.getAs[Long]("df")
      val posts = r.getAs[String]("postings").split(",").filter(_.nonEmpty)
      val truncated = r.getAs[Int]("truncated") == 1
      if (truncated) {
        assert(df > 5 && posts.length == 5,
          s"${r.getString(0)}: truncated row must store exactly maxPost entries")
      } else assert(posts.length == df,
        s"${r.getString(0)}: untruncated df $df != stored ${posts.length}")
      val ids = posts.map(_.split(":")(0).toLong)
      assert(ids.sameElements(ids.sorted), s"${r.getString(0)}: postings out of doc order")
      assert(posts.forall(_.split(":")(1).toLong >= 1))
    }
    assert(idx.exists(_.getAs[Int]("truncated") == 1),
      "vacuous: nothing truncated at maxPost=5 — corpus assumption broke")
  }

  test("postings merge is a SET union: doc re-delivered under a new batchId enters once") {
    // the batchId guard only stops exact replays; at-least-once upstream
    // can re-deliver a document in a LATER batch. The champion lists
    // must not carry a doc_id twice (it would displace a distinct doc);
    // df additivity under overlap is documented-unrecoverable, so only
    // the postings are asserted here.
    import graft.streaming.StreamingJobs
    val stateDir = java.nio.file.Files.createTempDirectory("graft_idx_redeliver").toString
    try {
      val docs = Tables.documents(spark, sfTiny).limit(20).localCheckpoint(true)
      StreamingJobs.applyIndexBatch(spark, docs, "text", 0L, maxPost = 100, stateDir)
      // batch 1 re-delivers HALF of batch 0's docs (new batchId — not a replay)
      StreamingJobs.applyIndexBatch(spark, docs.filter(col("doc_id") % 2 === 0),
        "text", 1L, maxPost = 100, stateDir)
      val state = StreamingJobs.latestAggState(spark, stateDir).get._2.collect()
      assert(state.nonEmpty)
      state.foreach { r =>
        val posts = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("posts")
          .map(_.getLong(0))
        assert(posts.distinct.size == posts.size,
          s"duplicate doc_id in postings of '${r.getAs[String]("term")}': $posts")
        assert(posts == posts.sorted, "postings lost their doc_id order")
      }
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sp, true)
    }
  }

  test("q136: conjunctive semantics and ranking vs brute force") {
    val terms = Seq("spark", "join", "window")
    val got = TextAnalysis.retrieveConjunctive(spark, sfTiny, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // brute force in local scala
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1).split("\\s+")))
    val scored = docs.flatMap { case (id, toks) =>
      val tf = toks.groupBy(identity).map { case (w, a) => (w, a.length.toLong) }
      if (terms.forall(tf.contains)) Some((id, terms.map(tf).sum)) else None
    }
    val expect = scored.sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    assert(got == expect, s"retrieval diverged:\n got    $got\n expect $expect")
    assert(got.nonEmpty, "vacuous: no document matched all query terms")
  }

  test("q136 plans as TakeOrderedAndProject (bounded top-k, no global sort)") {
    val df = TextAnalysis.retrieveConjunctive(spark, sfTiny, Seq("spark", "join"), k = 10)
    df.count() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      s"expected TakeOrderedAndProject in:\n$plan")
  }
}
