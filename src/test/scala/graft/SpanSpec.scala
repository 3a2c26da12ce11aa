package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** q161/q162 contract on a hand-built corpus where the maximal shared
  * spans are known exactly: extents are MAXIMAL (the full repeated run,
  * not its fixed-n windows), keep-first excision cuts only the
  * higher-id document, and overlapping cut intervals union before
  * counting. */
class SpanSpec extends SparkSpec {

  // doc 10: p1..p15; doc 11: p1..p10 (repeats 10's prefix); doc 12:
  // p6..p15 (repeats 10's suffix AND overlaps 11 on p6..p10)
  private def corpus: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_span_corpus").toString
    val ss = spark; import ss.implicits._
    Seq(
      (10L, (1 to 15).map(i => s"p$i").mkString(" ")),
      (11L, (1 to 10).map(i => s"p$i").mkString(" ")),
      (12L, (6 to 15).map(i => s"p$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q161 spans are maximal extents with exact 1-based offsets") {
    val dir = corpus
    val got = Dedup.sharedSpans(spark, dir, n = 3, minLen = 5, maxOcc = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // (d1, d2, start1, start2, len): 10-11 share p1..p10 (10 tokens),
    // 10-12 share p6..p15 (10 tokens, at 12's position 1), 11-12 share
    // p6..p10 (5 tokens, 11's position 6, 12's position 1)
    val expected = Seq(
      (10L, 11L, 1L, 1L, 10L),
      (10L, 12L, 6L, 1L, 10L),
      (11L, 12L, 6L, 1L, 5L))
    assert(got == expected, s"got $got")
  }

  test("q162 profile cuts only higher-id docs and unions overlapping intervals") {
    val dir = corpus
    val got = Dedup.substrDedupProfile(spark, dir, n = 3, minLen = 5, maxOcc = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // doc 10 is the keeper (never cut, absent from the profile);
    // doc 11: cut [1,10] -> 10 tokens cut, 0 kept;
    // doc 12: cuts [1,10] (vs 10) and [1,5] (vs 11) OVERLAP -> union
    // [1,10] -> one span, 10 cut, 0 kept — double counting the overlap
    // would report 15
    val expected = Seq((11L, 1L, 10L, 0L), (12L, 1L, 10L, 0L))
    assert(got == expected, s"got $got")
  }

  test("hot-span df-cut splits, never invents: maxOcc=2 still finds sub-runs") {
    val dir = corpus
    // p6..p8 etc. occur in all 3 docs (occ 3 > 2) -> those windows drop;
    // remaining runs must still be genuine shared spans, each a subset
    // of a true maximal span, and nothing below minLen survives
    val full = Dedup.sharedSpans(spark, dir, n = 3, minLen = 5, maxOcc = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val cut = Dedup.sharedSpans(spark, dir, n = 3, minLen = 5, maxOcc = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(cut.forall { case (d1, d2, s1, len) =>
      full.exists { case (f1, f2, fs1, flen) =>
        f1 == d1 && f2 == d2 && s1 >= fs1 && s1 + len <= fs1 + flen }
    }, s"df-cut invented a span: $cut vs $full")
  }
}
