package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Contracts for the round-7 curation trio: q182 repetition filter
  * (exact fractions on a corpus with known repetition), q183
  * leakage-safe split (cluster-atomic by construction, and the doc-level
  * split provably leaks on the same corpus), q184 temperature mixture
  * draw (integer-exact targets, flattening property). */
class CurationSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_curation").toString
    val ss = spark; import ss.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q182 fractions are exact on known repetition shapes") {
    val dir = docsDir(Seq(
      // "a b" x3 of 5 bigrams, no repeated 5-gram: top2 = 3*3/11
      (1L, "a b a b a b", "s"),
      // 6-token phrase twice: two 5-grams repeat (2*14 + 2*14 = 56 chars
      // over 35), capped at 1.0; top2 tie resolves to "x1 x2" (2*5/35)
      (2L, "x1 x2 x3 x4 x5 x6 x1 x2 x3 x4 x5 x6", "s"),
      // all-distinct tokens: top2 cnt 1 (lexicographic argmax "w1 w2"),
      // no 5-gram dup -> keeps
      (3L, "w1 w2 w3 w4 w5 w6", "s")))
    val got = TextAnalysis
      .repetitionProfile(Tables.documents(spark, dir), 0.20, 0.15)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    val expected = Seq(
      (1L, math.rint(3.0 * 3 / 11 * 1e6) / 1e6, 0.0, false),
      (2L, math.rint(10.0 / 35 * 1e6) / 1e6, 1.0, false),
      (3L, math.rint(5.0 / 17 * 1e6) / 1e6, 0.0, false))
    // doc 3: top2_frac = len("w1 w2")=5 over 17 chars = 0.294 > 0.20 —
    // short docs trip the top-2 rule; lengthen to keep
    assert(got == expected, s"got $got")
  }

  test("q182 keeps fluent text and rejects stuffed text at the default gates") {
    // 40 distinct tokens: top2 1*len/chars is small, no dup 5-grams
    val fluent = (1 to 40).map(i => s"tok$i").mkString(" ")
    val stuffed = Seq.fill(20)("buy cheap pills now online").mkString(" ")
    val dir = docsDir(Seq((1L, fluent, "s"), (2L, stuffed, "s")))
    val got = TextAnalysis
      .repetitionProfile(Tables.documents(spark, dir), 0.20, 0.15)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(got(1L), "fluent doc must pass")
    assert(!got(2L), "keyword-stuffed doc must fail")
  }

  test("q183 is cluster-atomic; the q76 doc-level split leaks on the same corpus") {
    val split = Dedup.leakSafeSplit(spark, sfSmall, threshold = 0.8)
      .localCheckpoint(true)
    val perCluster = split.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_docs"))
      .localCheckpoint(true)
    assert(perCluster.filter(col("n_splits") > 1).count() == 0,
      "a dup cluster straddles splits")
    // the corpus must actually exercise the property (multi-doc clusters
    // exist), otherwise the assertion above is vacuous
    val multi = perCluster.filter(col("n_docs") > 1).count()
    assert(multi > 0, "no multi-doc clusters at sf0.01 — vacuous test")
    // same clusters under the DOC-level md5 split: at least one multi-doc
    // cluster draws two different splits (the leak q183 exists to prevent)
    val naive = split.select(col("doc_id"), col("cluster_id"))
      .withColumn("b",
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long") % 100)
      .withColumn("nsplit", when(col("b") < 80, "train")
        .when(col("b") < 90, "val").otherwise("test"))
    val leaked = naive.groupBy("cluster_id")
      .agg(countDistinct(col("nsplit")).as("k"))
      .filter(col("k") > 1).count()
    assert(leaked > 0, "doc-level split did not leak — demonstration vacuous")
  }

  test("q184 targets are integer-exact and temperature-flattened") {
    val rows =
      (1L to 100L).map(i => (i, s"alpha doc $i", "big")) ++
        (101L to 104L).map(i => (i, s"beta doc $i", "mid")) ++
        Seq((105L, "gamma doc", "tiny"))
    val dir = docsDir(rows)
    val got = TextAnalysis.temperatureMixtureSample(
      Tables.documents(spark, dir), "source", "doc_id", budget = 60)
      .localCheckpoint(true)
    // w = isqrt(100)=10, isqrt(4)=2, isqrt(1)=1; sw=13
    // targets: big 60*10 div 13 = 46, mid 120 div 13 = 9, tiny 60 div 13 = 4
    val targets = got.select("source", "n_docs", "target").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(targets == Set(("big", 100L, 46L), ("mid", 4L, 9L), ("tiny", 1L, 4L)),
      s"got $targets")
    // drawn rows: capped by group population
    val drawn = got.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(drawn == Map("big" -> 46L, "mid" -> 4L, "tiny" -> 1L), s"got $drawn")
    // α=1/2 flattening: sampled ratio big:mid (46:9 targets) is far below
    // the population ratio 100:4
    assert(46.0 / 9 < 100.0 / 4)
    // determinism: a second draw is identical
    val again = TextAnalysis.temperatureMixtureSample(
      Tables.documents(spark, dir), "source", "doc_id", budget = 60)
    assert(got.collect().toSeq == again.collect().toSeq)
  }

  test("q185 streamed mixture draw == one-shot q184 draw; replay is a no-op") {
    // streamed == batch at sf0.001 (q185 also carries q184's oracle at
    // the driver gate; this pins it in-suite at a second batch split)
    val batch = TextAnalysis.temperatureMixtureSample(
      Tables.documents(spark, sfTiny), "source", "doc_id", budget = 60)
      .collect().toSeq
    val streamed = TextAnalysis.streamedMixtureSample(
      spark, sfTiny, budget = 60, nBatches = 4).collect().toSeq
    assert(streamed == batch)
    // exactly-once: re-applying an already-committed batchId changes
    // neither state (the versioned-commit contract on both halves)
    val dirS = java.nio.file.Files.createTempDirectory("graft_mixA").toString
    val dirC = java.nio.file.Files.createTempDirectory("graft_mixB").toString
    val docs = Tables.documents(spark, sfTiny)
    graft.streaming.StreamingJobs.applySampleBatch(
      spark, docs, 0L, "source", "doc_id", 60, dirS)
    graft.streaming.StreamingJobs.applyGroupCountBatch(
      spark, docs, "source", 0L, dirC)
    val c1 = graft.streaming.StreamingJobs.latestAggState(spark, dirC).get._2
      .collect().toSet
    graft.streaming.StreamingJobs.applyGroupCountBatch(
      spark, docs, "source", 0L, dirC) // replayed batchId
    val c2 = graft.streaming.StreamingJobs.latestAggState(spark, dirC).get._2
      .collect().toSet
    assert(c1 == c2, "replayed count batch mutated state")
  }

  /** Single-threaded reference BPE (Sennrich §3.2): weighted pair counts
    * over the vocab, (max freq, lexicographic) argmax, left-to-right
    * non-overlapping merge. The distributed q186 must match exactly. */
  private def refBpe(words: Seq[(String, Long)], k: Int)
      : (Seq[(Int, String, String, Long)], Seq[(Vector[String], Long)]) = {
    var vocab: Seq[(Vector[String], Long)] =
      // code-point split (not UTF-16 units), matching Spark/DuckDB
      words.map { case (w, c) =>
        (w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toVector :+ "</w>") -> c
      }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        (0 until syms.length - 1).foreach { i =>
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val ((a, b), f) = counts.toSeq
        .sortBy { case ((x, y), n) => (-n, x, y) }.head
      out += ((step, a, b, f))
      vocab = vocab.map { case (syms, c) =>
        val buf = Vector.newBuilder[String]; var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            buf += a + b; i += 2
          } else { buf += syms(i); i += 1 }
        }
        buf.result() -> c
      }
    }
    (out.result(), vocab)
  }

  test("q186 distributed BPE == reference BPE, including adjacent-occurrence merges") {
    // 'abab' forces the adjacent-occurrence case: after merging (a, b)
    // both occurrences must merge in the SAME pass (the double-space
    // encoding claim); 'aaa' exercises overlapping-count + greedy merge
    val corpus = Seq(
      (1L, "low low low lower lower", "s"),
      (2L, "newest newest newest widest widest abab abab abab", "s"),
      (3L, "abab aaa aaa low newest", "s"))
    val dir = docsDir(corpus)
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }.toSeq
    val (expected, refVocab) = refBpe(words, 8)
    val got = TextAnalysis.bpeMerges(spark, dir, 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // q187: the distributed post-merge subword stats equal the reference
    // final vocabulary's explode+aggregate
    val refStats = refVocab
      .flatMap { case (syms, c) => syms.map(t => (t, c, syms)) }
      .groupBy(_._1)
      .map { case (t, g) =>
        (t, g.map(_._2).sum, g.map(_._3).distinct.size.toLong) }
      .toSeq.sortBy { case (t, f, _) => (-f, t) }
    val gotStats = TextAnalysis.bpeSubwordStats(spark, dir, 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotStats == refStats, s"got $gotStats\nexpected $refStats")
  }

  test("batched BPE == sequential BPE at depth (k=20) on the adversarial shapes") {
    // same corpus as above: 'abab' (adjacent occurrences), 'aaa'
    // (overlapping counts) are exactly the shapes where a careless
    // batch rule diverges from one-merge-at-a-time; 24 merges walk the
    // vocabulary deep into the multi-round regime (21 merges exhaust it)
    val corpus = Seq(
      (1L, "low low low lower lower", "s"),
      (2L, "newest newest newest widest widest abab abab abab", "s"),
      (3L, "abab aaa aaa low newest", "s"),
      // non-BMP (supplementary-plane) symbols: Spark/DuckDB split words
      // by CODE POINT, so the local trainer must too — a UTF-16-unit
      // split would hand it lone-surrogate symbols here and the three
      // trainers would diverge (the stats routing must be invisible)
      (4L, "🦙ab 🦙ab 🦙ab 🦙z", "s"))
    val docs = Tables.documents(spark, docsDir(corpus))
    val (batched, _) = TextAnalysis.bpeTrainBatched(docs, 20)
    val (sequential, _) = TextAnalysis.bpeTrainSequential(docs, 20)
    assert(batched == sequential,
      s"batch rule diverged from the sequential reference:\n" +
        s" batched    $batched\n sequential $sequential")
    // the third trainer — the stats-routed driver-local loop — commits
    // the identical merge sequence (same counts, same UTF-8 tie-break,
    // same left-to-right merge)
    val words = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (local, _) = TextAnalysis.bpeTrainLocalArr(words, 20)
    assert(local == sequential,
      s"local loop diverged:\n local      $local\n sequential $sequential")
  }

  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0

  test("q196 BPE encode equals the reference segmentation and round-trips to the text") {
    val corpus = Seq(
      (1L, "low low low lower lower", "s"),
      (2L, "newest newest widest abab 🦙ab 🦙ab", "s"),
      (3L, "   ", "s"), // whitespace-only doc -> EMPTY sequence, not null
      (4L, "abab aaa low", "s"))
    val dir = docsDir(corpus)
    val k = 8
    val model = TextAnalysis.bpeModel(spark, dir, k)
    // the vocab is a function of the symbol string: distinct syms, distinct ids
    assert(model.vocab.map(_._1).distinct.size == model.vocab.size)
    assert(model.vocab.map(_._2).distinct.size == model.vocab.size)

    // expected ids from the single-threaded reference: base alphabet
    // (code points + </w>) in UTF-8-binary order, then merge products
    val docWords = corpus.map { case (id, t, _) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val wordCounts = docWords.values.flatten.toSeq.groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }.toSeq
    val (refMerges, refVocab) = refBpe(wordCounts, k)
    val base = wordCounts.flatMap(_._1.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))).distinct
      .:+("</w>").sortWith(utf8Lt)
    val ids = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    base.zipWithIndex.foreach { case (c, i) => ids.update(c, i) }
    refMerges.foreach { case (step, a, b, _) =>
      if (!ids.contains(a + b)) ids.update(a + b, base.length + step - 1) }
    assert(model.vocab.toMap == ids.toMap,
      s"vocab diverged:\n got ${model.vocab.sortBy(_._2)}\n ref ${ids.toSeq.sortBy(_._2)}")
    // refBpe keeps vocab aligned with the words seq it was given
    val wordToSyms = wordCounts.map(_._1).zip(refVocab.map(_._1)).toMap
    val expected = docWords.map { case (id, ws) =>
      id -> ws.flatMap(w => wordToSyms(w)).map(ids(_)).toList }

    val enc = TextAnalysis.bpeEncodeDocs(Tables.documents(spark, dir), model)
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Int]]("token_ids").toList,
        r.getAs[Int]("n_tokens"))).toSeq.sortBy(_._1)
    assert(enc.map(_._1) == corpus.map(_._1), "every doc must encode")
    enc.foreach { case (id, tids, n) =>
      assert(n == tids.length)
      assert(tids == expected(id), s"doc $id: got $tids expected ${expected(id)}")
    }
    // round-trip: decode via the reversed vocab; </w> re-separates words
    val toSym = model.vocab.map { case (sym, i) => i -> sym }.toMap
    enc.foreach { case (id, tids, _) =>
      val decoded = tids.map(toSym).mkString
        .split("</w>", -1).toSeq.filter(_.nonEmpty)
      assert(decoded == docWords(id), s"doc $id round-trip: $decoded")
    }
    // determinism + artifact round-trip (the S6 contract)
    val again = TextAnalysis.bpeEncodeDocs(Tables.documents(spark, dir), model)
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Int]]("token_ids").toList)).toSeq.sortBy(_._1)
    assert(again == enc.map(t => (t._1, t._2)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_art").toString
    TextAnalysis.saveBpeModel(spark, model, tmp)
    val loaded = TextAnalysis.loadBpeModel(spark, tmp, k)
    assert(loaded.merges == model.merges && loaded.vocab.toMap == model.vocab.toMap,
      "persisted tokenizer artifact did not round-trip")
  }
}
