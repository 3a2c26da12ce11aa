package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Text analysis suite (north-star: lang-ID, quality scoring, token counts,
  * fingerprinting) over the `documents` table. Everything is built-in
  * Column expressions (codegen'd) — no UDFs — and every query has a DuckDB
  * oracle that replicates the heuristic exactly.
  *
  * The reference's text processing is HTML-strip + whitespace-collapse +
  * lower (app/preprocess_data.py:24-34,95-103); these operators extend that
  * surface to what a large-scale LLM-training-data pipeline needs. */
object TextAnalysis {

  /** Tokens: lowercase, whitespace-split. */
  private def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Marker-word count for a language profile (word-boundary regex). */
  private def markers(c: Column, words: Seq[String]): Column =
    words.map(w => regexp_count(lower(c), lit(s"\\b$w\\b"))).reduce(_ + _)

  private val enW = Seq("the", "and", "of", "to")
  private val esW = Seq("el", "la", "los", "de")
  private val frW = Seq("le", "les", "des", "et")
  private val deW = Seq("der", "die", "und", "das")

  /** q40: n-gram/stopword-profile language ID — score each language by
    * marker-word hits, argmax with fixed precedence (en>es>fr>de>und).
    * The synthetic corpus is the same word soup for every `lang`, so the
    * interesting property is determinism + agreement with the oracle, not
    * accuracy. */
  val q40LangId = GraftQuery(
    "q40_lang_id",
    "north-star lang-id; F5,F6",
    (s, d) => {
      val doc = Tables.documents(s, d)
      val scored = doc.select(
        col("doc_id"), col("lang").as("lang_actual"),
        markers(col("text"), enW).as("s_en"),
        markers(col("text"), esW).as("s_es"),
        markers(col("text"), frW).as("s_fr"),
        markers(col("text"), deW).as("s_de"))
      scored.withColumn("lang_pred",
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
               col("s_en") >= col("s_de") && col("s_en") > 0, "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de") &&
                col("s_es") > 0, "es")
          .when(col("s_fr") >= col("s_de") && col("s_fr") > 0, "fr")
          .when(col("s_de") > 0, "de")
          .otherwise("und"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang AS lang_actual,
      len(regexp_extract_all(lower(text), '\bthe\b')) + len(regexp_extract_all(lower(text), '\band\b'))
        + len(regexp_extract_all(lower(text), '\bof\b')) + len(regexp_extract_all(lower(text), '\bto\b')) AS s_en,
      len(regexp_extract_all(lower(text), '\bel\b')) + len(regexp_extract_all(lower(text), '\bla\b'))
        + len(regexp_extract_all(lower(text), '\blos\b')) + len(regexp_extract_all(lower(text), '\bde\b')) AS s_es,
      len(regexp_extract_all(lower(text), '\ble\b')) + len(regexp_extract_all(lower(text), '\bles\b'))
        + len(regexp_extract_all(lower(text), '\bdes\b')) + len(regexp_extract_all(lower(text), '\bet\b')) AS s_fr,
      len(regexp_extract_all(lower(text), '\bder\b')) + len(regexp_extract_all(lower(text), '\bdie\b'))
        + len(regexp_extract_all(lower(text), '\bund\b')) + len(regexp_extract_all(lower(text), '\bdas\b')) AS s_de,
      CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
           WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
           WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
           WHEN s_de > 0 THEN 'de'
           ELSE 'und' END AS lang_pred
      FROM documents ORDER BY doc_id"""))

  // --- Gopher-style repetition signals (q41/q46) -----------------------

  /** All overlapping 2-grams of a token array, in document order (NOT
    * distinct — frequency is the point). The outer single-element
    * transform LET-BINDS the token array to a lambda variable: predicate
    * pushdown substitutes aliases into filter conditions, and without the
    * binding an inlined `split()` would re-tokenize the document once per
    * element_at (HOFs are interpreted, no subexpression reuse — the q53
    * lesson, here in pushed-down-filter form: q46 went 0.4s -> 6.6s). */
  private def twoGrams(t: Column): Column =
    flatten(transform(array(t), tt =>
      transform(sequence(lit(1), size(tt) - 1), i =>
        concat_ws(" ", element_at(tt, i), element_at(tt, i + 1)))))

  /** Highest occurrence count of any array element, computed as the max
    * run length of the SORTED array — one O(n log n) pass per row, no
    * per-row quadratic count-each-distinct scan (the oracle does the
    * quadratic form; both produce the same integer). */
  private def maxFreq(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Fraction of tokens covered by the single most frequent 2-gram
    * (Gopher's "top n-gram fraction" repetition signal; boilerplate and
    * generated spam push it up). */
  private def top2gramFrac(t: Column): Column =
    when(size(t) >= 2,
      round(maxFreq(twoGrams(t)) * lit(2.0) / size(t), 4))
      .otherwise(lit(0.0))

  /** Fraction of duplicated lines (Gopher's duplicate-line signal;
    * single-line documents score 0 by construction). */
  private def dupLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    round(lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines), 4)
  }

  /** q41: quality scoring — length, token stats, punctuation ratio,
    * stopword ratio, repetition signals (duplicate-line ratio, top-2-gram
    * fraction — the Gopher additions), and a keep/drop flag (the
    * C4/Gopher-style filter shape; repetition gates at Gopher's 0.2
    * top-n-gram / 0.3 dup-line levels). */
  val q41QualityScore = GraftQuery(
    "q41_quality_score",
    "north-star quality scoring; F6,F8,A5; Gopher repetition signals",
    (s, d) => {
      // token array materialized once; downstream size/filter read it
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          length(col("text")).as("n_char"),
          regexp_count(col("text"), lit("[\\p{Punct}]")).as("n_punct"),
          dupLineRatio(col("text")).as("dup_line_ratio"),
          toks(col("text")).as("t"))
        .select(
          col("doc_id"), col("n_char"),
          size(col("t")).as("n_tok"),
          round(col("n_char").cast("double") / size(col("t")), 4).as("chars_per_tok"),
          col("n_punct"),
          size(filter(col("t"), t => t.isInCollection(stopwords))).as("n_stop"),
          col("dup_line_ratio"),
          top2gramFrac(col("t")).as("top_2gram_frac"))
        .withColumn("stop_ratio",
          round(col("n_stop").cast("double") / col("n_tok"), 4))
        .withColumn("keep",
          col("n_tok") >= 20 && col("stop_ratio") <= 0.5 &&
            col("dup_line_ratio") <= 0.3 && col("top_2gram_frac") <= 0.2)
        .orderBy(col("doc_id"))
    },
    Some("""WITH tk AS (
        SELECT doc_id, text,
          string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      gr AS (
        SELECT doc_id, text, t,
          CASE WHEN len(t) >= 2
            THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
            ELSE [] END AS g
        FROM tk),
      m AS (
        SELECT doc_id,
          length(text) AS n_char,
          len(t) AS n_tok,
          round(length(text)::DOUBLE / len(t), 4) AS chars_per_tok,
          len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct,
          len(list_filter(t, x -> x IN ('the','a','of','and','to','in'))) AS n_stop,
          round(1.0 - len(list_distinct(string_split(text, chr(10))))::DOUBLE
            / len(string_split(text, chr(10))), 4) AS dup_line_ratio,
          CASE WHEN len(t) >= 2
            THEN round(list_max(list_transform(list_distinct(g),
              x -> len(list_filter(g, y -> y = x)))) * 2.0 / len(t), 4)
            ELSE 0.0 END AS top_2gram_frac
        FROM gr)
      SELECT doc_id, n_char, n_tok, chars_per_tok, n_punct, n_stop,
        dup_line_ratio, top_2gram_frac,
        round(n_stop::DOUBLE / n_tok, 4) AS stop_ratio,
        (n_tok >= 20 AND round(n_stop::DOUBLE / n_tok, 4) <= 0.5 AND
         dup_line_ratio <= 0.3 AND top_2gram_frac <= 0.2) AS keep
      FROM m ORDER BY doc_id"""))

  /** q42: token counting — whitespace tokens and a BPE-ish regex
    * tokenizer (letter runs / digit runs / single punctuation), the
    * standard pre-tokenization shape. */
  val q42TokenCount = GraftQuery(
    "q42_token_count",
    "north-star token counting; F6,F8",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks(col("text"))).as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).as("bpe_tokens"))
        .select(
          col("doc_id"), col("ws_tokens"), col("bpe_tokens"),
          round(col("bpe_tokens").cast("double") /
            greatest(col("ws_tokens"), lit(1)), 4).as("fertility"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      len(string_split_regex(lower(trim(text)), '\s+')) AS ws_tokens,
      len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS bpe_tokens,
      round(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::DOUBLE
        / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1), 4) AS fertility
      FROM documents ORDER BY doc_id"""))

  /** q43: document fingerprinting — md5 over the normalized text (lower,
    * whitespace-collapse, trim), the reference's jobDescClean
    * normalization (app/preprocess_data.py:95-103) made content-addressable. */
  val q43Fingerprint = GraftQuery(
    "q43_fingerprint",
    "north-star fingerprinting; F5,F6,D1",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))
            .cast("binary")).as("fingerprint"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
      FROM documents ORDER BY doc_id"""))

  /** q44: the reference's full Stage-1 preprocessing chain as one
    * declarative plan (app/preprocess_data.py:122-130: html-strip ->
    * null-fill -> exact dedup keep-first -> string cleaning -> projection).
    * The testdata has no raw HTML, so the scan wraps text in markup first
    * — the strip (F1, the regexp approach documented in SURVEY §2.4) then
    * has real work to do. Title-case is upper-head+lower-tail (documented
    * delta vs Python str.title, SURVEY §7.3). Dedup is order-stable
    * keep-first on the normalized-text fingerprint (D1 + q43). */
  val q44PreprocessPipeline = GraftQuery(
    "q44_preprocess_pipeline",
    "F1,F2,F3,F4,F5,F6,F7,P1,P2,P3,P4,D1; §3.1 Stage 1 composite",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val raw = Tables.documents(s, d).select(
        col("doc_id"),
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
          .as("html"),
        concat(col("lang"), lit(" ,")).as("lang_dirty"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("source")).as("source_maybe"))
      val cleaned = raw
        .withColumn("stripped",
          trim(regexp_replace(regexp_replace(col("html"), "<[^>]*>", " "), "\\s+", " ")))
        .withColumn("clean_text", lower(col("stripped")))
        .withColumn("lang_clean",
          regexp_replace(col("lang_dirty"), "\\s*,\\s*$", ""))
        .withColumn("source_filled", coalesce(col("source_maybe"), lit("Unknown")))
        .withColumn("source_title",
          concat(upper(substring(col("source_filled"), 1, 1)),
            lower(substring(col("source_filled"), 2, 1000000))))
        .withColumn("fp", md5(col("clean_text").cast("binary")))
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      cleaned
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), length(col("clean_text")).as("clean_len"),
          col("lang_clean"), col("source_title"), col("fp"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH raw AS (
        SELECT doc_id,
          '<html><body><p>' || text || '</p></body></html>' AS html,
          lang || ' ,' AS lang_dirty,
          CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS source_maybe
        FROM documents),
      cleaned AS (
        SELECT doc_id,
          lower(trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))) AS clean_text,
          regexp_replace(lang_dirty, '\s*,\s*$', '') AS lang_clean,
          coalesce(source_maybe, 'Unknown') AS source_filled
        FROM raw),
      titled AS (
        SELECT doc_id, clean_text, lang_clean,
          upper(substr(source_filled, 1, 1)) || lower(substr(source_filled, 2)) AS source_title,
          md5(clean_text) AS fp
        FROM cleaned),
      deduped AS (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM titled)
      SELECT doc_id, length(clean_text) AS clean_len, lang_clean, source_title, fp
      FROM deduped WHERE rn = 1 ORDER BY doc_id"""))

  /** q45: corpus vocabulary profile — term frequencies + document
    * frequencies via explode, the Zipf-curve / stopword-discovery stats a
    * training-data pipeline derives before setting df-cuts (see SCALE.md
    * sketch-dedup section). Shuffle volume is bounded by vocabulary size
    * after the partial aggregate, not token count. */
  /** EXACT heavy hitters (all terms with count >= ceil(total/denom)) in
    * two bounded passes — the scale answer to "top frequent tokens" when
    * the vocabulary itself is too big to shuffle (q45 shuffles one row
    * per distinct term; at web scale that is billions of rows for a
    * handful of answers):
    *
    *   pass 1 (bounded memory): per-partition Misra-Gries summaries over
    *   the token stream — k counters, decrement-all on overflow,
    *   amortized O(1)/token. MG guarantees any term with local count
    *   > n_p/k survives partition p, so with k > maxNp·parts/minCount a
    *   term with GLOBAL count >= minCount (which by pigeonhole has local
    *   count >= minCount/parts somewhere) is guaranteed a candidate —
    *   k is computed from measured partition sizes, making the guarantee
    *   a theorem about this run, not a hope. No shuffle; the output is
    *   the candidate term set, bounded by parts·k.
    *
    *   pass 2 (bounded shuffle): exact counts for candidates only —
    *   broadcast semi-join against the candidate set, then a groupBy
    *   whose cardinality is the candidate count, never the vocabulary.
    *
    * False positives are filtered by the exact threshold; false
    * negatives are impossible by the k bound — so the result is EXACT
    * and the DuckDB oracle replays it with a plain GROUP BY/HAVING. */
  def heavyHitters(s: SparkSession, d: String, denom: Int): DataFrame = {
    require(denom >= 1, s"denominator must be >= 1, got $denom")
    import s.implicits._
    val tok = Tables.documents(s, d).select(explode(toks(col("text"))).as("term"))
    val termDs = tok.as[String]
    // pass 0: per-partition token counts (one cheap scan, <= parts rows)
    val partCounts = termDs.mapPartitions { it =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }.collect()
    val total = partCounts.sum
    val minCount = (total + denom - 1) / denom
    val parts = math.max(1, partCounts.length)
    val maxNp = if (partCounts.isEmpty) 0L else partCounts.max
    val k = math.max(64L, maxNp * parts / math.max(1L, minCount) + 1L).toInt
    val cands = termDs.mapPartitions { it =>
      val c = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        c.get(t) match {
          case Some(v) => c.update(t, v + 1)
          case None if c.size < k => c.update(t, 1L)
          case None =>
            // decrement-all: consumes k+1 units of count mass, so at most
            // n_p/(k+1) rounds ever run — amortized linear
            c.keysIterator.toArray.foreach { key =>
              val v = c(key)
              if (v == 1L) c.remove(key) else c.update(key, v - 1)
            }
        }
      }
      c.keysIterator
    }.toDF("term").distinct()
    tok.join(broadcast(cands), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("term"))
  }

  /** q132: exact corpus heavy hitters at >= 0.1% of all tokens. */
  val q132HeavyHitters = GraftQuery(
    "q132_heavy_hitters",
    "A ext; exact heavy hitters: Misra-Gries candidates + candidate-only exact pass",
    (s, d) => heavyHitters(s, d, denom = 1000),
    Some("""WITH tk AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      t AS (SELECT count(*) AS n FROM tk)
      SELECT term, CAST(count(*) AS BIGINT) AS cnt
      FROM tk, t
      GROUP BY term, n
      HAVING count(*) >= (n + 999) // 1000
      ORDER BY cnt DESC, term"""))

  /** q134: q132's answer maintained INCREMENTALLY — the corpus arrives
    * as batches, each merged into a ≤ k-row Misra-Gries summary on the
    * engine's versioned batchId-idempotent state contract
    * ([[graft.streaming.StreamingJobs.applyMgBatch]]; the live-stream
    * form is runStreamingHeavyHitters, gated in StreamingSpec), then one
    * candidate-only exact pass turns the summary into the exact answer.
    * k = denom makes the merged-summary undercount (≤ n/(k+1)) smaller
    * than the threshold (≥ n/denom), so no true heavy hitter can die in
    * a reduction — the incremental path provably returns q132's result
    * and shares its oracle. State and per-batch work stay bounded by k +
    * batch vocabulary, never corpus vocabulary: this is the form that
    * survives a corpus that never stops growing. */
  def streamedHeavyHitters(s: SparkSession, d: String, denom: Int,
      nBatches: Int): DataFrame = {
    require(denom >= 1 && nBatches >= 1)
    val k = denom // k+1 > denom: the catch bound (see scaladoc)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_hh_state").toString
    val docs = Tables.documents(s, d)
    // try/finally: a failing batch/drain must not leak the temp state dir
    val (total, candTerms) = try {
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingJobs.applyMgBatch(s,
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === i),
          "text", i.toLong, k, stateDir)
      }
      val state = graft.streaming.StreamingJobs.latestAggState(s, stateDir).get._2
      (state.agg(max(col("total_n"))).head().getLong(0),
        state.filter(col("term").isNotNull)
          .select(col("term")).collect().map(_.getString(0)).toSeq)
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    }
    val minCount = (total + denom - 1) / denom
    import s.implicits._
    val cands = candTerms.toDF("term")
    docs.select(explode(toks(col("text"))).as("term"))
      .join(broadcast(cands), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("term"))
  }

  val q134StreamedHeavyHitters = GraftQuery(
    "q134_streamed_heavy_hitters",
    "A ext + streaming: incremental Misra-Gries summary -> candidate-only exact pass",
    (s, d) => streamedHeavyHitters(s, d, denom = 1000, nBatches = 4),
    q132HeavyHitters.oracle)

  /** q135: inverted index construction — the IR-side artifact a corpus
    * engine owes its retrieval layer (public shape: Manning et al.,
    * champion lists). One (term, doc) tf aggregate (shuffle = token
    * stream, the unavoidable cost), then one per-term aggregate whose
    * output row is BOUNDED: df is exact over all postings, but the
    * stored list is capped at `maxPost` entries in doc_id order with a
    * truncation flag — a hot term (stopword) costs a capped row, never
    * an unbounded one (the q58 df-cut discipline applied to the payload
    * instead of the candidate set). Postings serialize as "doc:tf" CSV
    * so the oracle compares bit-exactly. */
  def invertedIndex(s: SparkSession, d: String, maxPost: Int): DataFrame = {
    require(maxPost >= 1)
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term")).agg(
        count(lit(1)).as("df"),
        array_join(
          slice(
            transform(
              array_sort(collect_list(struct(col("doc_id"), col("tf")))),
              x => concat(x.getField("doc_id").cast("string"), lit(":"),
                x.getField("tf").cast("string"))),
            1, maxPost),
          ",").as("postings"),
        (count(lit(1)) > maxPost).cast("int").as("truncated"))
      .orderBy(col("term"))
  }

  /** Mergeable inverted-index state of a document frame: (term, df,
    * posts) with posts the doc_id-lowest maxPost (doc_id, tf) structs.
    * df is additive and capped bottom-k posts merge exactly across
    * document-disjoint batches — see StreamingJobs.applyIndexBatch. */
  def indexState(df: DataFrame, textCol: String, maxPost: Int): DataFrame = {
    require(maxPost >= 1)
    df.select(col("doc_id"), explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        slice(array_sort(collect_list(struct(col("doc_id"), col("tf")))),
          1, maxPost).as("posts"))
  }

  /** Render (term, df, posts) state in q135's exact output shape. */
  private def renderIndex(state: DataFrame, maxPost: Int): DataFrame =
    state.select(col("term"), col("df"),
      array_join(
        transform(col("posts"),
          x => concat(x.getField("doc_id").cast("string"), lit(":"),
            x.getField("tf").cast("string"))), ",").as("postings"),
      (col("df") > maxPost).cast("int").as("truncated"))
      .orderBy(col("term"))

  val q135InvertedIndex = GraftQuery(
    "q135_inverted_index",
    "IR ext: inverted index with capped champion posting lists",
    (s, d) => invertedIndex(s, d, maxPost = 100),
    Some("""WITH tk AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT term, doc_id, count(*) AS tf FROM tk GROUP BY 1, 2)
      SELECT term, CAST(count(*) AS BIGINT) AS df,
        array_to_string((list(doc_id || ':' || tf ORDER BY doc_id))[1:100], ',') AS postings,
        CAST(count(*) > 100 AS INT) AS truncated
      FROM tf GROUP BY term ORDER BY term"""))

  /** q136: conjunctive boolean retrieval ranked by total term frequency
    * — "docs containing ALL query terms". The query-term filter sits
    * BELOW the (doc, term) aggregate, so only tokens matching the query
    * vocabulary ever shuffle: at 100 TB the scan discards everything
    * else at source and the downstream state is O(matching docs). All-
    * integer scoring (no transcendentals) keeps the ranking bit-stable
    * cross-engine (the q78 lesson); ties break on doc_id and the top-k
    * plans as TakeOrderedAndProject, never a global sort. */
  def retrieveConjunctive(s: SparkSession, d: String, terms: Seq[String],
      k: Int): DataFrame = {
    val qt = terms.map(_.toLowerCase).distinct
    require(qt.nonEmpty && k >= 1)
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .filter(col("term").isin(qt: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("total_tf"))
      .filter(col("n_terms") === qt.size)
      .select(col("doc_id"), col("total_tf"))
      .orderBy(col("total_tf").desc, col("doc_id"))
      .limit(k)
  }

  val q136BooleanRetrieval = GraftQuery(
    "q136_boolean_retrieval",
    "IR ext: conjunctive (AND) retrieval, tf-ranked, filter-below-agg",
    (s, d) => retrieveConjunctive(s, d, Seq("spark", "join", "window"), k = 10),
    Some("""WITH tk AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tk
        WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2)
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY doc_id HAVING count(*) = 3
      ORDER BY total_tf DESC, doc_id LIMIT 10"""))

  /** q141: disjunctive (OR) top-k retrieval with a RATIONAL BM25
    * surrogate — completes the IR trio (q135 index, q136 AND, q141
    * ranked OR). Per matching term the contribution is
    * idfR(t) · tf/(tf + k1·(1−b + b·len/avglen)) with
    * idfR = (N − df + 0.5)/(df + 0.5): BM25's saturation and
    * length-normalization shape with the log replaced by its rational
    * argument — a DELIBERATE engine choice so every arithmetic step is
    * an IEEE exactly-rounded op over exact integers and the ranking is
    * bit-stable cross-engine (the q78 ln() lesson). Like Lucene's
    * log(1+r) clamp, idfR stays POSITIVE for terms in >50% of
    * documents where raw log(r) goes negative and inverts rankings —
    * for a single term any positive idf induces the identical ranking
    * (ExtOpsSpec proves equality with positive-log BM25); multi-term
    * rankings differ from the log form only in cross-term weighting.
    * The per-document SUM over query terms is hash-fragile if left to
    * aggregate order, so terms are PIVOTED to fixed columns and added
    * in one spelled-out left-to-right chain — both engines add the
    * same doubles in the same order. The query-vocabulary filter sits
    * below the first aggregate (only matching tokens shuffle) and the
    * top-k plans as TakeOrderedAndProject, exactly like q136. */
  def bm25Retrieve(s: SparkSession, d: String, terms: Seq[String],
      k1: Double, b: Double, k: Int): DataFrame = {
    val qt = terms.map(_.toLowerCase).distinct
    require(qt.nonEmpty && k >= 1)
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
    val lens = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val tot = lens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("total_len"))
    val tf = tok.filter(col("term").isin(qt: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(df_), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(tot))
      .withColumn("idfr",
        (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
      .withColumn("bl",
        lit(b) * col("len").cast("double") * col("n_docs") / col("total_len"))
      .withColumn("c", col("idfr") *
        (col("tf").cast("double") /
          (col("tf") + lit(k1) * (lit(1.0 - b) + col("bl")))))
    // fixed-order pivot: one column per query term, summed left-to-right
    val termCols = qt.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("c"))), lit(0.0)).as(s"c$i")
    }
    val pivoted = contrib.groupBy(col("doc_id"))
      .agg(termCols.head, termCols.tail: _*)
    val score = qt.indices.map(i => col(s"c$i")).reduceLeft(_ + _)
    pivoted.select(col("doc_id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  val q141Bm25 = GraftQuery(
    "q141_bm25_retrieval",
    "IR ext: disjunctive top-k, rational-BM25 weighting, pivoted sum",
    (s, d) => bm25Retrieve(s, d, Seq("spark", "join", "window"),
      k1 = 1.2, b = 0.75, k = 10),
    Some("""WITH tk AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      lens AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY 1),
      tot AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS total_len
        FROM lens),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
        WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
      dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      contrib AS (
        SELECT tf.doc_id, tf.term,
          ((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
          (CAST(tf AS DOUBLE) /
            (tf + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) * n_docs / total_len)))
            AS c
        FROM tf JOIN dfs ON tf.term = dfs.term
        JOIN lens ON tf.doc_id = lens.doc_id
        CROSS JOIN tot),
      piv AS (
        SELECT doc_id,
          coalesce(max(CASE WHEN term = 'spark' THEN c END), 0.0) AS c0,
          coalesce(max(CASE WHEN term = 'join' THEN c END), 0.0) AS c1,
          coalesce(max(CASE WHEN term = 'window' THEN c END), 0.0) AS c2
        FROM contrib GROUP BY 1)
      SELECT doc_id, round(c0 + c1 + c2, 6) AS score
      FROM piv ORDER BY score DESC, doc_id LIMIT 10"""))

  /** q142: triangle counting on the co-occurrence graph — the density
    * audit for any pairwise-relation output (dup clusters, similarity
    * graphs): edges are q140's df-cut pairs at a support floor, kept in
    * canonical orientation t1 < t2, so every wedge is enumerated
    * exactly once (a<b<c) and closed by one more equi-join — the
    * standard two-join triangle plan whose cost is bounded by the
    * oriented degree, with the df-cut already capping the hottest
    * vertex. Pure integer counts; one row (n_edges, n_wedges,
    * n_triangles, closure per mille as an exact integer ratio). */
  def triangleCensus(s: SparkSession, d: String, minSupport: Long): DataFrame = {
    val e = cooccurrencePairs(s, d, minDfFrac = 0.005, maxDfFrac = 0.85)
      .filter(col("n_ab") >= minSupport)
      .select(col("t1"), col("t2"))
    val wedges = e.select(col("t1").as("a"), col("t2").as("b"))
      .join(e.select(col("t1").as("b"), col("t2").as("c")), Seq("b"))
    val tris = wedges
      .join(e.select(col("t1").as("a"), col("t2").as("c")), Seq("a", "c"))
    val nE = e.agg(count(lit(1)).as("n_edges"))
    val nW = wedges.agg(count(lit(1)).as("n_wedges"))
    val nT = tris.agg(count(lit(1)).as("n_triangles"))
    nE.crossJoin(nW).crossJoin(nT)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        floor(col("n_triangles") * lit(1000L) / col("n_wedges")).cast("long")
          .as("closure_pm"))
  }

  val q142Triangles = GraftQuery(
    "q142_triangles",
    "graph ext: oriented wedge-join triangle census over co-occurrence",
    (s, d) => triangleCensus(s, d, minSupport = 5),
    Some("""WITH raw AS (
        SELECT doc_id,
          unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      tk AS (SELECT DISTINCT doc_id, term FROM raw),
      tot AS (SELECT count(*) AS n_docs FROM documents),
      vocab AS (SELECT term, count(*) AS df FROM tk GROUP BY 1),
      v AS (SELECT term FROM vocab, tot
        WHERE df >= greatest(3, n_docs * 0.005) AND df <= n_docs * 0.85),
      t AS (SELECT tk.doc_id, tk.term FROM tk JOIN v ON tk.term = v.term),
      e AS (
        SELECT a.term AS t1, b.term AS t2
        FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY 1, 2 HAVING count(*) >= 5),
      w AS (
        SELECT e1.t1 AS a, e1.t2 AS b, e2.t2 AS c
        FROM e e1 JOIN e e2 ON e1.t2 = e2.t1),
      tri AS (
        SELECT w.a, w.b, w.c FROM w
        JOIN e ON w.a = e.t1 AND w.c = e.t2),
      ne AS (SELECT count(*) AS n_edges FROM e),
      nw AS (SELECT count(*) AS n_wedges FROM w),
      nt AS (SELECT count(*) AS n_triangles FROM tri)
      SELECT n_edges, n_wedges, n_triangles,
        CAST(floor(n_triangles * 1000 / n_wedges) AS BIGINT) AS closure_pm
      FROM ne, nw, nt"""))

  /** q139: per-group outlier audit — for each language, how many
    * documents sit more than 2σ from the group's mean length. Two
    * stages: one partial-aggregatable pass collecting EXACT integer
    * moments (count, Σx, Σx²) per group, then a broadcast join-back of
    * the tiny stats relation so the 100 TB fact side never shuffles.
    * Mean/σ are derived from the exact integer moments in ONE spelled-
    * out double expression (x·x products, no power(), Σx cast to double
    * before squaring so the product cannot wrap BIGINT at corpus
    * scale) — every FP op is an IEEE exactly-rounded primitive, so both
    * engines compute bit-identical thresholds and the outlier COUNTS
    * (integer, hash-fragile) cannot flip on a boundary ulp. */
  def groupOutliers(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("lang"), col("n_chars"))
    val stats = docs.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("s"),
        sum(col("n_chars") * col("n_chars")).as("ss"))
      .withColumn("mean_c", col("s").cast("double") / col("n"))
      .withColumn("sd_c", sqrt(
        (col("ss").cast("double") - col("s").cast("double") * col("s") / col("n"))
          / (col("n") - 1)))
    docs.join(broadcast(stats), Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("n_chars") - col("mean_c")) > lit(2) * col("sd_c"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(max(col("mean_c")), 4).as("mean_chars"),
        round(max(col("sd_c")), 4).as("sd_chars"))
      .orderBy(col("lang"))
  }

  val q139GroupOutliers = GraftQuery(
    "q139_group_outliers",
    "A-ext: per-group 2-sigma outlier audit from exact integer moments",
    (s, d) => groupOutliers(s, d),
    Some("""WITH st AS (
        SELECT lang, count(*) AS n,
          CAST(sum(n_chars) AS BIGINT) AS s,
          CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
        FROM documents GROUP BY 1),
      x AS (
        SELECT lang, n, CAST(s AS DOUBLE) / n AS mean_c,
          sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) AS sd_c
        FROM st)
      SELECT d.lang, count(*) AS n,
        CAST(sum(CASE WHEN abs(d.n_chars - x.mean_c) > 2 * x.sd_c
          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        round(max(x.mean_c), 4) AS mean_chars,
        round(max(x.sd_c), 4) AS sd_chars
      FROM documents d JOIN x ON d.lang = x.lang
      GROUP BY 1 ORDER BY 1"""))

  /** q140: term co-occurrence with lift — which vocabulary terms appear
    * in the same documents far more often than independence predicts.
    * The pair generation is the quadratic danger; it is bounded the
    * q58 way, by a df-cut BEFORE the self-join: only terms with df in
    * [max(3, 0.5% of docs), 20% of docs] survive (rare terms carry no
    * signal, stopwords would each contribute O(corpus) pairs), so the
    * per-document pair fan-out is quadratic only in the FILTERED
    * per-doc vocabulary. One shuffle on doc_id for the self-join, one
    * on the pair key; lift = N·c(a,b)/(c(a)·c(b)) stays a ratio of
    * exact integers (df product cast to double before multiplying —
    * no BIGINT wrap, no transcendental log), rounded identically in
    * both engines. Top-100 by support plans as TakeOrderedAndProject.
    *
    * The cut fractions are parameters: a web corpus runs ~(0.005,
    * 0.2); the registered query uses maxDfFrac=0.85 because the
    * synthetic corpus has a deliberately FLAT 31-term vocabulary
    * (most terms sit in ~78% of documents — a 0.2 cap selects almost
    * nothing and the query would pass vacuously empty; ExtOpsSpec pins
    * non-emptiness so a generator change resurfaces this). */
  /** The df-cut co-occurrence pair relation (t1 < t2, doc support,
    * per-term dfs) — shared by q140 (lift ranking) and q142 (triangle
    * counting over the co-occurrence graph). */
  def cooccurrencePairs(s: SparkSession, d: String, minDfFrac: Double,
      maxDfFrac: Double): DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(toks(col("text")))).as("term"))
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(tot))
      .filter(col("df") >= greatest(lit(3), col("n_docs") * minDfFrac) &&
        col("df") <= col("n_docs") * maxDfFrac)
    val t = tok.join(broadcast(vocab.select(col("term"), col("df"))), Seq("term"))
    val a = t.select(col("doc_id"), col("term").as("t1"), col("df").as("df_a"))
    val b = t.select(col("doc_id"), col("term").as("t2"), col("df").as("df_b"))
    a.join(b, Seq("doc_id")).filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_ab"), max(col("df_a")).as("df_a"),
        max(col("df_b")).as("df_b"))
  }

  def cooccurrence(s: SparkSession, d: String, minDfFrac: Double,
      maxDfFrac: Double, topK: Int): DataFrame = {
    val docs = Tables.documents(s, d)
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    cooccurrencePairs(s, d, minDfFrac, maxDfFrac)
      .crossJoin(broadcast(tot))
      .select(col("t1"), col("t2"), col("n_ab"),
        round(col("n_docs").cast("double") * col("n_ab")
          / (col("df_a").cast("double") * col("df_b")), 4).as("lift"))
      .orderBy(col("n_ab").desc, col("t1"), col("t2"))
      .limit(topK)
  }

  val q140Cooccurrence = GraftQuery(
    "q140_cooccurrence",
    "text ext: df-cut co-occurrence pairs with independence lift",
    (s, d) => cooccurrence(s, d, minDfFrac = 0.005, maxDfFrac = 0.85, topK = 100),
    Some("""WITH raw AS (
        SELECT doc_id,
          unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      tk AS (SELECT DISTINCT doc_id, term FROM raw),
      tot AS (SELECT count(*) AS n_docs FROM documents),
      vocab AS (
        SELECT term, count(*) AS df FROM tk GROUP BY 1),
      v AS (
        SELECT term, df FROM vocab, tot
        WHERE df >= greatest(3, n_docs * 0.005) AND df <= n_docs * 0.85),
      t AS (SELECT tk.doc_id, tk.term, v.df FROM tk JOIN v ON tk.term = v.term)
      SELECT a.term AS t1, b.term AS t2, count(*) AS n_ab,
        round(CAST((SELECT n_docs FROM tot) AS DOUBLE) * count(*)
          / (CAST(max(a.df) AS DOUBLE) * max(b.df)), 4) AS lift
      FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2
      ORDER BY n_ab DESC, t1, t2 LIMIT 100"""))

  val q45TopTerms = GraftQuery(
    "q45_top_terms",
    "A3,A4; vocabulary/Zipf profile, explode + two-level agg",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      tok.groupBy(col("term"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("term"))
        .limit(25)
    },
    Some("""SELECT term, CAST(count(*) AS BIGINT) AS tf,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
            FROM documents)
      GROUP BY term ORDER BY tf DESC, term LIMIT 25"""))

  /** q46: the end-to-end corpus *filter* recipe a training-data pipeline
    * runs before tokenization (C4/Gopher shape): per-doc token and
    * stopword metrics -> hard quality gates (token-count range, stopword
    * ratio) -> content-addressed dedup where the *highest-quality*
    * duplicate survives (most tokens, tie-break lowest doc_id) — a
    * deliberate upgrade over keep-first (q44/q50): when near-identical
    * crawls differ, you keep the richest copy, not the first-seen one.
    * One declarative plan: scan -> per-row exprs -> one window -> output;
    * shuffle volume is one row per doc, never the token explosion. */
  /** The q46 composite as a frame transform (shared with the composed
    * curation pipeline, plans.CurationPipeline stage 1): per-doc
    * metrics → hard gates → content-fp dedup keeping the richest copy.
    * Returns the surviving metric rows; callers project/join as
    * needed. */
  private[graft] def corpusGateDeduped(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val metrics = docs
      .select(col("doc_id"), col("lang"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))
          .cast("binary")).as("fp"),
        dupLineRatio(col("text")).as("dup_line_ratio"),
        toks(col("text")).as("t"))
      .select(col("doc_id"), col("lang"), col("fp"),
        size(col("t")).as("n_tok"),
        size(filter(col("t"), t => t.isInCollection(stopwords))).as("n_stop"),
        col("dup_line_ratio"),
        top2gramFrac(col("t")).as("top_2gram_frac"))
      .withColumn("stop_ratio",
        round(col("n_stop").cast("double") / col("n_tok"), 4))
    // hard gates: token range, stopword ratio, and the Gopher
    // repetition signals (dup-line <= 0.3, top-2-gram <= 0.2 — a
    // document that is mostly one repeated bigram is spam, not data)
    val gated = metrics
      .filter(col("n_tok") >= 20 && col("n_tok") <= 2000 &&
        col("stop_ratio") <= 0.5 &&
        col("dup_line_ratio") <= 0.3 && col("top_2gram_frac") <= 0.2)
    val w = Window.partitionBy(col("fp"))
      .orderBy(col("n_tok").desc, col("doc_id"))
    gated
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  val q46CorpusFilter = GraftQuery(
    "q46_corpus_filter",
    "F5,F6,F8,D1-variant,P4,A9; §LLM corpus filter composite + Gopher repetition gate",
    (s, d) =>
      corpusGateDeduped(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("stop_ratio"),
          col("top_2gram_frac"), col("fp"))
        .orderBy(col("doc_id")),
    Some("""WITH tk AS (
        SELECT doc_id, lang, text,
          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
          string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      gr AS (
        SELECT doc_id, lang, text, fp, t,
          CASE WHEN len(t) >= 2
            THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
            ELSE [] END AS g
        FROM tk),
      scored AS (
        SELECT doc_id, lang, fp, len(t) AS n_tok,
          round(len(list_filter(t, x -> x IN ('the','a','of','and','to','in')))::DOUBLE
            / len(t), 4) AS stop_ratio,
          round(1.0 - len(list_distinct(string_split(text, chr(10))))::DOUBLE
            / len(string_split(text, chr(10))), 4) AS dup_line_ratio,
          CASE WHEN len(t) >= 2
            THEN round(list_max(list_transform(list_distinct(g),
              x -> len(list_filter(g, y -> y = x)))) * 2.0 / len(t), 4)
            ELSE 0.0 END AS top_2gram_frac
        FROM gr),
      gated AS (
        SELECT * FROM scored
        WHERE n_tok >= 20 AND n_tok <= 2000 AND stop_ratio <= 0.5
          AND dup_line_ratio <= 0.3 AND top_2gram_frac <= 0.2),
      deduped AS (
        SELECT *, row_number() OVER (PARTITION BY fp
          ORDER BY n_tok DESC, doc_id) AS rn
        FROM gated)
      SELECT doc_id, lang, n_tok, stop_ratio, top_2gram_frac, fp
      FROM deduped WHERE rn = 1 ORDER BY doc_id"""))

  /** q47: language-balanced stratified sampling — every 3rd document per
    * language, capped per stratum (the corpus-balancing downsample an
    * LLM-data pipeline applies to over-represented languages). Systematic
    * within each stratum (rank by doc_id) rather than Bernoulli, so the
    * oracle replays it exactly and a re-run is reproducible (SURVEY §7.3:
    * the reference's unseeded random.sample is its non-determinism
    * defect). One window per stratum — shuffle on lang, no global sort. */
  val q47StratifiedSample = GraftQuery(
    "q47_stratified_sample",
    "X1,X2 ext; per-language balanced corpus sampling",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") % 3 === 1 && col("rk") <= 120)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, source, rk FROM (
        SELECT doc_id, lang, source,
          row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
        FROM documents)
      WHERE rk % 3 = 1 AND rk <= 120 ORDER BY doc_id"""))

  /** q48: training-sequence packing — assign documents (stable doc_id
    * order WITHIN each shard) to fixed-budget sequences of 512
    * whitespace tokens by the running-cumsum rule: a document belongs to
    * the bin its *starting* token offset falls in (the streaming
    * greedy-fill approximation every packing implementation uses — no
    * stateful bin-close logic, one window pass, deterministic). Packing
    * is per-shard BY DESIGN: a single global ordering would be a
    * one-reducer window (the SCALE.md anti-pattern), and cross-shard
    * document order carries no meaning for training anyway — shards pack
    * independently on 1000 executors. The shard key is composite
    * (source, md5(doc_id) % packShards): parallelism is sources x
    * GraftConf.packShards rather than the source cardinality, so a
    * 4-source 100 TB corpus no longer sorts whole sources on 4 reducers.
    * md5 (not Spark's murmur3 hash()) keeps the shard assignment
    * oracle-replayable. Emits per-sequence doc counts and fill levels —
    * the packing-efficiency profile. */
  /** The packing rule over an explicit (doc_id, source, n_tok) frame —
    * shared by q48 (whitespace-token budget) and q197 (real BPE token
    * budget): sharded running cumsum, start-offset bin assignment,
    * per-sequence profile. */
  private[graft] def packByTokens(withTok: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shards = graft.GraftConf.packShards(withTok.sparkSession)
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTok
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long") % shards)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", floor((col("cum") - col("n_tok")) / budget))
      .groupBy(col("source"), col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("source"), col("shard"), col("seq_id"))
  }

  /** q48's packing as a frame transform (shared with
    * plans.CurationPipeline's final stage). */
  private[graft] def packSequences(docs: DataFrame, budget: Long): DataFrame =
    packByTokens(docs.select(col("doc_id"), col("source"),
      size(toks(col("text"))).cast("long").as("n_tok")), budget)

  val q48SequencePacking = GraftQuery(
    "q48_sequence_packing",
    "LLM-pipeline: token-budget sequence packing; sharded window cumsum",
    (s, d) => packSequences(Tables.documents(s, d), budget = 512L),
    Some("""WITH t AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok,
          ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard
        FROM documents),
      c AS (
        SELECT doc_id, source, shard, n_tok,
          sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT source, shard, CAST(floor((cum - n_tok) / 512) AS BIGINT) AS seq_id,
        count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** q49: corpus mixture — per-source sampling weights applied as
    * systematic mod-rates (src0 keep 1/1, src1 1/2, src2 1/4, others 1/8
    * by within-source rank), then the resulting mixture profile. The
    * dataset-mixing step of pretraining-corpus assembly, deterministic so
    * a re-run (and the oracle) reproduces the exact mixture. */
  val q49CorpusMixture = GraftQuery(
    "q49_corpus_mixture",
    "LLM-pipeline: weighted dataset mixing; X1 ext",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val rate = when(col("source") === "src0", 1)
        .when(col("source") === "src1", 2)
        .when(col("source") === "src2", 4)
        .otherwise(8)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), size(toks(col("text"))).as("n_tok"))
        .withColumn("rk", row_number().over(w))
        .filter((col("rk") - 1) % rate === 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens"))
        .orderBy(col("source"))
    },
    Some("""WITH ranked AS (
        SELECT doc_id, source,
          len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
          row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
          CASE source WHEN 'src0' THEN 1 WHEN 'src1' THEN 2
                      WHEN 'src2' THEN 4 ELSE 8 END AS rate
        FROM documents)
      SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM ranked WHERE (rk - 1) % rate = 0
      GROUP BY source ORDER BY source"""))

  /** q76: deterministic train/val/test split — md5(doc_id) mod 100 into
    * 80/10/10 buckets. Content-independent and replayable: the same doc
    * lands in the same split on every run, machine, and engine (the
    * property an unseeded random split lacks — SURVEY §7.3 flags exactly
    * that defect in the reference's sampling). Pure per-row expression,
    * no shuffle until the output sort. */
  val q76HashSplit = GraftQuery(
    "q76_hash_split",
    "LLM-pipeline: deterministic corpus split; X1 ext",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
            .cast("long") % 100).as("bucket"))
        .select(col("doc_id"), col("source"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, source,
        CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, source,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        FROM documents)
      ORDER BY doc_id"""))

  /** q77: quality-decile binning WITHOUT a global sort — the curriculum/
    * threshold-selection step. A global ntile() window is a one-reducer
    * sort (the SCALE.md anti-pattern); instead the decile cutoffs are one
    * exact-percentile aggregate (a broadcastable 9-double row) and every
    * document computes its bin locally by counting cutoffs below its
    * score. Binning metric: token count (the length-curriculum shape). */
  val q77QualityBins = GraftQuery(
    "q77_quality_bins",
    "LLM-pipeline: quantile binning (no global sort); A6 ext",
    (s, d) => {
      val m = Tables.documents(s, d)
        .select(col("doc_id"), size(toks(col("text"))).as("n_tok"))
      val cuts = m.agg(expr(
        "percentile(n_tok, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("cs"))
      m.crossJoin(broadcast(cuts))
        .select(col("n_tok"),
          (lit(1) + size(filter(col("cs"), c => col("n_tok") > c))).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
        .orderBy(col("bin"))
    },
    Some("""WITH m AS (
        SELECT doc_id, len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
        FROM documents),
      cut AS (
        SELECT quantile_cont(n_tok, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs
        FROM m),
      binned AS (
        SELECT n_tok, 1 + len(list_filter(cs, c -> n_tok > c)) AS bin
        FROM m CROSS JOIN cut)
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
        min(n_tok) AS min_tok, max(n_tok) AS max_tok
      FROM binned GROUP BY bin ORDER BY bin"""))

  /** q78: unigram-LM quality score — the CCNet-style perplexity-proxy
    * shape: score every document by how common its tokens are under the
    * corpus's own unigram model (spam and OOV-heavy text scores low,
    * fluent common text high). The emitted score is the MEAN CORPUS
    * FREQUENCY of the document's tokens — a monotone transform of mean
    * token probability computed entirely in exact integer sums, so the
    * result is bit-stable across engines and partitionings. The obvious
    * ln(count/total) form is NOT cross-engine stable: Math.log (JVM) and
    * libm ln (DuckDB) differ in the last ulp, and 4-decimal rounding
    * flipped 248-678 of 5000 rows at sf0.1. A user wanting log-scores
    * applies log() to mean_tok_freq downstream — monotone, so every
    * ordering/thresholding decision is identical. */
  val q78UnigramScore = GraftQuery(
    "q78_unigram_score",
    "LLM-pipeline: unigram-LM quality scoring (perplexity proxy); A5 ext",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      val counts = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      tok.join(counts, Seq("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("c")).as("sum_c"))
        .select(col("doc_id"), col("n_tok"),
          round(col("sum_c").cast("double") / col("n_tok"), 4).as("mean_tok_freq"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents),
      counts AS (SELECT w, count(*) AS c FROM tok GROUP BY w)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        round(CAST(sum(c) AS DOUBLE) / count(*), 4) AS mean_tok_freq
      FROM tok JOIN counts USING (w)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** q93: per-document keyword extraction — top-3 terms by tf·idf. Three
    * hash aggregates (term frequency, document frequency, corpus size)
    * and a per-document top-k window: every stage is
    * partial-aggregatable and the window partition is one document's
    * vocabulary, so the plan is scan-bound at 100 TB. idf is the LINEAR
    * form tf·(N/df), not tf·ln(N/df): ×, ÷ are bit-exact IEEE
    * cross-engine while ln differs in the last ulp (the q78 lesson —
    * log damping is monotone in df, so a user wanting it applies log()
    * downstream without changing any top-k). */
  val q93TfidfKeywords = GraftQuery(
    "q93_tfidf_keywords",
    "LLM-pipeline: tf-idf keyword extraction; A3,T3",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).cast("double").as("n"))
      val scored = tf.join(df, Seq("term"))
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * (col("n") / col("df")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
          round(col("score"), 4).as("score"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      scored AS (
        SELECT doc_id, term, tf, df, tf * ((SELECT n FROM n) / df) AS score
        FROM tf JOIN df USING (term)),
      ranked AS (
        SELECT doc_id, term, tf, df, score,
          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
        round(score, 4) AS score
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** q101: PII redaction — email / phone / IPv4 scrubbing with per-class
    * counts, the mandatory scrub step before corpus release. Counts come
    * from `regexp_count` on the raw text; the redacted text is a fixed
    * replace chain (email → phone → IP, so a later pattern can never
    * match inside an earlier placeholder) and is emitted as its md5 to
    * keep the verified row narrow. All codegen'd regexp expressions, one
    * pass per row, no shuffle before the output sort — scales with scan
    * bandwidth like q40-q44. The synthetic corpus carries no PII, so the
    * fixtures are planted deterministically from doc_id (identical
    * construction in the oracle); the operator itself is the production
    * shape. Patterns stay in the RE2 ∩ java.util.regex dialect so Spark
    * and DuckDB compile them identically. */
  val q101PiiRedact = GraftQuery(
    "q101_pii_redact",
    "LLM-pipeline: PII scrubbing (email/phone/IPv4); F-ext",
    (s, d) => {
      val emailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
      val phoneRe = """\+1-555-\d{4}"""
      val ipRe = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".7"))
      Tables.documents(s, d)
        .select(col("doc_id"), planted.as("txt"))
        .select(col("doc_id"),
          regexp_count(col("txt"), lit(emailRe)).cast("long").as("n_email"),
          regexp_count(col("txt"), lit(phoneRe)).cast("long").as("n_phone"),
          regexp_count(col("txt"), lit(ipRe)).cast("long").as("n_ip"),
          md5(
            regexp_replace(
              regexp_replace(
                regexp_replace(col("txt"), emailRe, "<EMAIL>"),
                phoneRe, "<PHONE>"),
              ipRe, "<IP>").cast("binary")).as("red_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH planted AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@mail.example.com or +1-555-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS txt
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(txt, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(txt, '\+1-555-\d{4}')) AS BIGINT) AS n_phone,
        CAST(len(regexp_extract_all(txt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        md5(regexp_replace(regexp_replace(regexp_replace(txt,
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
          '\+1-555-\d{4}', '<PHONE>', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS red_md5
      FROM planted ORDER BY doc_id"""))

  /** q102: URL → domain extraction + per-domain corpus rollup — the
    * Common-Crawl-style provenance report (domain allow/deny lists,
    * per-site token budgets). URL fixtures are planted from doc_id (the
    * word-soup corpus has none); the extraction — anchored
    * `regexp_extract` capture groups for host and TLD, then a hash agg by
    * domain — is the production shape: per-row codegen'd regex, one
    * shuffle bounded by distinct domains. */
  val q102DomainStats = GraftQuery(
    "q102_domain_stats",
    "LLM-pipeline: URL/domain extraction + provenance rollup; F-ext,A-ext",
    (s, d) => {
      val host = when(pmod(col("doc_id"), lit(3)) === 0, "news.example.org")
        .when(pmod(col("doc_id"), lit(3)) === 1, "blog.example.com")
        .otherwise("docs.example.net")
      val url = concat(lit("https://"), host, lit("/p/"),
        col("doc_id").cast("string"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), url.as("url"))
        .select(col("doc_id"), col("n_chars"),
          regexp_extract(col("url"), "^https?://([^/]+)/", 1).as("domain"))
        .withColumn("tld", regexp_extract(col("domain"), """\.([a-z]+)$""", 1))
        .groupBy(col("domain"), col("tld"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars_total"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("domain"))
    },
    Some("""WITH urls AS (
        SELECT doc_id, n_chars,
          'https://' || CASE doc_id % 3 WHEN 0 THEN 'news.example.org'
            WHEN 1 THEN 'blog.example.com' ELSE 'docs.example.net' END
            || '/p/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      extracted AS (
        SELECT doc_id, n_chars,
          regexp_extract(url, '^https?://([^/]+)/', 1) AS domain
        FROM urls)
      SELECT domain, regexp_extract(domain, '\.([a-z]+)$', 1) AS tld,
        count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
        min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM extracted GROUP BY 1, 2 ORDER BY domain"""))

  /** q104: epoch-repeat upsampling — the other half of corpus mixing
    * (q49 downsamples; this replicates under-represented sources for N
    * epochs, the "rare domains seen 3×" recipe). Replication is
    * `explode(sequence(1, factor))` — per-row generation, zero shuffle,
    * output size known up front (Σ n_src × factor) — and each copy gets a
    * deterministic epoch tag so downstream packing/splitting can keep
    * epochs apart. The oracle replays replication as one UNION ALL per
    * epoch tier, so the check is engine-portable without lateral joins. */
  val q104EpochUpsample = GraftQuery(
    "q104_epoch_upsample",
    "LLM-pipeline: mixture upsampling (epoch repeat); X1 ext",
    (s, d) => {
      val factor = when(col("source") === "src0", 1)
        .when(col("source") === "src1", 2)
        .otherwise(3)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), factor.as("factor"))
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1), col("factor"))).as("epoch0"))
        .select(col("doc_id"), col("source"),
          col("epoch0").cast("long").as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    },
    Some("""WITH tiers AS (
        SELECT doc_id, source,
          CASE source WHEN 'src0' THEN 1 WHEN 'src1' THEN 2 ELSE 3 END AS factor
        FROM documents)
      SELECT doc_id, source, CAST(1 AS BIGINT) AS epoch FROM tiers
      UNION ALL
      SELECT doc_id, source, 2 FROM tiers WHERE factor >= 2
      UNION ALL
      SELECT doc_id, source, 3 FROM tiers WHERE factor >= 3
      ORDER BY doc_id, epoch"""))

  /** q106: overlapping document chunking — fixed 128-char windows at a
    * 96-char stride (32-char overlap), the RAG / context-window
    * preparation step. Chunk fan-out is `explode(sequence(0, ⌈len/stride⌉
    * − 1))` + a per-chunk `substr`: pure per-row generation (zero
    * shuffle until the output sort), output size is known up front
    * (Σ ⌈len/stride⌉), and each chunk carries (doc_id, chunk_id) lineage
    * so packing/splitting downstream can group or interleave chunks
    * deterministically. Chunks are emitted as md5 + length to keep the
    * verified row narrow; character windows stand in for token windows
    * (swap substr for a slice of q42's token array at no plan change). */
  val q106DocChunks = GraftQuery(
    "q106_doc_chunks",
    "LLM-pipeline: overlapping doc chunking (RAG/context window); F-ext",
    (s, d) => {
      val win = 128
      val stride = 96
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          // greatest(0, ...) guards the empty document: without it
          // last_ck = -1 and Spark's sequence(0, -1) DESCENDS ([0, -1])
          // where DuckDB's generate_series(0, -1) is empty — an empty
          // doc yields exactly one empty chunk in both engines
          greatest(lit(0L),
            (ceil(length(col("text")).cast("double") / stride) - 1)
              .cast("long")).as("last_ck"))
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), col("last_ck"))).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          col("text").substr(
            (col("chunk_id") * stride + 1).cast("int"), lit(win)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          length(col("chunk")).cast("long").as("chunk_chars"),
          md5(col("chunk").cast("binary")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some("""WITH c AS (
        SELECT doc_id,
          unnest(generate_series(0,
            greatest(0, CAST(ceil(len(text) / 96.0) AS BIGINT) - 1))) AS chunk_id,
          text
        FROM documents)
      SELECT doc_id, chunk_id,
        CAST(len(substr(text, CAST(chunk_id * 96 + 1 AS INT), 128)) AS BIGINT)
          AS chunk_chars,
        md5(substr(text, CAST(chunk_id * 96 + 1 AS INT), 128)) AS chunk_md5
      FROM c ORDER BY doc_id, chunk_id"""))

  /** q111: per-source token-budget cap — keep documents (in
    * deterministic doc_id order) until each source's running token total
    * reaches its budget: the "at most N tokens per domain" mixture rule,
    * enforced exactly rather than by sampling rates (q49) or epoch
    * repeats (q104). One window cumsum per source (single shuffle on
    * source — at 100 TB shard the key like q48 if sources are few), then
    * a per-source rollup of what the cap kept. */
  val q111TokenBudget = GraftQuery(
    "q111_token_budget",
    "LLM-pipeline: per-source token budget cap; X1/A-ext",
    (s, d) => {
      val budget = 2000L
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(toks(col("text"))).cast("long").as("n_tok"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= budget)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tok")).cast("long").as("tok_kept"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"))
    },
    Some("""WITH t AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tok,
          sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        FROM t)
      SELECT source, count(*) AS n_kept,
        CAST(sum(n_tok) AS BIGINT) AS tok_kept, max(doc_id) AS last_doc
      FROM c WHERE cum_tok <= 2000
      GROUP BY source ORDER BY source"""))

  /** q119: distribution-drift report — compare the document-length
    * distribution of the train and test splits (q76's md5 buckets) over
    * fixed-width bins, emitting per-bin shares and a symmetric
    * chi-square-style contribution ((p−q)²/(p+q) — exact integer counts
    * through one IEEE division, so it hash-matches cross-engine where a
    * PSI's ln() would not, per the q78 float lesson). The production use
    * is monitoring: the same report over yesterday's corpus vs today's
    * catches ingest regressions; one pass (single hash agg on the bin),
    * output bounded by bin count. */
  val q119DriftReport = GraftQuery(
    "q119_drift_report",
    "LLM-pipeline: split/corpus distribution drift report; A-ext",
    (s, d) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")
        .cast("binary")), 1, 8), 16, 10).cast("long") % 100
      val binned = Tables.documents(s, d)
        .withColumn("b", bucket)
        .filter(col("b") < 80 || col("b") >= 90)
        .select(when(col("b") < 80, "train").otherwise("test").as("split"),
          least(lit(9L), floor(col("n_chars") / 60)).cast("long").as("bin"))
      val counts = binned.groupBy(col("bin"))
        .agg(count(when(col("split") === "train", 1)).as("n_train"),
          count(when(col("split") === "test", 1)).as("n_test"))
      val totals = counts.agg(sum(col("n_train")).as("t_train"),
        sum(col("n_test")).as("t_test"))
      counts.crossJoin(broadcast(totals))
        .withColumn("p", col("n_train") / col("t_train"))
        .withColumn("q", col("n_test") / col("t_test"))
        .select(col("bin"), col("n_train"), col("n_test"),
          round(col("p"), 4).as("share_train"),
          round(col("q"), 4).as("share_test"),
          round((col("p") - col("q")) * (col("p") - col("q"))
            / (col("p") + col("q")), 6).as("drift_contrib"))
        .orderBy(col("bin"))
    },
    Some("""WITH b AS (
        SELECT doc_id, n_chars,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        FROM documents),
      binned AS (
        SELECT CASE WHEN b < 80 THEN 'train' ELSE 'test' END AS split,
          least(9, CAST(floor(n_chars / 60.0) AS BIGINT)) AS bin
        FROM b WHERE b < 80 OR b >= 90),
      counts AS (
        SELECT bin,
          CAST(count(CASE WHEN split = 'train' THEN 1 END) AS BIGINT) AS n_train,
          CAST(count(CASE WHEN split = 'test' THEN 1 END) AS BIGINT) AS n_test
        FROM binned GROUP BY 1),
      t AS (SELECT CAST(sum(n_train) AS BIGINT) AS t_train,
              CAST(sum(n_test) AS BIGINT) AS t_test FROM counts),
      shares AS (
        SELECT bin, n_train, n_test,
          n_train / CAST(t_train AS DOUBLE) AS p,
          n_test / CAST(t_test AS DOUBLE) AS q
        FROM counts, t)
      SELECT bin, n_train, n_test,
        round(p, 4) AS share_train, round(q, 4) AS share_test,
        round((p - q) * (p - q) / (p + q), 6) AS drift_contrib
      FROM shares ORDER BY bin"""))

  /** q120: dictionary encoding — map a repeated string key to a dense
    * integer code via a sorted vocabulary, then prove the encode→decode
    * round trip lossless by grouping on BOTH code and decoded string
    * (hash match against the oracle's independent dictionary). At 100 TB
    * this is the key-compaction step before shuffle-heavy joins/aggs on
    * string keys: 8-byte codes shuffle instead of arbitrary strings, and
    * the dictionary is broadcast-sized BY CONSTRUCTION (it is the
    * distinct set — the single-partition rank window runs on that tiny
    * set, never on the fact). */
  val q120DictEncode = GraftQuery(
    "q120_dict_encode",
    "LLM-pipeline/A-ext: dictionary key encoding (string -> dense code)",
    (s, d) => {
      val w = Window.orderBy(col("source"))
      val vocab = Tables.documents(s, d).select(col("source")).distinct()
        .withColumn("code", dense_rank().over(w).cast("long"))
      Tables.documents(s, d)
        .join(broadcast(vocab), Seq("source"))
        .groupBy(col("code"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars_total"))
        .orderBy(col("code"))
    },
    Some("""WITH vocab AS (
        SELECT source, CAST(dense_rank() OVER (ORDER BY source) AS BIGINT) AS code
        FROM (SELECT DISTINCT source FROM documents))
      SELECT v.code, d.source, count(*) AS n_docs,
        CAST(sum(d.n_chars) AS BIGINT) AS n_chars_total
      FROM documents d JOIN vocab v USING (source)
      GROUP BY 1, 2 ORDER BY code"""))

  /** q121: winsorized robust stats — clip document length to its
    * [p05, p95] band (one exact-percentile aggregate, broadcast as two
    * doubles — the q77 no-global-sort pattern) and report per-lang
    * count/mean/min/max of the clipped metric: the outlier-insensitive
    * summary a corpus dashboard wants, and the clip step a length-based
    * quality gate applies before averaging. Integer inputs through one
    * interpolation + one division keep it hash-stable cross-engine. */
  val q121Winsorize = GraftQuery(
    "q121_winsorized_stats",
    "A-ext: winsorized (percentile-clipped) robust statistics",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val cuts = docs.agg(
        expr("percentile(n_chars, 0.05)").as("lo"),
        expr("percentile(n_chars, 0.95)").as("hi"))
      docs.crossJoin(broadcast(cuts))
        .withColumn("w", least(greatest(col("n_chars").cast("double"),
          col("lo")), col("hi")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("w")) / count(lit(1)), 4).as("mean_w"),
          round(min(col("w")), 4).as("min_w"),
          round(max(col("w")), 4).as("max_w"))
        .orderBy(col("lang"))
    },
    Some("""WITH cuts AS (
        SELECT quantile_cont(n_chars, 0.05) AS lo,
          quantile_cont(n_chars, 0.95) AS hi
        FROM documents),
      w AS (
        SELECT lang,
          least(greatest(CAST(n_chars AS DOUBLE), lo), hi) AS w
        FROM documents, cuts)
      SELECT lang, count(*) AS n,
        round(sum(w) / count(*), 4) AS mean_w,
        round(min(w), 4) AS min_w, round(max(w), 4) AS max_w
      FROM w GROUP BY lang ORDER BY lang"""))

  /** q147: bounded-memory k-per-group priority sample — the reservoir
    * sample's distributed, DETERMINISTIC equivalent (public bottom-k /
    * priority-sampling shape: each row gets a uniform pseudo-random
    * priority, the k smallest per group win, which is exactly a uniform
    * sample without replacement). Priority is the first 52 bits of
    * md5(doc_id) — 13 hex chars, so the value is exact in a Double AND
    * its numeric order equals the hex string's lexicographic order,
    * which is what lets the DuckDB oracle replay the draw bit-for-bit
    * (q48's md5-not-murmur3 rule). The plan is the q122 scale shape, not
    * q47's window: the typed TopKAggregator partial-aggregates per map
    * task, so each task ships AT MOST k rows per group and no group is
    * ever sorted — at 100 TB a per-group window sample sorts whole
    * strata on single reducers, while this shuffles k × groups ×
    * partitions rows total. Mergeability doubles as the streaming story:
    * the same buffer is a valid cross-batch sample state. */
  /** Frame-generic form of q147: k-per-group deterministic priority
    * sample of `idCol` (long) grouped by `groupCol`. Partial-aggregates
    * regardless of the input's partitioning — the buffer is a mergeable
    * sample state (OperatorSpec asserts partition-invariance). */
  def prioritySample(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val topk = udaf(new graft.functions.TopKAggregator(k))
    // negate: the aggregator keeps the k LARGEST scores, we want the
    // k smallest priorities; 52-bit magnitudes negate exactly
    val negPri = -conv(
      substring(md5(col(idCol).cast("string").cast("binary")), 1, 13),
      16, 10).cast("long").cast("double")
    df.select(col(groupCol), col(idCol), negPri.as("negp"))
      .groupBy(col(groupCol))
      .agg(topk(col("negp"), col(idCol)).as("picks"))
      .select(col(groupCol), posexplode(col("picks")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as(idCol))
      .orderBy(col(groupCol), col("rank"))
  }

  val q147PrioritySample = GraftQuery(
    "q147_priority_sample",
    "X1/X2 ext + UDAF: map-side bounded k-per-group priority sample",
    (s, d) => prioritySample(Tables.documents(s, d), "lang", "doc_id", 15),
    Some("""WITH pr AS (
        SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang
            ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), doc_id)
            AS rank
        FROM documents)
      SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
      FROM pr WHERE rank <= 15 ORDER BY lang, rank"""))

  /** q148: retrieval-quality evaluation — overlap@k, MRR and nDCG for a
    * fixed query set, the metric layer the IR tier (q135 index, q136 AND,
    * q141 ranked OR) owes its users: "did the ranking change when I
    * touched the retriever" must be a QUERY, not a notebook. System
    * ranking is coordination-level (distinct matching terms, then total
    * tf — public Manning et al. shape); graded relevance is total tf, so
    * ideal ranking, DCG and IDCG derive from the same integers and every
    * ranking decision is an integer sort: bit-stable cross-engine with
    * no transcendentals (the q78/q141 discipline — the DCG discount is
    * the HARMONIC 1/(rank+1), not log2, for exactly that reason; same
    * monotone-discount axioms, exact rationals).
    *
    * Scale: one token-stream shuffle bounded by the query vocabulary
    * filter (only matching tokens move), then per-query windows —
    * parallel across queries, and a heavy query's top-k routes through
    * the q147/q122 bounded aggregator if an eval set ever outgrows the
    * window form. Metrics are per-query rows plus ranks; k bounds
    * everything downstream. */
  val q148RetrievalEval = GraftQuery(
    "q148_retrieval_eval",
    "IR ext: ranking evaluation metrics (overlap@k, MRR, harmonic nDCG)",
    (s, d) => {
      val k = 10
      val qspec = Seq(
        "qa" -> Seq("spark", "join"),
        "qb" -> Seq("window", "sort", "merge"),
        "qc" -> Seq("vector", "hash"),
        "qd" -> Seq("stream", "batch", "filter"))
      import s.implicits._
      val qrel = qspec.flatMap { case (q, ts) => ts.map(q -> _) }
        .toDF("qid", "term")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val matched = tok.join(broadcast(qrel), Seq("term"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(countDistinct(col("term")).as("n_terms"),
          count(lit(1)).as("rel"))
      val wSys = Window.partitionBy(col("qid"))
        .orderBy(col("n_terms").desc, col("rel").desc, col("doc_id"))
      val wIdeal = Window.partitionBy(col("qid"))
        .orderBy(col("rel").desc, col("doc_id"))
      matched
        .withColumn("sys_rank", row_number().over(wSys))
        .withColumn("ideal_rank", row_number().over(wIdeal))
        .filter(col("sys_rank") <= k || col("ideal_rank") <= k)
        .groupBy(col("qid"))
        .agg(
          round(count(when(col("sys_rank") <= k && col("ideal_rank") <= k,
            lit(1))) / lit(k * 1.0), 6).as("overlap_at_k"),
          round(coalesce(max(when(col("ideal_rank") === 1 && col("sys_rank") <= k,
            lit(1.0) / col("sys_rank"))), lit(0.0)), 6).as("mrr"),
          round(
            sum(when(col("sys_rank") <= k,
              col("rel") / (col("sys_rank") + lit(1.0))).otherwise(lit(0.0))) /
            sum(when(col("ideal_rank") <= k,
              col("rel") / (col("ideal_rank") + lit(1.0))).otherwise(lit(0.0))),
            6).as("ndcg_h"))
        .orderBy(col("qid"))
    },
    Some("""WITH qrel(qid, term) AS (VALUES
        ('qa', 'spark'), ('qa', 'join'),
        ('qb', 'window'), ('qb', 'sort'), ('qb', 'merge'),
        ('qc', 'vector'), ('qc', 'hash'),
        ('qd', 'stream'), ('qd', 'batch'), ('qd', 'filter')),
      tk AS (
        SELECT doc_id,
          unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      m AS (
        SELECT qid, doc_id, count(DISTINCT tk.term) AS n_terms,
          count(*) AS rel
        FROM tk JOIN qrel USING (term) GROUP BY 1, 2),
      r AS (
        SELECT *,
          row_number() OVER (PARTITION BY qid
            ORDER BY n_terms DESC, rel DESC, doc_id) AS sys_rank,
          row_number() OVER (PARTITION BY qid
            ORDER BY rel DESC, doc_id) AS ideal_rank
        FROM m)
      SELECT qid,
        round(count(CASE WHEN sys_rank <= 10 AND ideal_rank <= 10
          THEN 1 END) / 10.0, 6) AS overlap_at_k,
        round(coalesce(max(CASE WHEN ideal_rank = 1 AND sys_rank <= 10
          THEN 1.0 / sys_rank END), 0.0), 6) AS mrr,
        round(
          sum(CASE WHEN sys_rank <= 10
            THEN rel / (sys_rank + 1.0) ELSE 0.0 END) /
          sum(CASE WHEN ideal_rank <= 10
            THEN rel / (ideal_rank + 1.0) ELSE 0.0 END), 6) AS ndcg_h
      FROM r WHERE sys_rank <= 10 OR ideal_rank <= 10
      GROUP BY qid ORDER BY qid"""))

  /** q151: Count-Min sketch — the OVERestimating mergeable frequency
    * summary next to q132's UNDERestimating Misra-Gries (together they
    * sandwich every true count; public mergeable-summaries results,
    * Cormode-Muthukrishnan / Agarwal et al.). The sketch is d×w cells of
    * exact integer adds: each token occurrence increments one cell per
    * row j at md5-derived column cell_j(term), a point estimate is the
    * MIN over its d cells — never below the true count, above it by at
    * most n/w per row with prob ≥ 1−2^−d. The hashes are md5-derived
    * (not murmur3) so the DuckDB oracle replays the ENTIRE sketch and
    * the estimates bit-for-bit — a fully oracle-checked sketch.
    *
    * Scale story: the build is one aggregate whose partial state is
    * capped at d×w rows PER PARTITION no matter the vocabulary — the
    * shuffle is O(d·w·partitions) where exact term counting shuffles
    * the vocabulary. That fixed size is also the streaming story: the
    * cell relation is additive across batches (same merge contract as
    * applyAggBatch state). Probe terms here are the exact top-15 (the
    * q45 display side, which doubles as the est ≥ exact verification). */
  /** The CMS hash: md5-derived (oracle-replayable) column index of
    * `term` in sketch row `j`. */
  private[graft] def cmsCell(term: Column, j: Column, width: Int): Column =
    conv(substring(md5(concat(lit("cms"), j.cast("string"), lit(":"), term)
      .cast("binary")), 1, 13), 16, 10).cast("long") % width

  /** Count-Min cell relation (j, cell, cnt) of a document frame — the
    * sketch AS DATA. Partial-agg state is capped at depth×width rows per
    * partition whatever the vocabulary, and the relation is ADDITIVE:
    * summing two frames' cells is the sketch of their union, which is
    * both the merge story and the streaming story (applyCmsBatch). */
  def cmsCells(df: DataFrame, textCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1)
    df.select(explode(toks(col(textCol))).as("term"))
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn("cell", cmsCell(col("term"), col("j"), width))
      .groupBy(col("j"), col("cell")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the exact top-15 corpus terms against `sketch`
    * (min over each term's depth cells) — the shared display/verify
    * side of q151 and its streamed twin q154. */
  private def cmsProbe(s: SparkSession, d: String, sketch: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val top = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(15)
    top
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn("cell", cmsCell(col("term"), col("j"), width))
      .join(sketch, Seq("j", "cell"))
      .groupBy(col("term"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  val q151CountMinSketch = GraftQuery(
    "q151_countmin_sketch",
    "A ext: Count-Min frequency sketch, fully oracle-replayable",
    (s, d) => cmsProbe(s, d,
      cmsCells(Tables.documents(s, d), "text", depth = 4, width = 1024),
      depth = 4, width = 1024),
    Some("""WITH tk AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      js AS (SELECT unnest(range(0, 4)) AS j),
      sketch AS (
        SELECT j,
          ('0x' || substr(md5('cms' || j || ':' || term), 1, 13))::BIGINT
            % 1024 AS cell,
          count(*) AS cnt
        FROM tk CROSS JOIN js GROUP BY 1, 2),
      top AS (
        SELECT term, count(*) AS exact_cnt FROM tk GROUP BY 1
        ORDER BY exact_cnt DESC, term LIMIT 15),
      probe AS (
        SELECT t.term, t.exact_cnt, j,
          ('0x' || substr(md5('cms' || j || ':' || t.term), 1, 13))::BIGINT
            % 1024 AS cell
        FROM top t CROSS JOIN js)
      SELECT p.term, p.exact_cnt, CAST(min(s.cnt) AS BIGINT) AS cms_est
      FROM probe p JOIN sketch s USING (j, cell)
      GROUP BY 1, 2 ORDER BY exact_cnt DESC, term"""))

  /** q154: the q151 sketch maintained INCREMENTALLY — documents split
    * into batches and folded through the streaming CMS state contract
    * (StreamingJobs.applyCmsBatch: ≤ depth×width-row additive state,
    * batchId-idempotent versioned commits), then probed identically.
    * Carries q151's full oracle: the drained stream's sketch must be
    * bit-identical to the one-shot batch sketch — additivity proven
    * cross-engine, the q134/q132 and q153/q64 pairing applied to CMS. */
  def streamedCms(s: SparkSession, d: String, nBatches: Int): DataFrame = {
    require(nBatches >= 1)
    val depth = 4; val width = 1024
    val stateDir = java.nio.file.Files.createTempDirectory("graft_cms_state").toString
    // try/finally: a failing batch/drain must not leak the temp state dir
    val sketch = try {
      val docs = Tables.documents(s, d)
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingJobs.applyCmsBatch(s,
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === i), "text",
          i.toLong, depth, width, stateDir)
      }
      graft.streaming.StreamingJobs.latestAggState(s, stateDir).get._2
        .localCheckpoint(true)
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    }
    cmsProbe(s, d, sketch, depth, width)
  }

  val q154StreamedCms = GraftQuery(
    "q154_streamed_cms",
    "A ext + streaming: incremental Count-Min sketch (additive state)",
    (s, d) => streamedCms(s, d, nBatches = 3),
    q151CountMinSketch.oracle)

  // ---------------------------------------------------------------------
  // q167/q168: HyperLogLog registers — the mergeable DISTINCT-count
  // sketch, md5-derived and fully oracle-replayable (batch + streamed)
  // ---------------------------------------------------------------------

  /** The HLL hash: md5-derived (oracle-replayable) 52-bit value of a
    * term — the q151 cmsCell trick applied to cardinality estimation. */
  private[graft] def hllHash(term: Column): Column =
    conv(substring(md5(concat(lit("hll:"), term).cast("binary")), 1, 13),
      16, 10).cast("long")

  /** HLL register relation (reg, max_rank) of a document frame's term
    * stream, OCCUPIED registers only — the sketch AS DATA [Flajolet et
    * al. 2007; Heule et al. 2013 (HLL++) for the practice]. Register =
    * low log2(m) hash bits; rank = leading-zero count of the remaining
    * field + 1, computed integer-exactly via `length(bin(v))` (minimal
    * binary strings in BOTH engines, so the DuckDB oracle replays every
    * register bit-for-bit — no implementation-specific murmur/HLL++ bias
    * tables, unlike q103's built-in `approx_count_distinct`, which this
    * query makes auditable cross-engine).
    *
    * Scale story: partial-agg state is capped at m rows per partition
    * whatever the cardinality — COUNT DISTINCT at 100 TB shuffles every
    * key, this shuffles ≤ m·partitions rows. And unlike the CMS (additive
    * — a re-delivered document inflates cells unrecoverably, see
    * applyCmsBatch's precondition), the register MAX-merge is IDEMPOTENT:
    * overlapping at-least-once redelivery cannot change the sketch, so
    * the streamed form needs no upstream dedup at all. */
  def hllRegisterDeltas(df: DataFrame, textCol: String, m: Int): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    val regBits = java.lang.Long.numberOfTrailingZeros(m.toLong)
    val field = 52 - regBits // md5-prefix bits left above the register index
    val h = hllHash(col("term"))
    df.select(explode(toks(col(textCol))).as("term"))
      .select((h % m).as("reg"), shiftright(h, regBits.toInt).as("v"))
      .select(col("reg"),
        when(col("v") === 0, lit(field + 1))
          .otherwise(lit(field + 1) - length(bin(col("v")))).cast("int").as("rank"))
      .groupBy(col("reg")).agg(max(col("rank")).as("max_rank"))
  }

  /** Dense m-row register table (empty registers at rank 0), the
    * canonical comparable/mergeable form — shared output side of q167
    * and its streamed twin q168. */
  def hllFill(s: SparkSession, deltas: DataFrame, m: Int): DataFrame =
    s.range(m).select(col("id").as("reg"))
      .join(deltas, Seq("reg"), "left")
      .select(col("reg"),
        coalesce(col("max_rank"), lit(0)).cast("int").as("max_rank"))
      .orderBy(col("reg"))

  /** The standard HLL estimate from a collected register array — the
    * ScalaTest gate's scoring side (float harmonic mean is NOT in the
    * query output on purpose: cross-engine float SUM order would break
    * hash equality; the registers themselves are the oracle-checked
    * artifact). Small-range correction per Flajolet et al. §4. */
  private[graft] def hllEstimate(ranks: Array[Int]): Double = {
    val m = ranks.length
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / ranks.map(r => math.pow(2.0, -r)).sum
    val zeros = ranks.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  private val hllOracle = Some("""WITH tk AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      h AS (SELECT ('0x' || substr(md5('hll:' || term), 1, 13))::BIGINT AS h
            FROM tk),
      rr AS (SELECT h % 256 AS reg, h >> 8 AS v FROM h),
      rk AS (SELECT reg,
               max(CASE WHEN v = 0 THEN 45 ELSE 45 - length(bin(v)) END) AS mr
             FROM rr GROUP BY reg),
      regs AS (SELECT unnest(range(0, 256)) AS reg)
      SELECT r.reg, CAST(coalesce(k.mr, 0) AS INTEGER) AS max_rank
      FROM regs r LEFT JOIN rk k USING (reg) ORDER BY r.reg""")

  /** q167: the HLL register relation over the corpus term stream —
    * distinct-term cardinality as a 256-row mergeable summary, every
    * register oracle-replayed (the sketch-tier completion: q132/q151
    * sandwich frequencies, this pins cardinality; q103's built-in HLL++
    * estimator remains the engine-native production path, now with an
    * auditable open-hash twin). Estimate accuracy (±1.04/√m expected)
    * is gated in HllSpec against exact COUNT DISTINCT. */
  val q167HllRegisters = GraftQuery(
    "q167_hll_registers",
    "A ext: HyperLogLog register sketch, fully oracle-replayable",
    (s, d) => hllFill(s,
      hllRegisterDeltas(Tables.documents(s, d), "text", m = 256), m = 256),
    hllOracle)

  /** q168: the q167 sketch maintained INCREMENTALLY — documents split
    * into batches and folded through the streaming HLL state contract
    * (StreamingJobs.applyHllBatch: ≤ m-row MAX-merge state, batchId-
    * idempotent versioned commits AND merge-level idempotence — the one
    * sketch in the tier that is redelivery-proof by algebra). Carries
    * q167's full oracle: the drained stream's registers must be
    * bit-identical to the one-shot batch sketch. */
  def streamedHll(s: SparkSession, d: String, nBatches: Int): DataFrame = {
    require(nBatches >= 1)
    val m = 256
    val stateDir = java.nio.file.Files.createTempDirectory("graft_hll_state").toString
    val docs = Tables.documents(s, d)
    // try/finally: a failing batch/drain must not leak the temp state dir
    val state = try {
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingJobs.applyHllBatch(s,
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === i), "text",
          i.toLong, m, stateDir)
      }
      graft.streaming.StreamingJobs.latestAggState(s, stateDir).get._2
        .localCheckpoint(true)
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    }
    hllFill(s, state, m)
  }

  val q168StreamedHll = GraftQuery(
    "q168_streamed_hll",
    "A ext + streaming: incremental HLL registers (idempotent max-merge state)",
    (s, d) => streamedHll(s, d, nBatches = 3),
    hllOracle)

  /** Grouped HLL register deltas over an arbitrary value column —
    * q167's register computation generalized to a GROUPED aggregate
    * (per day, per side, per any slice): output (groups..., reg,
    * max_rank), occupied registers only. Partial-agg state is ≤ m rows
    * PER GROUP per partition, and the same max-merge algebra applies
    * within each group — grouped approx-distinct as auditable data
    * where `approx_count_distinct ... GROUP BY` is a black-box
    * estimator. */
  def hllDeltasBy(df: DataFrame, groups: Seq[String], value: Column,
      m: Int): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    val regBits = java.lang.Long.numberOfTrailingZeros(m.toLong)
    val field = 52 - regBits
    val h = hllHash(value.cast("string"))
    val v = shiftright(h, regBits.toInt)
    df.select(groups.map(col) :+ (h % m).as("reg") :+
        when(v === 0, lit(field + 1))
          .otherwise(lit(field + 1) - length(bin(v))).cast("int").as("rank"): _*)
      .groupBy((groups :+ "reg").map(col): _*)
      .agg(max(col("rank")).as("max_rank"))
  }

  /** q173: per-day distinct-user HLL registers over the event stream —
    * the event-time form of q167 (the "daily active users at 100 TB"
    * question as a mergeable, auditable relation: registers max-merge
    * across days for any rollup — weekly/monthly DAU comes from the
    * SAME relation with one more max aggregate, no rescan). Occupied
    * registers only; every register DuckDB-replayed; per-day estimate
    * accuracy gated in HllSpec against exact COUNT DISTINCT. */
  val q173WindowedHll = GraftQuery(
    "q173_windowed_hll",
    "A ext + event-time: per-day HLL distinct-user registers, fully oracle-replayable",
    (s, d) => hllDeltasBy(
      Tables.eventsWithTs(s, d).filter(col("user_id").isNotNull)
        .select(to_date(col("ts")).as("day"), col("user_id")),
      Seq("day"), col("user_id"), m = 64)
      .orderBy(col("day"), col("reg")),
    Some("""WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, user_id FROM events
        WHERE user_id IS NOT NULL),
      h AS (SELECT day,
          ('0x' || substr(md5('hll:' || user_id), 1, 13))::BIGINT AS h
        FROM ev),
      rr AS (SELECT day, h % 64 AS reg, h >> 6 AS v FROM h)
      SELECT day, reg,
        CAST(max(CASE WHEN v = 0 THEN 47 ELSE 47 - length(bin(v)) END)
          AS INTEGER) AS max_rank
      FROM rr GROUP BY 1, 2 ORDER BY day, reg"""))

  /** q174: the q173 relation maintained INCREMENTALLY — event batches
    * folded through the grouped HLL state contract
    * (StreamingJobs.applyDayHllBatch: ≤ m-rows-per-day MAX-merge state,
    * batchId-idempotent AND merge-idempotent like q168). Carries q173's
    * full oracle: the drained stream's per-day registers must be
    * bit-identical to the one-shot batch relation. */
  def streamedWindowedHll(s: SparkSession, d: String, nBatches: Int): DataFrame = {
    require(nBatches >= 1)
    val m = 64
    val stateDir = java.nio.file.Files.createTempDirectory("graft_whll_state").toString
    val ev = Tables.eventsWithTs(s, d)
    // try/finally: a failing batch/drain must not leak the temp state dir
    val state = try {
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingJobs.applyDayHllBatch(s,
          ev.filter(pmod(col("event_id"), lit(nBatches)) === i),
          i.toLong, m, stateDir)
      }
      graft.streaming.StreamingJobs.latestAggState(s, stateDir).get._2
        .localCheckpoint(true)
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    }
    state.orderBy(col("day"), col("reg"))
  }

  val q174StreamedWindowedHll = GraftQuery(
    "q174_streamed_windowed_hll",
    "A ext + streaming + event-time: incremental per-day HLL registers",
    (s, d) => streamedWindowedHll(s, d, nBatches = 3),
    q173WindowedHll.oracle)

  /** q175: train/test vocabulary-overlap screening via HLL set algebra —
    * the sketch-tier decontamination PRE-CHECK (q109/q133 are the exact
    * joins; this answers "how much does the test slice's vocabulary
    * overlap train, across two corpora too large to join" from three
    * m-row register sets): sides hash the SAME value space, so the
    * union sketch is the element-wise register max — EXACT algebra, all
    * three register relations DuckDB-replayed — and |A∩B| is estimated
    * by inclusion-exclusion est(A)+est(B)−est(A∪B) (HllSpec gates it
    * against the exact distinct-shingle intersection). Sides are q76's
    * deterministic md5 split (train = buckets <80, test = ≥90). The
    * hashed value space is 3-word SHINGLES, not unigrams: this corpus
    * draws from a ~31-word vocabulary (measured), so unigram sketches
    * sit in the degenerate n ≪ m linear-counting regime; the ~27k
    * distinct shingles exercise the estimator where sketching is the
    * point (n ≫ m) — and shingles are what decontamination actually
    * matches on (q109). */
  def splitOverlapRegisters(s: SparkSession, d: String, m: Int): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 8), 16, 10).cast("long") % 100
    val sided = Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.SketchFunctions.shingleArray(col("t"), 3)).as("term"))
      .withColumn("b", bucket)
      .withColumn("side", when(col("b") < 80, "train")
        .when(col("b") >= 90, "test"))
      .filter(col("side").isNotNull)
    val sides = hllDeltasBy(sided, Seq("side"), col("term"), m)
    val union = sides.groupBy(col("reg"))
      .agg(max(col("max_rank")).as("max_rank"))
      .select(lit("union").as("side"), col("reg"), col("max_rank"))
    sides.select(col("side"), col("reg"), col("max_rank"))
      .unionByName(union)
      .orderBy(col("side"), col("reg"))
  }

  val q175SplitOverlap = GraftQuery(
    "q175_split_overlap",
    "A ext: HLL union algebra for train/test vocabulary-overlap screening",
    (s, d) => splitOverlapRegisters(s, d, m = 256),
    Some("""WITH tk AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents),
      sg AS (
        SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 100 AS b,
          unnest(list_distinct(list_transform(range(1, len(toks)-1),
            i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]))) AS term
        FROM tk WHERE len(toks) >= 3),
      sided AS (
        SELECT CASE WHEN b < 80 THEN 'train' ELSE 'test' END AS side, term
        FROM sg WHERE b < 80 OR b >= 90),
      h AS (SELECT side,
          ('0x' || substr(md5('hll:' || term), 1, 13))::BIGINT AS h
        FROM sided),
      rr AS (SELECT side, h % 256 AS reg, h >> 8 AS v FROM h),
      rk AS (SELECT side, reg,
          CAST(max(CASE WHEN v = 0 THEN 45 ELSE 45 - length(bin(v)) END)
            AS INTEGER) AS max_rank
        FROM rr GROUP BY 1, 2),
      un AS (SELECT 'union' AS side, reg,
          CAST(max(max_rank) AS INTEGER) AS max_rank FROM rk GROUP BY 2)
      SELECT side, reg, max_rank
      FROM (SELECT * FROM rk UNION ALL SELECT * FROM un)
      ORDER BY side, reg"""))

  // ---------------------------------------------------------------------
  // q172: c-TF-IDF domain profiling — class-distinctive vocabulary
  // ---------------------------------------------------------------------

  /** Class-based TF-IDF [Grootendorst 2022 (BERTopic §2.3); the classic
    * corpus-profiling move: treat each class as ONE pooled document and
    * score terms by within-class frequency × corpus-wide rarity]: for
    * class c and term t, weight = tf(t,c) · (1 + A/ctf(t)) with
    * ctf(t) = corpus-wide count and A = average tokens per class — the
    * log-free rational form (the q141 idf convention: every input is an
    * exact integer, so the double arithmetic is bit-identical
    * cross-engine and the oracle hash-matches; a libm log could differ
    * by an ulp between engines). The top-k distinctive terms per class
    * are what a curation dashboard shows per source/domain/cluster:
    * what vocabulary makes this slice different, not just frequent
    * (raw top terms — q45 — surface the same stopwords everywhere).
    *
    * Plan: one token-stream aggregate to (class, term, tf), one
    * vocab-sized aggregate to ctf, a broadcast scalar for A, and a
    * per-class top-k window over the CLASS-VOCAB relation (bounded by
    * vocabulary × classes, never corpus rows). */
  /** The (class, term, tf) relation q172/q180 score from — ADDITIVE
    * across document batches (bag counts sum), which is the streamed
    * form's whole state contract. */
  def classTermCounts(df: DataFrame, classCol: String): DataFrame =
    df.select(col(classCol).as("class"), explode(toks(col("text"))).as("term"))
      .groupBy(col("class"), col("term")).agg(count(lit(1)).as("tf"))

  /** Scoring tail shared by q172 and its streamed twin: everything
    * (ctf, the avg-class-tokens scalar, weights, ranks) derives from
    * the tf relation alone, so a drained additive state renders
    * byte-identically to the one-shot batch profile. */
  def classTfidfFromCounts(tf: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val ctf = tf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val a = tf.agg((sum(col("tf")).cast("double") /
      countDistinct(col("class"))).as("avg_class_tokens"))
    val scored = tf.join(broadcast(ctf), Seq("term"))
      .crossJoin(broadcast(a))
      .withColumn("weight",
        col("tf").cast("double") *
          (lit(1.0) + col("avg_class_tokens") / col("ctf")))
    val w = Window.partitionBy(col("class"))
      .orderBy(col("weight").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("class"), col("rank"), col("term"), col("tf"), col("ctf"),
        round(col("weight"), 6).as("weight"))
      .orderBy(col("class"), col("rank"))
  }

  def classTfidf(s: SparkSession, d: String, classCol: String, k: Int): DataFrame =
    classTfidfFromCounts(
      classTermCounts(Tables.documents(s, d), classCol), k)

  /** q180: the q172 profile maintained INCREMENTALLY — document batches
    * folded through an additive (class, term, tf) state
    * (StreamingJobs.applyClassTfBatch: bag counts sum; batchId-idempotent
    * versioned commits; the same at-least-once caveat as the CMS — a
    * re-delivered document inflates tf, dedup upstream), then the shared
    * scoring tail renders the drained state. Carries q172's full oracle:
    * the incremental profile must hash-match the one-shot batch profile.
    * State is the class-vocabulary relation — bounded by vocab × classes
    * like the q135 index's df relation, not by corpus rows. */
  def streamedClassTfidf(s: SparkSession, d: String, k: Int,
      nBatches: Int): DataFrame = {
    require(nBatches >= 1)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ctf_state").toString
    val docs = Tables.documents(s, d)
    // try/finally: a failing batch/drain must not leak the temp state dir
    val state = try {
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingJobs.applyClassTfBatch(s,
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === i), "source",
          i.toLong, stateDir)
      }
      graft.streaming.StreamingJobs.latestAggState(s, stateDir).get._2
        .localCheckpoint(true)
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    }
    classTfidfFromCounts(state, k)
  }

  val q172ClassTfidf = GraftQuery(
    "q172_class_tfidf",
    "LLM-pipeline corpus profiling: c-TF-IDF distinctive vocabulary per source domain",
    (s, d) => classTfidf(s, d, "source", k = 5),
    Some("""WITH tk AS (
        SELECT source AS class,
          unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT class, term, count(*) AS tf FROM tk GROUP BY 1, 2),
      ctf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
      a AS (SELECT CAST(sum(tf) AS DOUBLE) / count(DISTINCT class)
              AS avg_class_tokens FROM tf),
      scored AS (
        SELECT tf.class, tf.term, tf.tf, ctf.ctf,
          CAST(tf.tf AS DOUBLE) * (1.0 + a.avg_class_tokens / ctf.ctf) AS weight
        FROM tf JOIN ctf ON tf.term = ctf.term CROSS JOIN a),
      ranked AS (
        SELECT class, term, tf, ctf, weight,
          row_number() OVER (PARTITION BY class
            ORDER BY weight DESC, term) AS rank
        FROM scored)
      SELECT class, CAST(rank AS INTEGER) AS rank, term, tf, ctf,
        round(weight, 6) AS weight
      FROM ranked WHERE rank <= 5 ORDER BY class, rank"""))

  val q180StreamedClassTfidf = GraftQuery(
    "q180_streamed_class_tfidf",
    "LLM-pipeline profiling + streaming: incremental c-TF-IDF (additive tf state)",
    (s, d) => streamedClassTfidf(s, d, k = 5, nBatches = 3),
    q172ClassTfidf.oracle)

  /** q155: the q147 sample maintained INCREMENTALLY — documents folded
    * through the streaming sample state contract
    * (StreamingJobs.applySampleBatch: ≤ k-row-per-group bottom-k state,
    * batchId-idempotent versioned commits). Bottom-k by data-derived
    * priority is a mergeable summary, so the drained sample IS the
    * one-shot draw — q155 carries q147's oracle to prove it bit-for-bit
    * (the reservoir-sample-over-a-stream answer, deterministic). */
  def streamedPrioritySample(s: SparkSession, d: String, k: Int,
      nBatches: Int): DataFrame = {
    require(nBatches >= 1)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_samp_state").toString
    val docs = Tables.documents(s, d)
    // try/finally: a failing batch/drain must not leak the temp state dir
    val state = try {
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingJobs.applySampleBatch(s,
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === i), i.toLong,
          "lang", "doc_id", k, stateDir)
      }
      graft.streaming.StreamingJobs.latestAggState(s, stateDir).get._2
        .localCheckpoint(true)
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    }
    prioritySample(state, "lang", "doc_id", k)
  }

  val q155StreamedSample = GraftQuery(
    "q155_streamed_sample",
    "X ext + streaming: incremental bottom-k priority sample (mergeable state)",
    (s, d) => streamedPrioritySample(s, d, k = 15, nBatches = 3),
    q147PrioritySample.oracle)

  /** q159: the q135 inverted index maintained INCREMENTALLY — document
    * batches folded through the streaming index state contract
    * (StreamingJobs.applyIndexBatch: additive df + capped bottom-k
    * postings merge, batchId-idempotent versioned commits), rendered
    * identically, and proven bit-identical to the one-shot build by
    * carrying q135's oracle. The standing "index the day's crawl
    * without replaying the corpus token stream" job: per-trigger cost
    * is the batch's tokens plus a state-sized merge. */
  def streamedInvertedIndex(s: SparkSession, d: String, maxPost: Int,
      nBatches: Int): DataFrame = {
    require(nBatches >= 1)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_idx_state").toString
    // try/finally: a failing batch/drain must not leak the temp state dir
    val state = try {
      val docs = Tables.documents(s, d)
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingJobs.applyIndexBatch(s,
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === i), "text",
          i.toLong, maxPost, stateDir)
      }
      graft.streaming.StreamingJobs.latestAggState(s, stateDir).get._2
        .localCheckpoint(true)
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    }
    renderIndex(state, maxPost)
  }

  val q159StreamedIndex = GraftQuery(
    "q159_streamed_index",
    "IR ext + streaming: incremental inverted index (additive df, capped postings merge)",
    (s, d) => streamedInvertedIndex(s, d, maxPost = 100, nBatches = 3),
    q135InvertedIndex.oracle)

  // ---------------------------------------------------------------------
  // q184: temperature-weighted mixture sampling
  // ---------------------------------------------------------------------

  /** Domain-balanced corpus draw at temperature α=1/2 [the multilingual/
    * multi-domain rebalancing rule of Lample & Conneau 2019 (XLM §3.1)
    * and the LLM data-mixture literature: sample domain s with
    * probability ∝ p_s^α, α<1 flattening the head so low-resource
    * domains are not drowned]: per-domain target counts
    * target_s = max(1, ⌊budget · w_s / Σw⌋) with w_s = ⌊√c_s⌋, then a
    * deterministic per-domain draw of target_s documents by md5
    * priority (the q147 reservoir: same priority, same picks, any run,
    * any engine). Weights are ⌊sqrt(c)⌋ — floor of the IEEE
    * correctly-rounded double sqrt, which both engines share
    * bit-for-bit (a true integer isqrt would only matter for counts
    * approaching 2^52, far beyond any domain count) — so Σw is exact
    * integer arithmetic: a double Σ over domains would make the
    * targets depend on summation order, which differs across engines
    * and partitionings (the q78 ulp lesson applied to planning, not
    * just scoring).
    *
    * Plan: domain counts are a tiny broadcast aggregate; the draw is
    * the q147 bounded TopKAggregator (map-side k-row state per domain,
    * k = budget upper-bounds every target) — no corpus-wide window, no
    * global sort; the target join is a broadcast of #domains rows. */
  /** Scoring tail shared by q184 and its streamed twin: targets derive
    * from a (group, n_docs) count relation, the draw from a ranked
    * (group, rank, id) relation — both reconstructible from mergeable
    * streamed state, so the drained render is bit-identical to the
    * one-shot batch draw. */
  private def mixtureRender(counts: DataFrame, ranked: DataFrame,
      groupCol: String, idCol: String, budget: Int): DataFrame = {
    require(budget >= 1)
    val w = counts.withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
    val tw = w.agg(sum(col("w")).as("sw"))
    val targets = w.crossJoin(broadcast(tw))
      .select(col(groupCol), col("n_docs"),
        // `div` = exact integer division (a double `/`+floor can round a
        // just-under-k ratio up to k before the floor)
        greatest(lit(1L), expr(s"(${budget.toLong}L * w) div sw"))
          .as("target"))
    ranked
      .join(broadcast(targets), Seq(groupCol))
      .filter(col("rank") <= col("target"))
      .select(col(groupCol), col("n_docs"), col("target"), col("rank"),
        col(idCol))
      .orderBy(col(groupCol), col("rank"))
  }

  def temperatureMixtureSample(df: DataFrame, groupCol: String, idCol: String,
      budget: Int): DataFrame =
    mixtureRender(
      df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs")),
      prioritySample(df, groupCol, idCol, budget),
      groupCol, idCol, budget)

  /** q185: the q184 draw maintained INCREMENTALLY over document batches
    * — two mergeable states on the versioned exactly-once contract: the
    * ≤budget-per-group bottom-k reservoir (applySampleBatch: set-union
    * semantics, replay- and redelivery-safe) and the additive (group,
    * n_docs) count (applyGroupCountBatch: bag counts sum — the CMS/
    * c-TF-IDF disjointness caveat applies to THIS half; dedup upstream
    * if delivery overlaps). Bottom-budget of a union equals
    * bottom-budget of everything seen and counts are additive, so the
    * drained render IS the one-shot draw — q185 carries q184's oracle
    * to prove it bit-for-bit. The streaming answer to "keep a
    * temperature-balanced sample of the corpus as it arrives": state is
    * ≤budget rows + one count per domain, never corpus-sized. */
  def streamedMixtureSample(s: SparkSession, d: String, budget: Int,
      nBatches: Int): DataFrame = {
    require(nBatches >= 1)
    val sampleDir = java.nio.file.Files.createTempDirectory("graft_mix_sample").toString
    val countDir = java.nio.file.Files.createTempDirectory("graft_mix_count").toString
    // try/finally: a failing batch/drain must not leak the two temp
    // state dirs
    val (sample, counts) = try {
      val docs = Tables.documents(s, d)
      (0 until nBatches).foreach { i =>
        val b = docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)
        graft.streaming.StreamingJobs.applySampleBatch(s, b, i.toLong,
          "source", "doc_id", budget, sampleDir)
        graft.streaming.StreamingJobs.applyGroupCountBatch(s, b, "source",
          i.toLong, countDir)
      }
      (graft.streaming.StreamingJobs.latestAggState(s, sampleDir).get._2
          .localCheckpoint(true),
        graft.streaming.StreamingJobs.latestAggState(s, countDir).get._2
          .localCheckpoint(true))
    } finally {
      Seq(sampleDir, countDir).foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
    // ranking the ≤budget-per-group reservoir reproduces the global
    // ranks 1..budget exactly (bottom-k mergeability)
    mixtureRender(counts, prioritySample(sample, "source", "doc_id", budget),
      "source", "doc_id", budget)
  }


  val q184MixtureSample = GraftQuery(
    "q184_mixture_sample",
    "LLM-pipeline: temperature-weighted (α=1/2) domain mixture draw, integer-exact targets",
    (s, d) => temperatureMixtureSample(Tables.documents(s, d),
      "source", "doc_id", budget = 60),
    Some("""WITH c AS (
        SELECT source, count(*) AS n_docs,
          CAST(floor(sqrt(count(*)::DOUBLE)) AS BIGINT) AS w
        FROM documents GROUP BY 1),
      tw AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM c),
      t AS (
        SELECT source, n_docs,
          greatest(1, (60 * w) // sw) AS target
        FROM c CROSS JOIN tw),
      pr AS (
        SELECT source, doc_id,
          row_number() OVER (PARTITION BY source
            ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), doc_id)
            AS rank
        FROM documents)
      SELECT pr.source, t.n_docs, t.target, CAST(pr.rank AS BIGINT) AS rank,
        pr.doc_id
      FROM pr JOIN t USING (source) WHERE pr.rank <= t.target
      ORDER BY pr.source, pr.rank"""))

  val q185StreamedMixture = GraftQuery(
    "q185_streamed_mixture",
    "LLM-pipeline + streaming: incremental temperature mixture draw (reservoir + additive counts)",
    (s, d) => streamedMixtureSample(s, d, budget = 60, nBatches = 3),
    q184MixtureSample.oracle)

  // ---------------------------------------------------------------------
  // q186: BPE merge training (the tokenizer-training core)
  // ---------------------------------------------------------------------

  /** Byte-pair-encoding merge training [Sennrich et al. 2016 (ACL,
    * "Neural Machine Translation of Rare Words with Subword Units"),
    * §3.2 — the algorithm behind every BPE/GPT-style tokenizer]: start
    * from the character-split vocabulary (with a `</w>` end-of-word
    * marker), repeatedly count adjacent symbol pairs weighted by word
    * frequency, and merge the most frequent pair everywhere. Returns
    * the learned merge table (step, left_sym, right_sym, pair_freq) —
    * the artifact a tokenizer ships.
    *
    * Distribution shape: BPE training state is the DISTINCT-WORD
    * relation (word, cnt, sym), bounded by vocabulary — never corpus
    * rows (the corpus is scanned once for word counts). Each merge step
    * is one map-side-combinable pair aggregate + a 1-row argmax collect
    * (a driver scalar, like every broadcast bound in this engine) + a
    * narrow per-row rewrite; k steps = k rounds, lineage truncated per
    * round like connected components.
    *
    * Exactness: symbols are joined with DOUBLE spaces and padded with
    * single outer spaces, so one non-overlapping left-to-right
    * `replace(' a  b ' → ' ab ')` IS the greedy BPE merge: the match
    * consumes one separator space from each side, leaving the
    * single+single = double-space invariant intact for neighbors —
    * adjacent occurrences stay matchable in the same pass (a
    * single-space encoding silently skips every other occurrence; the
    * classic off-by-one this encoding exists to kill). Ties break (max
    * freq, then lexicographic pair) — deterministic cross-engine, and
    * both engines' `replace` share the left-to-right non-overlap
    * contract. The DuckDB oracle unrolls the k steps programmatically
    * from the same step template. */
  /** Character-split vocabulary relation (word, cnt, sym) of a document
    * frame — BPE's training state. */
  private def bpeVocab(docs: DataFrame): DataFrame = docs
    .select(explode(toks(col("text"))).as("word"))
    // an empty token (whitespace-only doc) would hit Spark's
    // DESCENDING sequence(1, 0) and diverge from DuckDB's empty
    // range(1, 1) — exclude it in both engines
    .filter(col("word") =!= "")
    .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    .select(col("word"), col("cnt"),
      concat(lit(" "),
        concat_ws("  ",
          concat(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
            array(lit("</w>")))),
        lit(" ")).as("sym"))
    // the merge loop's state is the DISTINCT-WORD relation — Heaps-law
    // bounded, a few MB at any corpus size — so it lives on a couple of
    // partitions: each of the k driver rounds then schedules 2-task
    // stages instead of 32-task ones, and round latency (the only
    // per-merge cost) drops ~3×. The corpus-wide word-count scan above
    // this line stays fully distributed.
    .repartition(2)
    .localCheckpoint(true)

  /** Pair counts of the current vocab state, ordered (freq DESC, a, b)
    * — the ordering BOTH the driver selection and the oracle share. */
  private def bpePairCounts(vocab: DataFrame): DataFrame = vocab
    .select(col("cnt"), split(trim(col("sym")), "  ").as("s"))
    // a fully-merged word (one symbol left) has no pairs; without
    // this guard Spark's sequence(1, 0) descends into
    // element_at(s, 0), an ANSI error — DuckDB's range(1, 1) is
    // just empty
    .filter(size(col("s")) >= 2)
    .select(col("cnt"), explode(expr(
      "transform(sequence(1, size(s)-1), i -> struct(element_at(s, i) AS a, element_at(s, i+1) AS b))"))
      .as("p"))
    .groupBy(col("p.a").as("a"), col("p.b").as("b"))
    .agg(sum(col("cnt")).as("freq"))
    .orderBy(col("freq").desc, col("a"), col("b"))

  /** The sequential reference trainer: ONE merge per driver round —
    * kept as the specification the batched trainer must equal
    * (CurationSpec proves equality on adversarial adjacent/overlapping
    * shapes; the unrolled DuckDB oracle replays THIS definition). */
  private[graft] def bpeTrainSequential(docs: DataFrame, k: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(k >= 1)
    var vocab = bpeVocab(docs)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    (1 to k).foreach { step =>
      val top = bpePairCounts(vocab).limit(1).collect()
      require(top.nonEmpty, s"BPE step $step: no pairs left (k too large for corpus)")
      val (a, b, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((step, a, b, f))
      vocab = vocab.withColumn("sym",
        replace(col("sym"), lit(s" $a  $b "), lit(s" $a$b ")))
        .localCheckpoint(true)
    }
    (merges.result(), vocab)
  }

  /** BATCHED trainer: many merges per driver round, PROVABLY equal to
    * [[bpeTrainSequential]] (the standard pair-cache/batching trick,
    * done conservatively enough to be exact). Per round, collect the
    * top-M pair window (freq DESC, a, b — the argmax order), then
    * accept a PREFIX of it, stopping before any pair that could be
    * reordered by the merges already accepted this round:
    *
    *   1. consumption stop — a pair whose RIGHT symbol equals an
    *      accepted merge's LEFT symbol (x, a), or whose LEFT symbol
    *      equals an accepted merge's RIGHT symbol (b, y), may have had
    *      occurrences consumed by that merge (the 'a' of an "x a"
    *      adjacency disappears exactly when followed by b; the 'b' of a
    *      "b y" adjacency exactly when preceded by a) — its count is
    *      stale, stop. The SAME-side sharings are provably safe for
    *      a ≠ b — an (a, y≠b) occurrence's 'a' is never consumed (it
    *      is not followed by b, and 'a' is only ever a left part), and
    *      symmetrically (x≠a, b) — so the Zipf head's ubiquitous
    *      shared-'</w>'-right pairs batch together (the distinction is
    *      the difference between ~1.5 and ~8 merges per round,
    *      measured);
    *   2. new-pair bound stop — a merge (a,b) can only CREATE pairs
    *      (x, ab) / (ab, y) with count ≤ count(x,a) / count(b,y), so
    *      `bound` tracks the max count of any window pair adjacent to an
    *      accepted merge, and the max possible count of any pair OUTSIDE
    *      the window (the M-th count, `cutoff`); acceptance stops when
    *      the next pair's count ≤ bound — a created pair could outrank
    *      it.
    *
    * By induction the accepted prefix is exactly the sequence the
    * one-merge-per-round loop would emit: every accepted pair's count is
    * unchanged by the earlier accepted merges (disjoint), every
    * not-yet-merged pair ranks at or below its original position
    * (counts only decrease), and every created pair ranks strictly
    * below the acceptance point (bound). Head pair counts are Zipfian,
    * so rounds typically commit several merges — k merges in far fewer
    * than k driver rounds (the SCALE.md k-driver-rounds cliff, fixed). */
  private[graft] def bpeTrainBatched(docs: DataFrame, k: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(k >= 1 && k <= 256, s"merge budget k=$k outside [1, 256]")
    val lookahead = 512
    var vocab = bpeVocab(docs)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var rounds = 0
    while (step < k) {
      rounds += 1
      val window = bpePairCounts(vocab).limit(lookahead).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(window.nonEmpty, s"BPE step ${step + 1}: no pairs left (k too large for corpus)")
      val cutoff = if (window.length == lookahead) window.last._3 else 0L
      val leftSyms = scala.collection.mutable.Set.empty[String]
      val rightSyms = scala.collection.mutable.Set.empty[String]
      // string concatenations the accepted merges CREATE: a pre-existing
      // window pair whose symbol is string-equal to a created symbol
      // (e.g. "abc" already produced by an earlier-round (ab, c) while
      // this round accepts (a, bc)) would have created occurrences ADDED
      // to its stale count — outside the `bound` argument, which only
      // covers pairs with genuinely new symbol keys. Stop before any
      // such pair.
      val createdSyms = scala.collection.mutable.Set.empty[String]
      val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var bound = cutoff
      var stop = false
      var i = 0
      while (!stop && i < window.length && accepted.size < k - step) {
        val (a, b, f) = window(i)
        // self-pairs (a == b) interact with everything adjacent to a —
        // accept them only as the round's first merge
        if (accepted.nonEmpty &&
          (f <= bound || leftSyms(b) || rightSyms(a) || a == b ||
            createdSyms(a) || createdSyms(b))) stop = true
        else {
          accepted += ((a, b, f))
          leftSyms += a; rightSyms += b; createdSyms += a + b
          val share = window.iterator
            .filter { case (qa, qb, _) => (qb == a || qa == b) && !(qa == a && qb == b) }
            .map(_._3).foldLeft(0L)(math.max)
          bound = math.max(bound, share)
          i += 1
        }
      }
      // apply the whole batch as ONE chained projection — replace
      // composes left-to-right exactly like the sequential loop's
      // one-per-round rewrites. Checkpoint every few rounds, not every
      // round: the uncheckpointed tail is a handful of narrow
      // string-replace projections over the 2-partition vocab state —
      // re-deriving it inside the next round's aggregate is cheaper
      // than a materialization job per round (round latency IS the
      // k-scaling term; lineage stays bounded by the checkpoint cadence)
      val sym = accepted.foldLeft(col("sym")) { case (c, (a, b, _)) =>
        replace(c, lit(s" $a  $b "), lit(s" $a$b "))
      }
      vocab = vocab.withColumn("sym", sym)
      if (rounds % 8 == 0) vocab = vocab.localCheckpoint(true)
      accepted.foreach { case (a, b, f) =>
        step += 1; merges += ((step, a, b, f))
      }
    }
    println(s"[graft] bpe: $k merges in $rounds driver rounds")
    (merges.result(), vocab)
  }

  /** Unsigned-UTF-8-byte string ordering — Spark's (and DuckDB's)
    * binary string comparison, NOT Java's UTF-16 compareTo: the local
    * trainer's tie-breaks must match the engines'. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** DRIVER-LOCAL exact BPE over a collected (word, cnt) vocabulary —
    * the algorithm [[bpeTrainSequential]] specifies, run where real
    * tokenizer trainers run it (HF/sentencepiece train in RAM after the
    * corpus-scale counting pass): the corpus scan is distributed, the
    * merge loop is not, because its state is the Heaps-law-bounded
    * vocabulary. Every choice (weighted pair counts, max-freq argmax
    * with UTF-8-binary lexicographic tie-break, left-to-right
    * non-overlapping merge) replays the engine/oracle definition
    * move-for-move — CurationSpec proves equality against both the
    * distributed trainer and the reference. */
  private[graft] def bpeTrainLocalArr(words: Array[(String, Long)], k: Int)
      : (Seq[(Int, String, String, Long)], Array[(String, Long, Array[String])]) = {
    var vocab: Array[(String, Long, Array[String])] =
      // split by Unicode CODE POINT, not UTF-16 unit: Spark's
      // substring/length (and DuckDB's word[i]) are code-point based, so
      // a surrogate-pair split here would hand the local trainer a
      // different symbol alphabet than the distributed one on non-BMP
      // text (emoji, supplementary CJK) — the stats routing must be
      // semantically invisible
      words.map { case (w, c) =>
        (w, c, w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))) :+ "</w>")
      }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    (1 to k).foreach { step =>
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (_, c, syms) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      require(counts.nonEmpty, s"BPE step $step: no pairs left (k too large for corpus)")
      var best: ((String, String), Long) = null
      counts.foreach { e =>
        if (best == null || e._2 > best._2 ||
          (e._2 == best._2 && (utf8Lt(e._1._1, best._1._1) ||
            (e._1._1 == best._1._1 && utf8Lt(e._1._2, best._1._2))))) best = e
      }
      val ((a, b), f) = best
      merges += ((step, a, b, f))
      vocab = vocab.map { case (w, c, syms) =>
        val buf = Array.newBuilder[String]; var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            buf += a + b; i += 2
          } else { buf += syms(i); i += 1 }
        }
        (w, c, buf.result())
      }
    }
    (merges.result(), vocab)
  }

  private def bpeTrain(s: SparkSession, d: String, k: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val docs = Tables.documents(s, d)
    val wordCounts = docs
      .select(explode(toks(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    // stats-routed like knnAuto/nearDupPairsAuto: the merge loop's
    // state is the vocabulary. Under the cutoff, ONE distributed
    // counting scan + a driver-local loop (zero per-merge job latency —
    // the k-driver-rounds term vanishes); over it, the batched
    // distributed loop. Both proven equal to the sequential reference.
    val cutoff = graft.GraftConf.bpeLocalVocabCutoff(s)
    val localWords =
      if (cutoff <= 0) null
      else {
        val rows = wordCounts.limit(cutoff + 1)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        if (rows.length > cutoff) null else rows
      }
    if (localWords == null) {
      println(s"[graft] bpe: vocab over localVocabCutoff=$cutoff -> distributed loop")
      bpeTrainBatched(docs, k)
    } else {
      println(s"[graft] bpe: vocab=${localWords.length} <= cutoff=$cutoff -> local loop")
      val (merges, vocab) = bpeTrainLocalArr(localWords, k)
      val ss = s
      import ss.implicits._
      val vocabDf = vocab.toSeq
        .map { case (w, c, syms) => (w, c, syms.mkString(" ", "  ", " ")) }
        .toDF("word", "cnt", "sym")
      (merges, vocabDf)
    }
  }

  def bpeMerges(s: SparkSession, d: String, k: Int): DataFrame = {
    val (m, _) = bpeTrain(s, d, k)
    import s.implicits._
    m.toDF("step", "left_sym", "right_sym", "pair_freq")
      .select(col("step"), col("left_sym"), col("right_sym"), col("pair_freq"))
      .orderBy(col("step"))
  }

  /** q187: the subword vocabulary the learned merges produce — every
    * final symbol with its corpus frequency (Σ word counts) and the
    * number of distinct words it segments. The inspection surface a
    * tokenizer designer actually reads ("which subwords did k merges
    * buy, and how much corpus do they cover"); same vocab-bounded state
    * as q186, one extra explode+aggregate over the final (word, cnt,
    * sym) relation. */
  def bpeSubwordStats(s: SparkSession, d: String, k: Int): DataFrame = {
    val (_, vocab) = bpeTrain(s, d, k)
    vocab
      .select(col("word"), col("cnt"),
        explode(split(trim(col("sym")), "  ")).as("token"))
      .groupBy(col("token"))
      .agg(sum(col("cnt")).as("freq"),
        countDistinct(col("word")).as("n_words"))
      .orderBy(col("freq").desc, col("token"))
  }

  /** The q186/q187 oracle WITH-chain, generated by unrolling the
    * per-step template — built programmatically so Spark loop and SQL
    * chain cannot drift. */
  private def bpeOracleChain(k: Int): String = {
    val steps = (1 to k).map { i =>
      s"""p$i AS (
        SELECT (u.p).a AS a, (u.p).b AS b, CAST(sum(u.cnt) AS BIGINT) AS freq
        FROM (
          SELECT cnt, unnest(list_transform(range(1, len(s)),
            j -> {'a': s[j], 'b': s[j+1]})) AS p
          FROM (SELECT cnt, string_split(trim(sym), '  ') AS s FROM w${i - 1})) u
        GROUP BY 1, 2),
      t$i AS (SELECT a, b, freq FROM p$i ORDER BY freq DESC, a, b LIMIT 1),
      w$i AS MATERIALIZED (
        SELECT word, cnt,
          replace(sym, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS sym
        FROM w${i - 1} CROSS JOIN t$i)"""
    }.mkString(",\n      ")
    // MATERIALIZED: DuckDB's default CTE inlining re-expands the deep
    // w-chain (the k=64 unroll ran out of file descriptors re-opening
    // the corpus); materializing each vocab state evaluates every step
    // exactly once — which is also what the Spark loop does.
    s"""WITH w0 AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt,
          ' ' || array_to_string(
            list_append(list_transform(range(1, length(word) + 1),
              i -> word[i]), '</w>'), '  ') || ' ' AS sym
        FROM (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents)
        WHERE word <> ''
        GROUP BY 1),
      $steps"""
  }

  /** The w0..wk training chain WITHOUT the leading WITH keyword, for
    * embedding into another query's CTE chain (the CurationPipeline
    * manifest oracle's real-token packing stage). */
  private[graft] def bpeOracleChainInner(k: Int): String =
    bpeOracleChain(k).trim.stripPrefix("WITH")

  private def bpeMergesOracle(k: Int): String = {
    val union = (1 to k)
      .map(i => s"SELECT $i AS step, a AS left_sym, b AS right_sym, freq AS pair_freq FROM t$i")
      .mkString("\n      UNION ALL ")
    s"""${bpeOracleChain(k)}
      $union
      ORDER BY step"""
  }

  private def bpeStatsOracle(k: Int): String =
    s"""${bpeOracleChain(k)},
      tok AS (
        SELECT word, cnt, unnest(string_split(trim(sym), '  ')) AS token
        FROM w$k)
      SELECT token, CAST(sum(cnt) AS BIGINT) AS freq,
        CAST(count(DISTINCT word) AS BIGINT) AS n_words
      FROM tok GROUP BY 1 ORDER BY freq DESC, token"""

  val q186BpeMerges = GraftQuery(
    "q186_bpe_merges",
    "LLM-pipeline tokenizer training: BPE merge learning over the vocab relation (k=6)",
    (s, d) => bpeMerges(s, d, k = 6),
    Some(bpeMergesOracle(6)))

  val q187BpeSubwords = GraftQuery(
    "q187_bpe_subwords",
    "LLM-pipeline tokenizer training: post-merge subword vocabulary coverage (k=6)",
    (s, d) => bpeSubwordStats(s, d, k = 6),
    Some(bpeStatsOracle(6)))

  /** q192: BPE at production merge depth — k=64 through the BATCHED
    * trainer, oracle-checked against the 64-step SEQUENTIAL unroll (the
    * hash match IS the proof that the batch rule commits exactly the
    * sequential merge sequence on the real corpus; CurationSpec proves
    * it on adversarial adjacent/overlapping shapes). The driver-rounds
    * cliff documented in SCALE.md is closed by batching, not by a cheaper
    * round. */
  val q192BpeMergesK64 = GraftQuery(
    "q192_bpe_merges_k64",
    "LLM-pipeline tokenizer training at depth: batched BPE, k=64 merges in few driver rounds",
    (s, d) => bpeMerges(s, d, k = 64),
    Some(bpeMergesOracle(64)))

  // ---------------------------------------------------------------------
  // q196/q197: BPE APPLY — corpus tokenization with the trained merges
  // ---------------------------------------------------------------------

  /** The shipped tokenizer artifact: the learned merge table plus the
    * symbol→token-id vocabulary — base alphabet (every distinct corpus
    * code point + `</w>`) in UTF-8-binary order gets ids `0..n_base-1`,
    * then merge step `i` assigns id `n_base + i - 1` to its product
    * `a+b`; on a string collision (two merges or a merge and a base
    * symbol producing the same string — possible, e.g. (ab,c) and
    * (a,bc) both creating "abc") the SMALLEST id wins, so the map is a
    * function of the symbol string alone, like every real BPE vocab.
    * This is to the tokenizer what the PQ codebook is to the ANN tier:
    * the S6 artifact it ships (reference analogue: the MiniLM tokenizer
    * implicit in app/generate_embeddings.py:25-50). */
  final case class BpeModel(k: Int, merges: Seq[(Int, String, String, Long)],
      vocab: Seq[(String, Int)])

  private val bpeModelCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), BpeModel]

  private def bpeSessionKey(s: SparkSession): String =
    System.identityHashCode(s).toString

  private def bpeArtifactExists(s: SparkSession, p: String): Boolean = {
    // vocab is written LAST in saveBpeModel, so its _SUCCESS is the
    // commit marker for the whole artifact
    val path = new org.apache.hadoop.fs.Path(s"$p/vocab", "_SUCCESS")
    path.getFileSystem(s.sparkContext.hadoopConfiguration).exists(path)
  }

  private[graft] def saveBpeModel(s: SparkSession, m: BpeModel, p: String): Unit = {
    val ss = s; import ss.implicits._
    m.merges.toDF("step", "left_sym", "right_sym", "pair_freq")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/merges")
    m.vocab.toDF("sym", "id")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/vocab")
  }

  private[graft] def loadBpeModel(s: SparkSession, p: String, k: Int): BpeModel = {
    val mg = s.read.parquet(s"$p/merges").orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val vb = s.read.parquet(s"$p/vocab").orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    BpeModel(k, mg, vb)
  }

  private[graft] def fitBpeModel(s: SparkSession, d: String, k: Int): BpeModel = {
    val (merges, _) = bpeTrain(s, d, k)
    // the base alphabet is a DISTINCT-code-point collect — bounded by
    // the corpus alphabet (≤ a few thousand symbols even multilingual),
    // the same driver-scalar discipline as the centroid/codebook
    // artifacts
    val chars = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")).as("ch"))
      .distinct().collect().map(_.getString(0))
    val base = (chars.toSeq :+ "</w>").distinct.sortWith(utf8Lt)
    val ids = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    base.zipWithIndex.foreach { case (c, i) => ids.update(c, i) }
    merges.foreach { case (step, a, b, _) =>
      val sym = a + b
      // first creation wins = smallest id per symbol string (steps ascend)
      if (!ids.contains(sym)) ids.update(sym, base.length + step - 1)
    }
    BpeModel(k, merges, ids.toSeq)
  }

  /** Train-or-load the tokenizer artifact: cached per (session, dataset,
    * k) and persisted under `spark.graft.index.dir` as two parquet
    * relations (merges, vocab) — S6 parity with the PQ codebook. */
  def bpeModel(s: SparkSession, d: String, k: Int): BpeModel =
    graft.FitTiming.cachedOrFit(bpeModelCache, (bpeSessionKey(s), s"$d@k=$k")) {
      ModelStore.artifactPath(s, "bpe_model", d, s"k=$k") match {
        case Some(p) if bpeArtifactExists(s, p) => loadBpeModel(s, p, k)
        case Some(p) => val m = fitBpeModel(s, d, k); saveBpeModel(s, m, p); m
        case None => fitBpeModel(s, d, k)
      }
    }

  /** The TOKENIZED CORPUS as a maintained relation — `(doc_id,
    * token_ids ARRAY<INT>, n_tokens INT)` for the whole documents
    * table, the artifact every training-data pipeline materializes once
    * and reads everywhere (packing, batching, span corruption,
    * waterfilling, chunking all start from it). Two layers, the tf/lens
    * forward-index treatment (round 15, VERDICT r14 Missing #2's
    * structural fix — q214/q215 re-ran the full tokenize→encode chain
    * per invocation, which made them the recurring load-sensitive bench
    * outliers):
    *  - ACROSS JVMs: with the model store on, a doc_id-bucketed catalog
    *    table per (dataset, k) via [[StoredTables.storedBucketedTable]]
    *    — a fresh session re-registers the files with one DDL instead
    *    of re-encoding; doc_id bucketing plans the doc-keyed joins the
    *    consumers all do (docs ⋈ enc) exchange-free on the stored side.
    *    At 100 TB this IS the tokenized shard table next to the corpus.
    *  - IN-SESSION: cached + persisted per (session, dataset, k, store)
    *    — the fitted-model discipline.
    * Encode of an ARBITRARY frame stays [[bpeEncodeDocs]] (no sound
    * cache identity for intermediate frames — the Embedding.model
    * rule). */
  private val bpeEncCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def encodedDocs(s: SparkSession, d: String, k: Int): DataFrame = {
    val bk = graft.GraftConf.hybridPostingBuckets(s,
      graft.plans.TableStats.forParquet(s, s"$d/documents.parquet").rows)
    val store = graft.GraftConf.indexDir(s).getOrElse("off")
    val key = (bpeSessionKey(s), s"$d@k=$k|bk=$bk|store=$store")
    graft.FitTiming.cachedOrFit(bpeEncCache, key) {
      StoredTables.storedBucketedTable(s, "bpe_tokens", "bpetok", d,
        s"k=$k,bk=$bk",
        "doc_id BIGINT, token_ids ARRAY<INT>, n_tokens INT", "doc_id", bk)(
        bpeEncodeDocs(Tables.documents(s, d), bpeModel(s, d, k))).persist()
    }
  }

  private[graft] def clearEncCache(): Unit = {
    bpeEncCache.values.foreach(_.unpersist())
    bpeEncCache.clear()
  }

  /** BPE-encode a document frame with a trained model: `(doc_id,
    * token_ids ARRAY<INT>, n_tokens)` — the missing half of the
    * tokenizer (train q186/q192 emits the merge table; this applies it),
    * the step every training-data pipeline runs right after training.
    *
    * Distribution shape: the k-merge chain runs once per DISTINCT word
    * (the Heaps-law-bounded training-state discipline applied to
    * inference — never corpus rows) as chained left-to-right
    * non-overlapping `replace`s, the EXACT contract the trainers use, so
    * encode(w) is by construction the trainer's final segmentation of w.
    * Symbols map to ids through the broadcast vocab relation, words
    * re-assemble to documents keyed by (word position, symbol position):
    * one bounded word-relation shuffle + one doc-keyed shuffle, both
    * linear. Unknown symbols (code points absent from the training
    * alphabet, possible when encoding a different corpus) map to -1, the
    * documented UNK id. Empty/whitespace-only docs encode to the empty
    * sequence, not null. */
  def bpeEncodeDocs(docs: DataFrame, model: BpeModel): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val sym0 = concat(lit(" "), concat_ws("  ",
      concat(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        array(lit("</w>")))), lit(" "))
    val symk = model.merges.foldLeft(sym0) { case (c, (_, a, b, _)) =>
      replace(c, lit(s" $a  $b "), lit(s" $a$b ")) }
    val vocabDf = model.vocab.toDF("tok", "id")
    val wordIds = docs
      .select(explode(toks(col("text"))).as("word"))
      .filter(col("word") =!= "").distinct()
      .select(col("word"), posexplode(split(trim(symk), "  ")).as(Seq("sub", "tok")))
      .join(broadcast(vocabDf), Seq("tok"), "left")
      .groupBy(col("word"))
      .agg(sort_array(collect_list(struct(col("sub"),
        coalesce(col("id"), lit(-1)).cast("int").as("tid")))).as("st"))
      .select(col("word"), expr("transform(st, x -> x.tid)").as("word_ids"))
    val perDoc = docs
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
      .join(wordIds, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(expr(
        "flatten(transform(sort_array(collect_list(struct(pos, word_ids))), x -> x.word_ids))")
        .as("token_ids"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("token_ids"), expr("CAST(array() AS ARRAY<INT>)")).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast("int"))
  }

  /** q197: q48's packing twin with REAL token counts — the budget is the
    * BPE token count from [[bpeEncodeDocs]], not the whitespace proxy
    * (q48 keeps the proxy as the cheap-estimate form; this is what a
    * production packer bins by). Same sharded-cumsum rule, same
    * per-sequence profile. */
  def packSequencesBpe(s: SparkSession, d: String, budget: Long, k: Int): DataFrame = {
    val docs = Tables.documents(s, d)
    val enc = encodedDocs(s, d, k).select(col("doc_id"), col("n_tokens"))
    packByTokens(
      docs.select(col("doc_id"), col("source")).join(enc, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tokens").cast("long").as("n_tok")),
      budget)
  }

  /** The vocab-id relation of the q196/q197 oracles, appended to the
    * training chain: base alphabet ids by binary order, merge-product
    * ids by step, min-id per symbol string — the SQL replay of
    * [[fitBpeModel]]. */
  private def bpeVocabOracle(k: Int): String = {
    val mt = (1 to k)
      .map(i => s"SELECT $i AS step, a, b FROM t$i")
      .mkString("\n        UNION ALL ")
    s"""chars AS (
        SELECT DISTINCT unnest(list_transform(range(1, length(word) + 1),
          i -> word[i])) AS sym
        FROM w0),
      base AS MATERIALIZED (
        SELECT sym, CAST(row_number() OVER (ORDER BY sym) - 1 AS INTEGER) AS id
        FROM (SELECT sym FROM chars UNION SELECT '</w>' AS sym)),
      mt AS ($mt),
      vocab AS MATERIALIZED (
        SELECT sym, CAST(min(id) AS INTEGER) AS id FROM (
          SELECT sym, id FROM base
          UNION ALL
          SELECT a || b AS sym,
            (SELECT CAST(count(*) AS INTEGER) FROM base) + step - 1 AS id
          FROM mt)
        GROUP BY sym)"""
  }

  /** Shared oracle chain ending in `enc` (doc_id, tid ARRAY) — the
    * per-doc token-id replay behind q196 and q201. */
  private def bpeEncodeChain(k: Int): String =
    s"""${bpeOracleChain(k)},
      ${bpeVocabOracle(k)},
      wt AS MATERIALIZED (
        SELECT word, string_split(trim(sym), '  ') AS tl FROM w$k),
      dtok AS (
        SELECT doc_id, (u.e).w AS word, (u.e).i AS pos FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
            i -> {'w': ws[i], 'i': i})) AS e
          FROM (SELECT doc_id,
              string_split_regex(lower(trim(text)), '\\s+') AS ws
            FROM documents)) u
        WHERE (u.e).w <> ''),
      sub AS (
        SELECT doc_id, pos, (v.e).j AS sub, (v.e).t AS tok FROM (
          SELECT doc_id, pos, unnest(list_transform(range(1, len(tl) + 1),
            j -> {'t': tl[j], 'j': j})) AS e
          FROM dtok JOIN wt USING (word)) v),
      enc AS MATERIALIZED (
        SELECT doc_id,
          list(coalesce(vv.id, -1) ORDER BY pos, sub) AS tid
        FROM sub LEFT JOIN vocab vv ON vv.sym = sub.tok
        GROUP BY doc_id)"""

  private def bpeEncodeOracle(k: Int): String =
    s"""${bpeEncodeChain(k)}
      SELECT d.doc_id,
        CAST(coalesce(len(e.tid), 0) AS INTEGER) AS n_tokens,
        coalesce(array_to_string(
          list_transform(e.tid, x -> CAST(x AS VARCHAR)), ','), '') AS token_ids
      FROM documents d LEFT JOIN enc e USING (doc_id)
      ORDER BY d.doc_id"""

  private def bpePackOracle(k: Int, budget: Long): String =
    s"""${bpeOracleChain(k)},
      wt AS MATERIALIZED (
        SELECT word,
          CAST(len(string_split(trim(sym), '  ')) AS BIGINT) AS wtok
        FROM w$k),
      dw AS (
        SELECT doc_id,
          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents),
      dn AS (
        SELECT doc_id, CAST(sum(wtok) AS BIGINT) AS n_tok
        FROM dw JOIN wt USING (word) WHERE word <> '' GROUP BY doc_id),
      t AS (
        SELECT d.doc_id, d.source, coalesce(dn.n_tok, 0) AS n_tok,
          ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard
        FROM documents d LEFT JOIN dn USING (doc_id)),
      c AS (
        SELECT doc_id, source, shard, n_tok,
          sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT source, shard,
        CAST(floor((cum - n_tok) / $budget) AS BIGINT) AS seq_id,
        count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** q196: the tokenizer APPLY — every doc encoded to its token-id
    * sequence with the k=6 trained merges (ids stringified for the
    * cross-engine hash, q135's postings convention; the product API
    * [[bpeEncodeDocs]] returns the real ARRAY<INT>). */
  val q196BpeEncode = GraftQuery(
    "q196_bpe_encode",
    "LLM-pipeline tokenizer APPLY: BPE-encode the corpus with the trained merge table (k=6)",
    (s, d) => encodedDocs(s, d, 6)
      .select(col("doc_id"), col("n_tokens"),
        expr("array_join(transform(token_ids, x -> CAST(x AS STRING)), ',')")
          .as("token_ids"))
      .orderBy(col("doc_id")),
    Some(bpeEncodeOracle(6)))

  val q197BpePacking = GraftQuery(
    "q197_bpe_packing",
    "LLM-pipeline: sequence packing budgeted by REAL BPE token counts (q48 twin)",
    (s, d) => packSequencesBpe(s, d, budget = 2048L, k = 6),
    Some(bpePackOracle(6, 2048L)))

  /** BPE-decode token-id sequences back to whitespace-normalized text:
    * ids map to symbols through the broadcast vocab, symbols
    * concatenate per document (order restored from the encode
    * position), and `</w>` markers re-separate words. The inverse every
    * tokenizer ships next to encode — and, composed with
    * [[bpeEncodeDocs]], a ROUND-TRIP: decode(encode(text)) must equal
    * the whitespace-normalized text exactly, which is what q200's
    * oracle states (the oracle is the normalized text itself — no
    * replay of the chain at all, the strongest possible form).
    * Caveats shared with every `</w>`-marker BPE (Sennrich): a word
    * whose TEXT literally contains "</w>" would decode with an extra
    * space (the oracle would catch it on any corpus where it occurs),
    * and ids absent from the vocab (the -1 UNK) are dropped. */
  def bpeDecodeDocs(encoded: DataFrame, model: BpeModel): DataFrame = {
    val s = encoded.sparkSession
    import s.implicits._
    val vocabDf = model.vocab.map { case (sym, i) => (i, sym) }.toDF("tid", "sym")
    val parts = encoded
      .select(col("doc_id"), posexplode(col("token_ids")).as(Seq("p", "tid")))
      .join(broadcast(vocabDf), Seq("tid"))
      .groupBy(col("doc_id"))
      .agg(expr(
        "array_join(transform(sort_array(collect_list(struct(p, sym))), x -> x.sym), '')")
        .as("joined"))
    encoded.select(col("doc_id")).join(parts, Seq("doc_id"), "left")
      // symbols carry the </w> end-of-word marker: swap it for a single
      // space and trim the trailing one — empty docs decode to ''
      .select(col("doc_id"),
        trim(replace(coalesce(col("joined"), lit("")), lit("</w>"), lit(" ")))
          .as("text"))
  }

  /** The materialized training sequences — the end of the product path
    * (tokenize → pack → EMIT): q197's bins carrying their actual packed
    * token-id payloads, docs concatenated in doc_id order within each
    * sequence (ids stringified for the cross-engine hash; a production
    * sink writes the INT arrays as the training shards). Same sharded
    * window as q48 — per-shard state, never a global sort. */
  def packedSequencesBpe(s: SparkSession, d: String, budget: Long,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val shards = graft.GraftConf.packShards(s)
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"))
      .join(encodedDocs(s, d, k), Seq("doc_id"))
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long") % shards)
      .withColumn("n_tok", col("n_tokens").cast("long"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", floor((col("cum") - col("n_tok")) / budget))
      .withColumn("ids_str",
        expr("array_join(transform(token_ids, x -> CAST(x AS STRING)), ',')"))
      .groupBy(col("source"), col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        expr("array_join(transform(sort_array(collect_list(struct(doc_id, ids_str))), x -> x.ids_str), ',')")
          .as("token_ids"))
      .orderBy(col("source"), col("shard"), col("seq_id"))
  }

  val q201TrainingSequences = GraftQuery(
    "q201_training_sequences",
    "LLM-pipeline END of the path: packed training sequences with their actual token-id payloads",
    (s, d) => packedSequencesBpe(s, d, budget = 2048L, k = 6),
    Some(s"""${bpeEncodeChain(6)},
      dd AS (
        SELECT d.doc_id, d.source,
          coalesce(CAST(len(e.tid) AS BIGINT), 0) AS n_tok,
          coalesce(array_to_string(
            list_transform(e.tid, x -> CAST(x AS VARCHAR)), ','), '') AS ids_str,
          ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard
        FROM documents d LEFT JOIN enc e USING (doc_id)),
      cc AS (
        SELECT *, sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM dd)
      SELECT source, shard,
        CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS seq_id,
        count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        array_to_string(list(ids_str ORDER BY doc_id), ',') AS token_ids
      FROM cc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** q202: TOKEN-budget mixture — the q184 temperature draw re-based on
    * what pretraining actually budgets: tokens, not documents. Per
    * source, α = 1/2 temperature weights over the REAL BPE token mass
    * (w = ⌊√Σtok⌋, integer targets via exact `div` — the q184
    * discipline), then docs admit in the deterministic md5-priority
    * order while their START offset sits under the source's token
    * budget (q48's streaming greedy-fill rule — no partial documents,
    * one per-source window pass). Output is the per-source mixture
    * profile. At 100 TB the cumsum runs over the bounded top-R priority
    * prefix (R ≥ budget/min-doc-tokens documents can ever admit), the
    * prioritySample heap pattern — the window never needs the whole
    * source. */
  def tokenBudgetMixture(s: SparkSession, d: String, budgetTokens: Long,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val base = docs.select(col("doc_id"), col("source"))
      .join(encodedDocs(s, d, k).select(col("doc_id"), col("n_tokens")),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        col("n_tokens").cast("long").as("n_tok"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 13)
          .as("pri"))
    val w = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base.withColumn("cum", sum(col("n_tok")).over(w))
    val totals = base.groupBy(col("source")).agg(sum(col("n_tok")).as("tok_total"))
      .withColumn("w", floor(sqrt(col("tok_total"))).cast("long"))
    val tw = totals.agg(sum(col("w")).as("sw"))
    val budgets = totals.crossJoin(broadcast(tw))
      .select(col("source"), col("tok_total"), col("w"),
        greatest(lit(1L), expr(s"(${budgetTokens}L * w) div sw"))
          .as("budget_tok"))
    cum.join(broadcast(budgets), Seq("source"))
      .filter(col("cum") - col("n_tok") < col("budget_tok"))
      .groupBy(col("source"), col("tok_total"), col("w"), col("budget_tok"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("tok_kept"))
      .orderBy(col("source"))
  }

  val q202TokenMixture = GraftQuery(
    "q202_token_mixture",
    "LLM-pipeline: temperature mixture budgeted in REAL tokens (q184 × q196 × q48 compose)",
    (s, d) => tokenBudgetMixture(s, d, budgetTokens = 30000L, k = 6),
    Some(s"""${bpeEncodeChain(6)},
      dv AS (
        SELECT d.doc_id, d.source,
          coalesce(CAST(len(e.tid) AS BIGINT), 0) AS n_tok,
          substr(md5(d.doc_id::VARCHAR), 1, 13) AS pri
        FROM documents d LEFT JOIN enc e USING (doc_id)),
      tt AS (
        SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok_total,
          CAST(floor(sqrt(sum(n_tok)::DOUBLE)) AS BIGINT) AS w
        FROM dv GROUP BY 1),
      swt AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM tt),
      bg AS (
        SELECT source, tok_total, w,
          CAST(greatest(1, (30000 * w) // sw) AS BIGINT) AS budget_tok
        FROM tt CROSS JOIN swt),
      cm AS (
        SELECT dv.*, sum(n_tok) OVER (PARTITION BY source
          ORDER BY pri, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM dv)
      SELECT source, tok_total, w, budget_tok,
        count(*) AS n_kept, CAST(sum(n_tok) AS BIGINT) AS tok_kept
      FROM cm JOIN bg USING (source)
      WHERE cum - n_tok < budget_tok
      GROUP BY source, tok_total, w, budget_tok ORDER BY source"""))

  /** Token-id frequency counts of a document frame under a FROZEN
    * tokenizer — the monitoring relation behind tokenizer-drift
    * dashboards (fragmentation creep / OOV drift shows up as mass
    * moving toward base-alphabet ids). Vocabulary-bounded output. */
  def tokenCounts(docs: DataFrame, model: BpeModel): DataFrame =
    tokenCountsEnc(bpeEncodeDocs(docs, model))

  private def tokenCountsEnc(enc: DataFrame): DataFrame =
    enc.select(explode(col("token_ids")).as("tid"))
      .groupBy(col("tid")).agg(count(lit(1)).as("cnt"))

  /** q203: the corpus token-id distribution under the trained
    * tokenizer, symbols joined back for readability — what a training
    * run monitors to catch tokenizer/corpus mismatch. */
  def tokenDistribution(s: SparkSession, d: String, k: Int): DataFrame = {
    import s.implicits._
    val model = bpeModel(s, d, k)
    val vocabDf = model.vocab.toDF("token", "tid")
    tokenCountsEnc(encodedDocs(s, d, k))
      .join(broadcast(vocabDf), Seq("tid"))
      .select(col("tid"), col("token"), col("cnt"))
      .orderBy(col("tid"))
  }

  private def tokenDistributionOracle(k: Int): String =
    s"""${bpeEncodeChain(k)},
      tc AS (SELECT unnest(tid) AS tid FROM enc),
      ct AS (SELECT tid, CAST(count(*) AS BIGINT) AS cnt FROM tc GROUP BY 1)
      SELECT ct.tid, v.sym AS token, ct.cnt
      FROM ct JOIN vocab v ON v.id = ct.tid
      ORDER BY ct.tid"""

  val q203TokenDistribution = GraftQuery(
    "q203_token_distribution",
    "LLM-pipeline monitoring: corpus token-id distribution under the trained tokenizer",
    (s, d) => tokenDistribution(s, d, k = 6),
    Some(tokenDistributionOracle(6)))

  /** q204: q203 maintained INCREMENTALLY — the NINTH streamed/batch
    * pairing: document batches encode under the FROZEN tokenizer
    * artifact and fold into the additive (tid, cnt) state on the
    * versioned exactly-once contract
    * (StreamingJobs.applyTokenCountBatch); the drained state renders
    * through the same vocab join and carries q203's full oracle. The
    * standing form of the drift monitor: per-trigger cost is one
    * batch encode + a vocabulary-bounded merge, never a corpus
    * rescan. Additive like CMS/c-TF-IDF: overlapping redelivery
    * inflates counts — dedup upstream or fingerprint-guard as there. */
  def streamedTokenDistribution(s: SparkSession, d: String,
      nBatches: Int): DataFrame = {
    import s.implicits._
    require(nBatches >= 1)
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft_tok_state").toString
    val counts = try {
      val docs = Tables.documents(s, d)
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingJobs.applyTokenCountBatch(s,
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === i),
          i.toLong, d, 6, stateDir)
      }
      graft.streaming.StreamingJobs.latestAggState(s, stateDir).get._2
        .localCheckpoint(true)
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    }
    val vocabDf = bpeModel(s, d, 6).vocab.toDF("token", "tid")
    counts.join(broadcast(vocabDf), Seq("tid"))
      .select(col("tid"), col("token"), col("cnt"))
      .orderBy(col("tid"))
  }

  val q204StreamedTokenCounts = GraftQuery(
    "q204_streamed_token_counts",
    "LLM-pipeline monitoring + streaming: incremental token-distribution state (carries q203's oracle)",
    (s, d) => streamedTokenDistribution(s, d, nBatches = 3),
    Some(tokenDistributionOracle(6)))

  /** q205: tokenizer FERTILITY (tokens emitted per word) by language
    * and source — the standard tokenizer-quality metric: high fertility
    * on a slice means the vocabulary under-serves it (drives both
    * training cost and effective context length). One exact-integer
    * division per group rounded to 4 (the q164 rational-arithmetic
    * convention), so the profile hash-matches cross-engine. */
  val q205TokenizerFertility = GraftQuery(
    "q205_tokenizer_fertility",
    "LLM-pipeline monitoring: tokens-per-word fertility by lang/source under the trained tokenizer",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val enc = encodedDocs(s, d, 6).select(col("doc_id"), col("n_tokens"))
      docs.select(col("doc_id"), col("lang"), col("source"),
          size(filter(toks(col("text")), w => w =!= "")).cast("long").as("n_words"))
        .join(enc, Seq("doc_id"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n_words")).as("words"),
          sum(col("n_tokens").cast("long")).as("tokens"))
        .filter(col("words") > 0)
        .select(col("lang"), col("source"), col("words"), col("tokens"),
          round(col("tokens").cast("double") / col("words"), 4).as("fertility"))
        .orderBy(col("lang"), col("source"))
    },
    Some(s"""${bpeEncodeChain(6)},
      dw AS (
        SELECT doc_id, lang, source,
          CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            w -> w <> '')) AS BIGINT) AS n_words
        FROM documents),
      j AS (
        SELECT dw.lang, dw.source, dw.n_words,
          coalesce(CAST(len(e.tid) AS BIGINT), 0) AS n_tokens
        FROM dw LEFT JOIN enc e USING (doc_id))
      SELECT lang, source, CAST(sum(n_words) AS BIGINT) AS words,
        CAST(sum(n_tokens) AS BIGINT) AS tokens,
        round(sum(n_tokens)::DOUBLE / sum(n_words), 4) AS fertility
      FROM j GROUP BY 1, 2 HAVING sum(n_words) > 0
      ORDER BY lang, source"""))

  /** Sliding-window context chunking over REAL token ids — the step
    * between tokenize (q196) and pack (q197/q201) in every LLM
    * training-data pipeline: a document longer than the model context
    * is cut into overlapping windows (window W tokens, stride S ≤ W, so
    * consecutive chunks share W−S tokens of context; the standard
    * long-document contract: n ≤ W → one chunk, else ⌈(n−W)/S⌉+1
    * chunks, the last one short but never empty). q106 is the
    * character-proxy form; this is the token-exact one the packer
    * actually consumes.
    *
    * Scale shape: one [[bpeEncodeDocs]] pass (two linear shuffles) then
    * a pure per-row lateral explode — chunk fan-out is
    * Σ ⌈(n_i−W)/S⌉+1 ≈ corpus_tokens/S rows, no additional shuffle,
    * whole-stage codegen end to end. (doc_id, chunk_id) lineage
    * preserved, q106's convention. */
  def chunkTokensBpe(docs: DataFrame, model: BpeModel, window: Int,
      stride: Int): DataFrame =
    chunkTokensEnc(bpeEncodeDocs(docs, model), window, stride)

  /** [[chunkTokensBpe]] over an already-encoded `(doc_id, token_ids,
    * n_tokens)` frame — the registered queries read the materialized
    * [[encodedDocs]] relation through this form. */
  def chunkTokensEnc(enc: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    enc
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("token_ids"),
        // div yields LONG; cast the chunk index back to INT so the
        // downstream slice()/arithmetic stay in integer codegen
        explode(expr(s"sequence(0, CAST(greatest(" +
          s"(n_tokens - $window + $stride - 1) div $stride, 0) AS INT))"))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        expr(s"slice(token_ids, chunk_id * $stride + 1, $window)").as("token_ids"))
      .withColumn("n_chunk_tokens", size(col("token_ids")))
  }

  /** q212: token-exact context chunking, W=16 / S=12 (overlap 4). The
    * oracle replays the full encode chain then the identical lateral
    * window arithmetic (ids stringified for the cross-engine hash,
    * q196's convention; the product API returns the real ARRAY<INT>). */
  val q212TokenChunks = GraftQuery(
    "q212_token_chunks",
    "LLM-pipeline tokenizer ext: sliding-window context chunks over real BPE token ids (q196 compose)",
    (s, d) => chunkTokensEnc(encodedDocs(s, d, 6),
        window = 16, stride = 12)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_chunk_tokens"),
        expr("array_join(transform(token_ids, x -> CAST(x AS STRING)), ',')")
          .as("token_ids"))
      .orderBy(col("doc_id"), col("chunk_id")),
    Some(s"""${bpeEncodeChain(6)},
      -- per-row unnest(range(...)), not the generate_series table
      -- function: DuckDB's table functions reject lateral column
      -- parameters (len(tid) varies by row)
      ix AS (
        SELECT doc_id, tid, unnest(range(0,
            greatest((len(tid) - 16 + 12 - 1) // 12, 0) + 1)) AS i
        FROM enc WHERE len(tid) > 0),
      ch AS (
        SELECT doc_id, i AS chunk_id, i * 12 AS start_tok,
          list_slice(tid, i * 12 + 1, i * 12 + 16) AS chunk
        FROM ix)
      SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        CAST(start_tok AS INTEGER) AS start_tok,
        CAST(len(chunk) AS INTEGER) AS n_chunk_tokens,
        array_to_string(list_transform(chunk, x -> CAST(x AS VARCHAR)), ',')
          AS token_ids
      FROM ch ORDER BY doc_id, chunk_id"""))

  /** Length-bucketed batch assembly with padding-waste accounting — the
    * dataloader step after tokenize: sequences padded to the longest
    * member of their batch waste compute, so loaders group sequences
    * into LENGTH BUCKETS per shard and batch within a bucket in length
    * order (public pattern: fairseq's `--required-batch-size-multiple`
    * bucketing, HuggingFace `group_by_length`). This operator composes
    * the engine's own pieces — q196's real token counts and q213's
    * seeded shard assignment — and reports, per (strategy, shard), the
    * real vs padded token totals for `bucketed` (width-`bucketWidth`
    * buckets, length-desc order) against `naive` (arrival order, i.e.
    * the q213 within-shard position), the measured claim being the
    * padding waste bucketing removes.
    *
    * Scale shape: bucketing is per-row arithmetic in the scan stage;
    * the ONLY exchanges are the encode pass and the hash partition by
    * shard. Every window partitions by (shard[, bucket]) — N/S rows per
    * sort, shards sized to the cluster, never a corpus-global sort.
    * Padding is always to the batch's own max (both strategies), so the
    * comparison isolates exactly the ordering effect. */
  def lengthBucketedBatches(s: SparkSession, d: String, k: Int,
      shards: Int, seed: Long, batchSize: Int, bucketWidth: Int): DataFrame = {
    require(batchSize >= 1 && bucketWidth >= 1)
    val docs = Tables.documents(s, d)
    val enc = encodedDocs(s, d, k)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"))
    val sh = graft.plans.Scale.seededShuffleAssign(docs, "doc_id", shards, seed)
      .select(col("doc_id"), col("shard"), col("pos"))
    val base = enc.join(sh, Seq("doc_id"))
      .withColumn("bucket",
        expr(s"CAST((n_tokens + ${bucketWidth - 1}) div $bucketWidth AS INT)"))
    def perShard(batched: org.apache.spark.sql.RelationalGroupedDataset,
        strategy: String): DataFrame =
      batched
        .agg(count(lit(1)).as("bsz"), max(col("n_tokens")).as("mx"),
          sum(col("n_tokens")).as("rt"))
        .groupBy(col("shard"))
        .agg(sum(col("bsz")).as("n_seqs"), count(lit(1)).as("n_batches"),
          sum(col("rt")).as("real_tok"),
          sum(col("bsz") * col("mx")).as("padded_tok"))
        .withColumn("strategy", lit(strategy))
    val wB = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    val bucketed = perShard(
      base.withColumn("rn", row_number().over(wB))
        .withColumn("batch", expr(s"CAST((rn - 1) div $batchSize AS INT)"))
        .groupBy(col("shard"), col("bucket"), col("batch")), "bucketed")
    // naive = arrival order: re-rank the non-empty docs by the q213
    // within-shard position (pos itself has holes where empty docs sat)
    val wN = Window.partitionBy(col("shard")).orderBy(col("pos"))
    val naive = perShard(
      base.withColumn("rn", row_number().over(wN))
        .withColumn("batch", expr(s"CAST((rn - 1) div $batchSize AS INT)"))
        .groupBy(col("shard"), col("batch")), "naive")
    bucketed.unionByName(naive)
      .withColumn("waste_ppm", round(lit(1000000.0) *
          (col("padded_tok") - col("real_tok")) / col("padded_tok"), 0)
        .cast("long"))
      .select(col("strategy"), col("shard"), col("n_seqs"), col("n_batches"),
        col("real_tok"), col("padded_tok"), col("waste_ppm"))
      .orderBy(col("strategy"), col("shard"))
  }

  /** q214: length-bucketed batching over the q213 shards, B=8 sequences
    * per batch, width-32 length buckets, vs the naive arrival-order
    * baseline. The oracle replays the encode chain, the affine shard
    * assignment (q213's constants) and both batching disciplines. */
  val q214LengthBatching = GraftQuery(
    "q214_length_batching",
    "LLM-pipeline dataloader ext: length-bucketed batch assembly, padding waste vs arrival order (q196+q213 compose)",
    (s, d) => lengthBucketedBatches(s, d, k = 6, shards = 8, seed = 42L,
      batchSize = 8, bucketWidth = 32),
    Some(s"""${bpeEncodeChain(6)},
      nt AS MATERIALIZED (
        SELECT doc_id, len(tid) AS n_tokens FROM enc WHERE len(tid) > 0),
      shx AS MATERIALIZED (
        SELECT doc_id,
          CAST(((2654435761 * doc_id + 42) % 1000000007) % 8 AS INTEGER) AS shard,
          row_number() OVER (
            PARTITION BY ((2654435761 * doc_id + 42) % 1000000007) % 8
            ORDER BY (2654435761 * doc_id + 42) % 1000000007) AS pos
        FROM documents),
      lb AS MATERIALIZED (
        SELECT nt.doc_id, nt.n_tokens, shx.shard, shx.pos,
          (nt.n_tokens + 31) // 32 AS bucket
        FROM nt JOIN shx USING (doc_id)),
      bb AS (
        SELECT shard, bucket, (rn - 1) // 8 AS batch,
          count(*) AS bsz, max(n_tokens) AS mx, sum(n_tokens) AS rt
        FROM (
          SELECT shard, bucket, n_tokens,
            row_number() OVER (PARTITION BY shard, bucket
              ORDER BY n_tokens DESC, doc_id) AS rn
          FROM lb)
        GROUP BY 1, 2, 3),
      nb AS (
        SELECT shard, (rn - 1) // 8 AS batch,
          count(*) AS bsz, max(n_tokens) AS mx, sum(n_tokens) AS rt
        FROM (
          SELECT shard, n_tokens,
            row_number() OVER (PARTITION BY shard ORDER BY pos) AS rn
          FROM lb)
        GROUP BY 1, 2),
      u AS (
        SELECT 'bucketed' AS strategy, shard,
          CAST(sum(bsz) AS BIGINT) AS n_seqs,
          count(*) AS n_batches,
          CAST(sum(rt) AS BIGINT) AS real_tok,
          CAST(sum(bsz * mx) AS BIGINT) AS padded_tok
        FROM bb GROUP BY 1, 2
        UNION ALL
        SELECT 'naive' AS strategy, shard,
          CAST(sum(bsz) AS BIGINT) AS n_seqs,
          count(*) AS n_batches,
          CAST(sum(rt) AS BIGINT) AS real_tok,
          CAST(sum(bsz * mx) AS BIGINT) AS padded_tok
        FROM nb GROUP BY 1, 2)
      SELECT strategy, shard, n_seqs, n_batches, real_tok, padded_tok,
        CAST(round(1000000.0 * (padded_tok - real_tok) / padded_tok, 0)
          AS BIGINT) AS waste_ppm
      FROM u ORDER BY strategy, shard"""))

  /** Seeded span-corruption planning — the T5/UL2 denoising-objective
    * preprocessing step (Raffel et al., JMLR 2020 — public pattern):
    * pick pseudo-random noise spans over each document's token stream,
    * merge overlaps, and account the masked fraction. Span selection is
    * pure per-position hash arithmetic (the q213 md5-conv discipline, no
    * RNG state), so the plan is deterministic, seed-reproducible and
    * exactly replayable cross-engine: position t anchors a span iff
    * H(doc, t, seed) ≡ 0 (mod rateInv), with length 1 + (H div rateInv)
    * mod maxSpan — expected density ≈ (maxSpan+1)/(2·rateInv) before
    * merging. Overlapping/adjacent spans merge with the q152
    * gaps-and-islands pass (running max(end) over preceding spans).
    *
    * Scale shape: explode to token positions (corpus_tokens rows,
    * codegen arithmetic, immediately filtered to the ~1/rateInv
    * anchors), then per-doc windows over the surviving spans — bounded
    * by each doc's own anchor count, partitioned by doc_id, never a
    * global sort. */
  def spanCorruptionPlan(docs: DataFrame, model: BpeModel, seed: Long,
      rateInv: Int, maxSpan: Int): DataFrame =
    spanCorruptionEnc(bpeEncodeDocs(docs, model), seed, rateInv, maxSpan)

  /** [[spanCorruptionPlan]] over an already-encoded frame (the q215
    * entry reads the materialized [[encodedDocs]] relation). */
  def spanCorruptionEnc(encoded: DataFrame, seed: Long,
      rateInv: Int, maxSpan: Int): DataFrame = {
    require(rateInv >= 2 && maxSpan >= 1)
    val enc = encoded.filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens").as("n"))
    val spans = enc
      .select(col("doc_id"), col("n"),
        explode(expr("sequence(0, n - 1)")).as("tpos"))
      .withColumn("hv", conv(substring(md5(concat(
          col("doc_id").cast("string"), lit(":"),
          col("tpos").cast("string"), lit(s":s$seed")).cast("binary")),
        1, 13), 16, 10).cast("long"))
      .filter(col("hv") % rateInv === 0)
      .select(col("doc_id"), col("n"), col("tpos").cast("long").as("s"),
        expr(s"least(CAST(tpos AS BIGINT) + (hv div $rateInv) % $maxSpan, " +
          s"CAST(n - 1 AS BIGINT))").as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val perDoc = spans
      .withColumn("ni",
        when(prevMax.isNull || col("s") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("ni"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_spans"),
        sum(col("me") - col("ms") + 1).as("n_masked"))
    enc.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("int").as("n_tokens"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        round(lit(1000000.0) * coalesce(col("n_masked"), lit(0L)) / col("n"), 0)
          .cast("long").as("mask_ppm"))
      .orderBy(col("doc_id"))
  }

  /** q215: span-corruption plan at rateInv=20, maxSpan=5 (≈15% expected
    * mask density). Full oracle through the shared encode chain plus
    * the identical hash-anchor and island arithmetic. */
  val q215SpanCorruption = GraftQuery(
    "q215_span_corruption",
    "LLM-pipeline denoising ext: seeded T5-style span-corruption plan, interval-merged mask accounting",
    (s, d) => spanCorruptionEnc(encodedDocs(s, d, 6),
      seed = 42L, rateInv = 20, maxSpan = 5),
    Some(s"""${bpeEncodeChain(6)},
      nt AS MATERIALIZED (
        SELECT doc_id, len(tid) AS n FROM enc WHERE len(tid) > 0),
      anchors AS (
        SELECT doc_id, n, tpos,
          ('0x' || substr(md5(doc_id || ':' || tpos || ':s42'), 1, 13))::BIGINT
            AS hv
        FROM (SELECT doc_id, n, unnest(range(0, n)) AS tpos FROM nt)),
      sp AS (
        SELECT doc_id, n, tpos AS s,
          least(tpos + (hv // 20) % 5, n - 1) AS e
        FROM anchors WHERE hv % 20 = 0),
      m AS (
        SELECT doc_id, s, e,
          CASE WHEN max(e) OVER pw IS NULL OR s > max(e) OVER pw + 1
            THEN 1 ELSE 0 END AS ni
        FROM sp
        WINDOW pw AS (PARTITION BY doc_id ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      isl AS (
        SELECT doc_id, s, e,
          sum(ni) OVER (PARTITION BY doc_id ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM m),
      pi AS (
        SELECT doc_id, island, min(s) AS ms, max(e) AS me
        FROM isl GROUP BY 1, 2),
      agg AS (
        SELECT doc_id, count(*) AS n_spans,
          CAST(sum(me - ms + 1) AS BIGINT) AS n_masked
        FROM pi GROUP BY 1)
      SELECT nt.doc_id, CAST(nt.n AS INTEGER) AS n_tokens,
        CAST(coalesce(a.n_spans, 0) AS INTEGER) AS n_spans,
        CAST(coalesce(a.n_masked, 0) AS BIGINT) AS n_masked,
        CAST(round(1000000.0 * coalesce(a.n_masked, 0) / nt.n, 0) AS BIGINT)
          AS mask_ppm
      FROM nt LEFT JOIN agg a USING (doc_id) ORDER BY nt.doc_id"""))

  /** Epoch-capped waterfilling mixture allocation — the data-constrained
    * scaling rule (Muennighoff et al. 2023, public pattern): each source
    * can supply at most maxEpochs × its token mass, so the q202
    * temperature shares cannot simply be scaled to the budget; capped
    * sources return their surplus, which re-raises the water level over
    * the uncapped rest, possibly capping more (a real cascade on this
    * corpus: 5 of 20 sources cap at the chosen parameters, two of them
    * only AFTER redistribution).
    *
    * Solved in CLOSED FORM, no driver loop and no iteration: sort
    * sources ascending by cap/weight (the order in which the rising
    * water level pins them); the capped set is always a prefix of that
    * order, and prefix k is the answer iff the first uncapped source
    * fits under its cap — a per-row integer cross-product test
    * `cap_p · W_rest ≥ R_rest · w_p` over running sums, so the whole
    * fixed point is one window pass + two scalar aggregates, exactly
    * replayable in integer arithmetic (the boundary on this corpus is
    * 15,913,480 < 15,917,772 — a float formulation could flip it).
    *
    * Scale shape: the only corpus-scale job is the per-source token
    * groupBy (linear, one exchange over the shared encode pass); all
    * windows and aggregates after it run on the catalog-sized source
    * relation (tens to hundreds of rows at 100 TB — the single-partition
    * window is over THAT relation, never the corpus). */
  /** Per-document real-token relation `(doc_id, source, n_tok)` under
    * the k-merge tokenizer — the shared corpus-scale input of the
    * waterfilling family (q216 allocation, q218 manifest). */
  private def docTokens(s: SparkSession, d: String, k: Int): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.select(col("doc_id"), col("source"))
      .join(encodedDocs(s, d, k)
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tok")),
        Seq("doc_id"))
  }

  def waterfillAllocation(s: SparkSession, d: String, budgetTokens: Long,
      maxEpochs: Int, k: Int): DataFrame = {
    require(budgetTokens >= 1 && maxEpochs >= 1)
    // materialize the catalog-sized per-source totals ONCE (r16, guide
    // §2.4): everything below — wsum, ranked, firstOk, capped, scal and
    // the final select — re-derives from perSrc through four broadcast
    // scalar subtrees, and an unmaterialized perSrc re-ran the
    // corpus-scale docTokens join + groupBy once per subtree (measured:
    // q216 spread [1.07, 5.34, 16.4] s at sf0.1; the relation itself is
    // tens of rows)
    val perSrc = docTokens(s, d, k)
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("tok_total"))
      .withColumn("w", floor(sqrt(col("tok_total"))).cast("long"))
      .withColumn("cap_tok", lit(maxEpochs.toLong) * col("tok_total"))
      .localCheckpoint(true)
    val wsum = perSrc.agg(sum(col("w")).as("wsum"))
    // ascending water-pinning order; catalog-sized relation, so the
    // unpartitioned window is deliberate and bounded
    val ord = Window.orderBy(col("cap_tok").cast("double") / col("w"),
      col("source"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perSrc.crossJoin(broadcast(wsum))
      .withColumn("p", row_number().over(ord))
      .withColumn("cumcap", sum(col("cap_tok")).over(run))
      .withColumn("cumw", sum(col("w")).over(run))
      .withColumn("ok",
        col("cap_tok") * (col("wsum") - (col("cumw") - col("w"))) >=
          (lit(budgetTokens) - (col("cumcap") - col("cap_tok"))) * col("w"))
    val firstOk = ranked.agg(
      coalesce(min(when(col("ok"), col("p"))), lit(Long.MaxValue))
        .as("first_ok"))
    val capped = ranked.crossJoin(broadcast(firstOk))
      .withColumn("capped", col("p") < col("first_ok"))
    val scal = capped.agg(
      coalesce(sum(when(col("capped"), col("cap_tok"))), lit(0L)).as("capsum"),
      coalesce(sum(when(col("capped"), col("w"))), lit(0L)).as("wcap"))
    capped.crossJoin(broadcast(scal))
      .withColumn("alloc_tok", when(col("capped"), col("cap_tok"))
        .otherwise(expr(s"(($budgetTokens - capsum) * w) div (wsum - wcap)")))
      .withColumn("epochs_ppm", expr("(alloc_tok * 1000000) div tok_total"))
      .select(col("source"), col("tok_total"), col("w"), col("cap_tok"),
        col("capped"), col("alloc_tok"), col("epochs_ppm"))
      .orderBy(col("source"))
  }

  /** Shared oracle chain of the waterfilling family, ending in `fin`
    * (source, tok_total, w, cap_tok, capped, alloc_tok) — the SQL
    * replay of [[waterfillAllocation]] appended to the encode chain
    * (the pageRankScaledSql convention: one template, Spark loop and
    * SQL chain cannot drift). */
  private def waterfillOracleChain(budget: Long, maxEpochs: Int,
      k: Int): String =
    s"""${bpeEncodeChain(k)},
      st AS MATERIALIZED (
        SELECT d.source, CAST(sum(len(e.tid)) AS BIGINT) AS tok_total
        FROM documents d JOIN enc e USING (doc_id) GROUP BY 1),
      b1 AS (
        SELECT source, tok_total,
          CAST(floor(sqrt(tok_total::DOUBLE)) AS BIGINT) AS w,
          CAST($maxEpochs * tok_total AS BIGINT) AS cap_tok
        FROM st),
      ws AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM b1),
      rk AS (
        SELECT b1.*, wsum,
          row_number() OVER ord AS p,
          sum(cap_tok) OVER (ord ROWS UNBOUNDED PRECEDING) AS cumcap,
          sum(w) OVER (ord ROWS UNBOUNDED PRECEDING) AS cumw
        FROM b1 CROSS JOIN ws
        WINDOW ord AS (ORDER BY CAST(cap_tok AS DOUBLE) / w, source)),
      okt AS (
        SELECT *,
          (cap_tok * (wsum - (cumw - w)) >= ($budget - (cumcap - cap_tok)) * w)
            AS ok
        FROM rk),
      fo AS (
        SELECT coalesce(min(CASE WHEN ok THEN p END), 9223372036854775807)
          AS first_ok
        FROM okt),
      cp AS (
        SELECT okt.*, (p < first_ok) AS capped FROM okt CROSS JOIN fo),
      sc AS (
        SELECT coalesce(sum(CASE WHEN capped THEN cap_tok END), 0) AS capsum,
          coalesce(sum(CASE WHEN capped THEN w END), 0) AS wcap
        FROM cp),
      fin AS (
        SELECT source, tok_total, w, cap_tok, capped,
          CAST(CASE WHEN capped THEN cap_tok
            ELSE (($budget - capsum) * w) // (wsum - wcap) END AS BIGINT)
            AS alloc_tok
        FROM cp CROSS JOIN sc)"""

  /** q216: waterfilling at budget 250k tokens, 2-epoch cap, over the
    * k=6 tokenizer's real token mass. Full oracle: the same sorted
    * prefix test and integer allocation replayed window-for-window. */
  val q216Waterfill = GraftQuery(
    "q216_waterfill_alloc",
    "LLM-pipeline mixture ext: epoch-capped waterfilling token allocation, closed-form capped-prefix fixed point",
    (s, d) => waterfillAllocation(s, d, budgetTokens = 250000L,
      maxEpochs = 2, k = 6),
    Some(s"""${waterfillOracleChain(250000L, 2, 6)}
      SELECT source, tok_total, w, cap_tok, capped, alloc_tok,
        CAST((alloc_tok * 1000000) // tok_total AS BIGINT) AS epochs_ppm
      FROM fin ORDER BY source"""))

  /** Training-epoch manifest — the q216 allocation MATERIALIZED: the
    * step between "how many tokens per source" and actual training
    * shards. Each source contributes `alloc_tok div tok_total` full
    * passes over all of its documents (epochs 0..full-1) plus one
    * partial epoch holding a seeded prefix of the remainder
    * `alloc_tok % tok_total`: documents in deterministic seeded-hash
    * order, a document included iff its STARTING token offset falls
    * under the remainder (the q48 packing rule, so the partial epoch
    * overshoots by at most one document). Fractional epochs are how
    * data-constrained mixtures are actually trained — uniform document
    * dropout over the source, not a truncation of any storage order.
    *
    * Scale shape: the allocation side is catalog-sized (q216); the
    * corpus side needs a per-source GLOBAL token prefix-sum, computed
    * two-level so no window ever sees a whole source on one reducer —
    * per-(source, shard) local cumsums in (ord, doc_id) order (the q48
    * sharded-window discipline) plus a catalog-sized (source × shard)
    * offset relation broadcast back; global order is (shard, ord,
    * doc_id), exactly what the oracle's single window replays. Full
    * epochs explode from the catalog-sized allocation — no join ever
    * exceeds corpus-linear. */
  def epochManifest(s: SparkSession, d: String, budgetTokens: Long,
      maxEpochs: Int, k: Int, seed: Long): DataFrame = {
    val shards = graft.GraftConf.packShards(s)
    val alloc = waterfillAllocation(s, d, budgetTokens, maxEpochs, k)
      .filter(col("tok_total") > 0)
      .select(col("source"),
        expr("alloc_tok div tok_total").as("full_ep"),
        expr("alloc_tok % tok_total").as("rem_tok"))
    // materialize the doc-level keyed relation once (r16, guide §2.4):
    // both the shard-offset aggregate (a broadcast subtree) and the
    // local-cumsum window re-scan it, and each re-scan replayed the
    // docTokens join
    val keyed = docTokens(s, d, k)
      .withColumn("ord", conv(substring(md5(
          concat(lit(s"$seed:"), col("doc_id").cast("string")).cast("binary")),
        1, 15), 16, 10).cast("long"))
      .withColumn("shard", col("ord") % shards)
      .localCheckpoint(true)
    val wloc = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(col("source"), col("shard"))
      .agg(sum(col("n_tok")).as("sh_tot"))
      .withColumn("off", coalesce(sum(col("sh_tot")).over(wOff), lit(0L)))
      .select(col("source"), col("shard"), col("off"))
    // materialized: the full-epoch explode and the partial-epoch filter
    // below are two branches over this same relation (r16, guide §2.4)
    val cum = keyed
      .withColumn("cum_loc", sum(col("n_tok")).over(wloc))
      .join(broadcast(offs), Seq("source", "shard"))
      .withColumn("cum", col("off") + col("cum_loc"))
      .join(broadcast(alloc), Seq("source"))
      .localCheckpoint(true)
    val fullRows = cum.filter(col("full_ep") > 0)
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(0, full_ep - 1)")).as("epoch"), col("n_tok"))
    val partRows = cum.filter(col("cum") - col("n_tok") < col("rem_tok"))
      .select(col("doc_id"), col("source"), col("full_ep").as("epoch"),
        col("n_tok"))
    fullRows.unionByName(partRows)
      .select(col("doc_id"), col("source"),
        col("epoch").cast("int").as("epoch"), col("n_tok"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** q218: the epoch manifest at the q216 operating point (budget 250k,
    * 2-epoch cap, k=6, seed 42). Full oracle: the allocation chain plus
    * the seeded prefix replayed as ONE per-source window ordered
    * (shard, ord, doc_id) — the same global order the two-level Spark
    * cumsum composes. */
  val q218EpochManifest = GraftQuery(
    "q218_epoch_manifest",
    "LLM-pipeline mixture ext: materialized training-epoch manifest (full passes + seeded partial epoch) from the waterfilling allocation",
    (s, d) => epochManifest(s, d, budgetTokens = 250000L, maxEpochs = 2,
      k = 6, seed = 42L),
    Some(s"""${waterfillOracleChain(250000L, 2, 6)},
      al AS (
        SELECT source, CAST(alloc_tok // tok_total AS BIGINT) AS full_ep,
          CAST(alloc_tok % tok_total AS BIGINT) AS rem_tok
        FROM fin WHERE tok_total > 0),
      dn AS (
        SELECT d.doc_id, d.source,
          CAST(coalesce(len(e.tid), 0) AS BIGINT) AS n_tok,
          ('0x' || substr(md5('42:' || d.doc_id::VARCHAR), 1, 15))::BIGINT
            AS ord
        FROM documents d LEFT JOIN enc e USING (doc_id)),
      cg AS (
        SELECT *, sum(n_tok) OVER (PARTITION BY source
          ORDER BY ord % 8, ord, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM dn),
      ep AS (
        SELECT doc_id, source,
          CAST(unnest(range(0, full_ep)) AS INTEGER) AS epoch, n_tok
        FROM cg JOIN al USING (source) WHERE full_ep > 0
        UNION ALL
        SELECT doc_id, source, CAST(full_ep AS INTEGER) AS epoch, n_tok
        FROM cg JOIN al USING (source) WHERE cum - n_tok < rem_tok)
      SELECT doc_id, source, epoch, n_tok FROM ep
      ORDER BY doc_id, epoch"""))

  /** q200: decode(encode(corpus)) == the whitespace-normalized corpus —
    * the tokenizer round-trip as a REGISTERED query, not just a spec
    * gate. The oracle never touches the merge chain: it is the
    * normalized text directly, so a hash match proves the whole
    * encode→decode composition lossless on every document. */
  val q200BpeRoundTrip = GraftQuery(
    "q200_bpe_roundtrip",
    "LLM-pipeline tokenizer ROUND-TRIP: decode(encode(corpus)) == normalized corpus, oracle-exact",
    (s, d) => {
      val model = bpeModel(s, d, 6)
      bpeDecodeDocs(encodedDocs(s, d, 6), model)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        trim(array_to_string(list_filter(
          string_split_regex(lower(trim(text)), '\s+'), w -> w <> ''), ' ')) AS text
      FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------------
  // q182: repetition-based quality filter (the Gopher rules)
  // ---------------------------------------------------------------------

  /** Per-document repetition profile [Rae et al. 2021 (Gopher) §A1.1:
    * "repetitious documents" are filtered by the fraction of characters
    * inside repeated n-grams; reimplemented integer-exactly here]:
    *
    *   - `top2_frac`  — characters covered by ALL occurrences of the
    *     single most frequent word-2-gram, over total normalized chars
    *     (ties broken to the lexicographically smallest gram, so the
    *     argmax is deterministic cross-engine);
    *   - `dup5_frac`  — characters covered by every occurrence of every
    *     word-5-gram that appears ≥ 2 times, capped at 1.0 (occurrences
    *     may overlap — the standard public-reimplementation convention,
    *     e.g. Dolma/DataTrove count covered chars multiplicatively);
    *   - `keep`       — both fractions under their thresholds. Boilerplate,
    *     keyword-stuffed spam and template pages fail long before fluent
    *     prose does. Complements q41: that gate carries the OCCURRENCE
    *     top-2-gram fraction and dup-line ratio; this one is the
    *     character-coverage form Gopher actually specifies, plus the
    *     duplicated-n-gram family q41 lacks (a long doc with one
    *     dominant bigram and a doc tiled from repeated phrases score
    *     very differently under char coverage).
    *
    * All inputs are exact integers (occurrence counts × gram char
    * lengths over the space-joined token length), so the one double
    * division per column is bit-identical cross-engine — the q141/q172
    * rational-arithmetic convention.
    *
    * Plan shape: tokenize → explode n-grams → per-(doc, gram) count —
    * shuffle linear in corpus tokens, keyed by doc_id like every
    * tokenize path — then a doc-partitioned window for the argmax and a
    * per-doc sum; no global aggregate anywhere, so the operator scales
    * with partitions. */
  def repetitionProfile(df: DataFrame, top2Max: Double, dup5Max: Double): DataFrame = {
    val base = df
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .withColumn("n_chars", length(concat_ws(" ", col("tk"))))
      // an empty/whitespace-only doc has n_chars = 0: Spark's IEEE /0
      // yields NaN while DuckDB differs — exclude the degenerate docs in
      // BOTH engines so the division is well-defined by construction
      // (the q106/q186 empty-doc convention)
      .filter(col("n_chars") > 0)
      .localCheckpoint(true) // three consumers: base, 2-gram, 5-gram legs
    def grams(n: Int): DataFrame =
      base.filter(size(col("tk")) >= n).select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(tk)-$n), i -> concat_ws(' ', slice(tk, i+1, $n)))"))
          .as("gram"))
    val top2 = {
      val c2 = grams(2).groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("cnt").desc, col("gram"))
      c2.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), (col("cnt") * length(col("gram"))).as("rep_chars"))
    }
    val dup5 = grams(5).groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * length(col("gram"))).as("dup_chars"))
    base.join(top2, Seq("doc_id"), "left").join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("rep_chars"), lit(0L)).cast("double") / col("n_chars"))
          .as("t2"),
        least(lit(1.0),
          coalesce(col("dup_chars"), lit(0L)).cast("double") / col("n_chars"))
          .as("d5"))
      .select(col("doc_id"),
        round(col("t2"), 6).as("top2_frac"),
        round(col("d5"), 6).as("dup5_frac"),
        (col("t2") <= top2Max && col("d5") <= dup5Max).as("keep"))
      .orderBy(col("doc_id"))
  }

  val q182RepetitionFilter = GraftQuery(
    "q182_repetition_filter",
    "LLM-pipeline quality gate: Gopher repetition rules (top-2-gram / dup-5-gram char fractions)",
    (s, d) => repetitionProfile(Tables.documents(s, d),
      top2Max = 0.20, dup5Max = 0.15),
    Some("""WITH tk AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents),
      base AS (
        SELECT doc_id, length(array_to_string(toks, ' ')) AS n_chars, toks
        FROM tk
        WHERE length(array_to_string(toks, ' ')) > 0),
      g2 AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i+1])) AS gram
        FROM base WHERE len(toks) >= 2),
      c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
      t2 AS (
        SELECT doc_id, cnt * length(gram) AS rep_chars,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY cnt DESC, gram) AS rn
        FROM c2),
      top2 AS (SELECT doc_id, rep_chars FROM t2 WHERE rn = 1),
      g5 AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(toks) - 3),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
              || toks[i+3] || ' ' || toks[i+4])) AS gram
        FROM base WHERE len(toks) >= 5),
      c5 AS (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY 1, 2),
      d5 AS (
        SELECT doc_id, sum(cnt * length(gram)) AS dup_chars
        FROM c5 WHERE cnt >= 2 GROUP BY 1),
      f AS (
        SELECT b.doc_id,
          coalesce(t.rep_chars, 0)::DOUBLE / b.n_chars AS t2,
          least(1.0, coalesce(d.dup_chars, 0)::DOUBLE / b.n_chars) AS d5
        FROM base b
        LEFT JOIN top2 t USING (doc_id)
        LEFT JOIN d5 d USING (doc_id))
      SELECT doc_id, round(t2, 6) AS top2_frac, round(d5, 6) AS dup5_frac,
        (t2 <= 0.20 AND d5 <= 0.15) AS keep
      FROM f ORDER BY doc_id"""))

  /** q232: Unicode NFC canonical composition — the normalization step a
    * multilingual pipeline runs BEFORE tokenization/hashing/dedup
    * ("e"+COMBINING ACUTE vs precomposed "é" are the same text but
    * different bytes, so every md5-keyed operator upstream treats them
    * as distinct documents). The engine's native codegen
    * [[graft.functions.NfcNormalize]] (Spark ships no normalizer; the
    * usual workaround is a Python UDF) vs DuckDB's nfc_normalize as the
    * oracle. The test corpus is ASCII, so each doc's text is prefixed
    * in-query with a DECOMPOSED "é" (e + U+0301) and suffixed with the
    * precomposed form — len_raw/len_norm pin that composition actually
    * happened (2 chars → 1), and the md5 of the normalized text is the
    * cross-engine equality: after NFC both spellings hash identically. */
  val q232NfcNormalize = GraftQuery(
    "q232_nfc_normalize",
    "F ext: Unicode NFC normalization (native codegen expression)",
    (s, d) => {
      val raw = concat(lit("e\u0301 "), substring(col("text"), 1, 24),
        lit(" \u00e9"))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          length(col("raw")).as("len_raw"),
          length(graft.functions.SketchFunctions.nfcNormalize(col("raw")))
            .as("len_norm"),
          md5(graft.functions.SketchFunctions.nfcNormalize(col("raw"))
            .cast("binary")).as("norm_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH r AS (
        SELECT doc_id,
          'e' || chr(769) || ' ' || substr(text, 1, 24) || ' ' || chr(233) AS raw
        FROM documents)
      SELECT doc_id, length(raw) AS len_raw,
        length(nfc_normalize(raw)) AS len_norm,
        md5(nfc_normalize(raw)) AS norm_md5
      FROM r ORDER BY doc_id"""))

  /** q233: NFKC(_casefold) compatibility composition — the normalizer
    * real multilingual pipelines run BEFORE tokenization (VERDICT r14
    * Missing #4: NFC stops at canonical equivalence; ligatures,
    * full-width forms, circled digits and unit glyphs survive it and
    * defeat every md5-keyed dedup upstream). Native codegen kernel
    * [[graft.functions.NfkcNormalize]], SQL `graft_nfkc`. No oracle:
    * DuckDB ships only nfc_normalize — the driver records a rows-only
    * check and ExtOpsSpec gates the kernel on fixture pairs (ﬁ→fi,
    * Ａ→A, ①→1, ㎞→km, İ casefold) plus idempotence and the
    * NFC⊂NFKC composition property. */
  val q233NfkcNormalize = GraftQuery(
    "q233_nfkc_normalize",
    "F ext: Unicode NFKC compatibility composition + casefold (native codegen expression)",
    (s, d) => {
      val raw = concat(lit("ﬁ Ａ ① ㎞ "),
        substring(col("text"), 1, 24), lit(" İ"))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          length(col("raw")).as("len_raw"),
          length(graft.functions.SketchFunctions.nfkcNormalize(col("raw")))
            .as("len_nfkc"),
          md5(graft.functions.SketchFunctions.nfkcNormalize(col("raw"))
            .cast("binary")).as("nfkc_md5"),
          md5(graft.functions.SketchFunctions
            .nfkcNormalize(col("raw"), casefold = true)
            .cast("binary")).as("nfkc_cf_md5"))
        .orderBy(col("doc_id"))
    },
    None)

  def queries: Seq[GraftQuery] = Seq(
    q232NfcNormalize, q233NfkcNormalize,
    q151CountMinSketch, q154StreamedCms, q155StreamedSample, q159StreamedIndex,
    q167HllRegisters, q168StreamedHll, q172ClassTfidf,
    q173WindowedHll, q174StreamedWindowedHll, q175SplitOverlap,
    q180StreamedClassTfidf,
    q76HashSplit, q77QualityBins, q78UnigramScore,
    q40LangId, q41QualityScore, q42TokenCount, q43Fingerprint,
    q44PreprocessPipeline, q45TopTerms, q46CorpusFilter, q47StratifiedSample,
    q48SequencePacking, q49CorpusMixture, q93TfidfKeywords,
    q101PiiRedact, q102DomainStats, q104EpochUpsample, q106DocChunks,
    q111TokenBudget, q119DriftReport, q120DictEncode, q121Winsorize,
    q132HeavyHitters, q134StreamedHeavyHitters,
    q135InvertedIndex, q136BooleanRetrieval,
    q139GroupOutliers, q140Cooccurrence, q141Bm25, q142Triangles,
    q147PrioritySample, q148RetrievalEval, q182RepetitionFilter,
    q184MixtureSample, q185StreamedMixture, q186BpeMerges, q187BpeSubwords,
    q192BpeMergesK64, q196BpeEncode, q197BpePacking, q200BpeRoundTrip,
    q201TrainingSequences, q202TokenMixture, q203TokenDistribution,
    q204StreamedTokenCounts, q205TokenizerFertility, q212TokenChunks,
    q214LengthBatching, q215SpanCorruption, q216Waterfill,
    q218EpochManifest)
}
