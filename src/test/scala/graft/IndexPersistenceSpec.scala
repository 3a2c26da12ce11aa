package graft

import java.nio.file.Files

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** S6 parity: with spark.graft.index.dir set, fitted ANN models
  * round-trip through MLWritable save/load (the reference's
  * faiss.write_index/read_index, app/vector_search.py:207-294) — a new
  * JVM (simulated here by clearing the in-memory model cache) must LOAD
  * the artifact, not refit. Load-not-refit is proven by tampering: we
  * overwrite the saved artifact with a model fit under different
  * hyper-parameters; if the next call refit from data it would come back
  * with the configured parameters, so observing the tampered parameters
  * proves the artifact was read. */
class IndexPersistenceSpec extends SparkSpec {

  private def withIndexDir[A](body: String => A): A = {
    val dir = Files.createTempDirectory("graft_index").toString
    spark.conf.set("spark.graft.index.dir", dir)
    Ann.clearCaches()
    try body(dir)
    finally {
      spark.conf.unset("spark.graft.index.dir")
      Ann.clearCaches()
    }
  }

  test("IVF KMeans model persists and is loaded, not refit") {
    withIndexDir { dir =>
      val cells = GraftConf.ivfCells(spark,
        plans.TableStats.embeddings(spark, sfTiny).rows)
      val (_, centroids) = Ann.ivfIndex(spark, sfTiny)
      assert(centroids.count() == cells)
      val path = Ann.indexArtifactPath(spark, "ivf_kmeans", sfTiny,
        s"cells=$cells,it=${GraftConf.ivfMaxIter(spark)},init=${GraftConf.ivfInitMode(spark)}").get
      assert(new java.io.File(path, "metadata").exists(), s"artifact missing at $path")

      // tamper: a 3-cell model fit on a 6-point toy frame, saved over the slot
      val toy = spark.createDataFrame(
        (1 to 6).map(i => (i.toLong, Array.fill(64)(i.toDouble)))).toDF("id", "arr")
        .select(array_to_vector(col("arr")).as("fvec"))
      new KMeans().setK(3).setSeed(1L).setFeaturesCol("fvec")
        .setPredictionCol("centroid_id").fit(toy)
        .write.overwrite().save(path)

      Ann.clearCaches() // "new JVM"
      val (assigned2, centroids2) = Ann.ivfIndex(spark, sfTiny)
      assert(centroids2.count() == 3,
        "expected the tampered 3-cell artifact to be loaded — a refit would have produced the configured cell count")
      assert(assigned2.select(col("centroid_id")).distinct().count() <= 3)
    }
  }

  test("BRP-LSH model persists and is loaded, not refit") {
    withIndexDir { dir =>
      val (bl, nt) = (GraftConf.lshBucketLength(spark), GraftConf.lshNumTables(spark))
      val (model, _) = Ann.lshIndex(spark, sfTiny)
      assert(model.getNumHashTables == nt)
      val path = Ann.indexArtifactPath(spark, "brp_lsh", sfTiny, s"bl=$bl,nt=$nt").get
      assert(new java.io.File(path, "metadata").exists(), s"artifact missing at $path")

      // tamper: a 2-table model saved over the nt-table slot
      val toy = spark.createDataFrame(
        (1 to 4).map(i => (i.toLong, Array.fill(64)(i.toDouble)))).toDF("id", "arr")
        .select(array_to_vector(col("arr")).as("nvec"))
      new BucketedRandomProjectionLSH().setBucketLength(bl).setNumHashTables(2)
        .setSeed(1L).setInputCol("nvec").setOutputCol("hashes").fit(toy)
        .write.overwrite().save(path)

      Ann.clearCaches() // "new JVM"
      val (model2, _) = Ann.lshIndex(spark, sfTiny)
      assert(model2.getNumHashTables == 2,
        "expected the tampered 2-table artifact to be loaded — a refit would have produced the configured table count")
    }
  }

  test("PQ codebook persists and is loaded, not refit") {
    withIndexDir { dir =>
      val idx = Ann.pqIndex(spark, sfTiny)
      val path = Ann.indexArtifactPath(spark, "pq_codebook", sfTiny,
        s"m=${idx.m},k=${idx.k}").get
      assert(new java.io.File(path, "_SUCCESS").exists(), s"artifact missing at $path")

      // tamper: an all-zero codebook saved over the slot
      spark.createDataFrame(
          Seq((idx.m, idx.k, idx.sub, Seq.fill(idx.codebook.length)(0.0))))
        .toDF("m", "k", "sub", "cb")
        .coalesce(1).write.mode("overwrite").parquet(path)

      Ann.clearCaches() // "new JVM"
      val idx2 = Ann.pqIndex(spark, sfTiny)
      assert(idx2.codebook.forall(_ == 0.0),
        "expected the tampered zero codebook to be loaded — a refit would have produced fitted centroids")
    }
  }

  test("drift repair persists an ivf_rebalanced artifact at a DETERMINISTIC path (loadable, row-exact)") {
    withIndexDir { dir =>
      // run the registered drift→repair loop; rebalanceCells writes the
      // repaired (vec_id, centroid_id, n_cells) assignment under the
      // ivf_rebalanced kind at a path computable BEFORE the repair runs
      // (VERDICT r11 #2 — a later session must be able to resolve it
      // without re-repairing)
      val row = Registry.byName("q224_ivf_rebalance").run(spark, sfTiny).head()
      assert(!row.getAs[Boolean]("post_exceeds"))
      val path = Ann.indexArtifactPath(spark, "ivf_rebalanced", sfTiny,
        Ann.driftArtifactParams(spark, sfTiny)).get
      assert(new java.io.File(path, "_SUCCESS").exists(),
        s"artifact missing at the deterministic path $path")
      val back = spark.read.parquet(path)
      assert(back.columns.toSet == Set("vec_id", "centroid_id", "n_cells"))
      // row-exact: every drifted vector exactly once (3n total)
      assert(back.count() == row.getAs[Long]("n_total"))
      assert(back.select("vec_id").distinct().count() == row.getAs[Long]("n_total"))

      // load-not-rebuild for the REPAIR itself (round 12): a "new JVM"
      // re-running q224 must LOAD the persisted repair — observable as
      // the two-point skew trajectory (pre, post), where a re-run split
      // loop would have recorded its intermediate rounds too
      val coldSkews = Ann.driftRepair(spark, sfTiny).skews
      Ann.clearCaches()
      val warm = Ann.driftRepair(spark, sfTiny)
      assert(warm.skews.length == 2,
        s"fresh-session driftRepair re-ran the split loop (trajectory ${warm.skews}) instead of loading the artifact")
      assert(warm.skews.head == coldSkews.head && warm.skews.last == coldSkews.last,
        "loaded repair's skew endpoints diverge from the computed repair's")
      val row2 = Registry.byName("q224_ivf_rebalance").run(spark, sfTiny).head()
      assert(row2.getAs[Boolean]("pre_exceeds") && !row2.getAs[Boolean]("post_exceeds"),
        "q224 through the loaded repair lost its monitor-row facts")
    }
  }

  test("q228 serves through the LOADED ivf_rebalanced artifact: tampered cell count comes back, deleted artifact rebuilds") {
    withIndexDir { dir =>
      // first pass in a fresh store: q228 repairs once, persists, then
      // takes the load path — and its serve must match the in-memory one
      val row = Registry.byName("q228_rebalanced_serve_loaded")
        .run(spark, sfTiny).head()
      assert(row.getAs[Boolean]("loaded_artifact"), "q228 did not round-trip the artifact")
      assert(row.getAs[Boolean]("full_k"))
      assert(row.getAs[Boolean]("matches_in_memory"),
        "serve through the loaded artifact diverged from the in-memory repair's serve")

      val path = Ann.indexArtifactPath(spark, "ivf_rebalanced", sfTiny,
        Ann.driftArtifactParams(spark, sfTiny)).get

      // tamper: a fake assignment with an impossible cell count saved
      // over the slot — a loader that actually READS the artifact sees
      // the fake count; a re-repair would have produced the real one
      val n = plans.TableStats.embeddings(spark, sfTiny).rows
      spark.range(3 * n)
        .select(col("id").as("vec_id"), lit(0).as("centroid_id"),
          lit(9999).as("n_cells"))
        .coalesce(1).write.mode("overwrite").parquet(path)
      Ann.clearCaches() // "new JVM"
      val tampered = Ann.loadRebalanced(spark, sfTiny)
      assert(tampered.isDefined && tampered.get._2 == 9999,
        "expected the tampered artifact to be LOADED — a rebuild would have produced the real cell count")

      // delete: the loader reports absence and the caller repairs again
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      assert(Ann.loadRebalanced(spark, sfTiny).isEmpty,
        "deleted artifact still resolved")
      Ann.clearCaches()
      val row2 = Registry.byName("q228_rebalanced_serve_loaded")
        .run(spark, sfTiny).head()
      assert(row2.getAs[Boolean]("loaded_artifact") &&
        row2.getAs[Boolean]("matches_in_memory"),
        "q228 did not rebuild+persist after the artifact was deleted")
    }
  }

  test("impact-ordered capped postings persist and are loaded, not re-sorted") {
    withIndexDir { dir =>
      def scored() = operators.Hybrid.lexScoredCandidates(spark, sfTiny,
        queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
      spark.conf.set("spark.graft.hybrid.maxPostingsPerTerm", "5")
      spark.conf.set("spark.graft.hybrid.capRerank", "false")
      try {
        val base = scored().collect().map(_.toSeq).toSet
        val path = operators.ModelStore.artifactPath(spark, "impact_postings",
          sfTiny, "cap=5,df=0.85,k1=1.2,b=0.75").get
        assert(new java.io.File(path, "_SUCCESS").exists(),
          s"capped postings artifact missing at $path")
        // tamper: a single fake posting saved over the slot — a reader
        // that actually LOADS the artifact collapses to candidates of
        // that one posting; a re-sort would reproduce the full relation
        spark.createDataFrame(Seq(("zzz_never_a_token", 0L, 1L)))
          .toDF("term", "did", "c_ppm")
          .coalesce(1).write.mode("overwrite").parquet(path)
        val tampered = scored().collect()
        assert(tampered.isEmpty,
          s"expected the tampered one-posting artifact to be LOADED (no real term matches it); got ${tampered.length} rows — the relation was re-sorted from data")
        // delete: recompute + re-persist, back to the real relation
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        assert(scored().collect().map(_.toSeq).toSet == base,
          "deleted artifact did not rebuild to the original relation")
        assert(new java.io.File(path, "_SUCCESS").exists(),
          "rebuild did not re-persist the artifact")
      } finally {
        spark.conf.unset("spark.graft.hybrid.maxPostingsPerTerm")
        spark.conf.unset("spark.graft.hybrid.capRerank")
      }
    }
  }

  test("bm25 postings persist BUCKETED: rerank probes with no posting-side shuffle; a fresh catalog re-registers, never rewrites") {
    withIndexDir { dir =>
      def scored() = operators.Hybrid.lexScoredCandidates(spark, sfTiny,
        queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
      spark.conf.set("spark.graft.hybrid.maxPostingsPerTerm", "5")
      spark.conf.set("spark.graft.hybrid.capRerank", "true")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // disable broadcast so the planner must pick the bucketed
        // sort-merge path (at real scale the posting side never broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val base = scored().collect().map(_.toSeq).toSet
        val p = operators.ModelStore.artifactPath(spark, "bm25_postings",
          sfTiny, "df=0.85,k1=1.2,b=0.75,bk=32").get
        assert(new java.io.File(p, "_SUCCESS").exists(),
          s"bucketed posting artifact missing at $p")
        // plan audit (VERDICT r12 Missing #2): the rescore join must read
        // the posting relation through its buckets — no Exchange may sit
        // above the posting scan
        val df = scored()
        df.collect() // finalize AQE before inspecting
        def walk(pl: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] =
          (pl +: pl.children.flatMap(walk)) ++ (pl match {
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan)
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan)
            case _ => Seq.empty
          })
        val nodes = walk(df.queryExecution.executedPlan)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"),
          s"posting scan not bucketed:\n$plan")
        // match the POSTING table's scan specifically: since round 14
        // tf/lens are bucketed catalog tables too, and their term-keyed
        // aggregation shuffles (dfKept, qterms — term-keyed by nature,
        // shuffled before and after persistence alike) would false-match
        // a bare "Bucketed: true" subtree probe
        val postingShuffles = nodes.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if e.toString.contains("graft_postings_") => e
        }
        assert(postingShuffles.isEmpty,
          s"rerank still shuffles the posting relation:\n$plan")
        // "new JVM": drop the catalog entry, keep the files — the next
        // run must re-REGISTER the existing bucketed files (one DDL),
        // never rewrite them
        val table = "graft_postings_" + java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(p).toLong & 0xffffffffL)
        assert(spark.catalog.tableExists(table), s"catalog table $table missing")
        val mtimes = new java.io.File(p).listFiles()
          .map(f => f.getName -> f.lastModified).toMap
        spark.sql(s"DROP TABLE $table")
        assert(scored().collect().map(_.toSeq).toSet == base,
          "re-registered posting table changed the rerank relation")
        val after = new java.io.File(p).listFiles()
          .map(f => f.getName -> f.lastModified).toMap
        assert(after == mtimes,
          "posting files rewritten — expected a DDL re-registration of the existing bucketed files")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.unset("spark.graft.hybrid.maxPostingsPerTerm")
        spark.conf.unset("spark.graft.hybrid.capRerank")
      }
    }
  }

  test("tf/lens forward-index tables persist: a fresh catalog re-registers the bucketed files, never rewrites") {
    withIndexDir { dir =>
      def scored() = operators.Hybrid.lexScoredCandidates(spark, sfTiny,
        queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
      val base = scored().collect().map(_.toSeq).toSet
      assert(base.nonEmpty)
      val tfP = operators.ModelStore.artifactPath(spark, "bm25_tf",
        sfTiny, "tok=ws,bk=32").get
      val lensP = operators.ModelStore.artifactPath(spark, "bm25_lens",
        sfTiny, "tok=ws,bk=32").get
      for (p <- Seq(tfP, lensP)) {
        assert(new java.io.File(p, "_SUCCESS").exists(), s"artifact missing at $p")
        assert(new java.io.File(p, "_meta").exists(), s"_meta sidecar missing at $p")
      }
      def mtimes() = Seq(tfP, lensP).map(p =>
        new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getAbsolutePath -> f.lastModified).toMap)
      val before = mtimes()
      assert(before.forall(_.nonEmpty))
      // "new JVM": drop the catalog entries AND the in-memory tf cache;
      // the next run must re-REGISTER the existing doc_id-bucketed files
      // from their _meta sidecars (one DDL each) — this is the fresh-JVM
      // q210 cold path, which before round 14 re-ran the
      // tokenize→explode→aggregate chain (~15 s vs 3 s warm, VERDICT r13
      // Missing #1)
      for (p <- Seq(tfP, lensP)) {
        val prefix = if (p == tfP) "tf" else "lens"
        val t = s"graft_${prefix}_" + java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(p).toLong & 0xffffffffL)
        assert(spark.catalog.tableExists(t), s"catalog table $t missing")
        spark.sql(s"DROP TABLE $t")
      }
      Ann.clearCaches()
      assert(scored().collect().map(_.toSeq).toSet == base,
        "re-registered tf/lens tables changed the scored relation")
      assert(mtimes() == before,
        "tf/lens files rewritten — expected a DDL re-registration of the existing bucketed files")
    }
  }

  test("tokenized-corpus table persists: a fresh catalog re-registers the bucketed files, never re-encodes") {
    withIndexDir { dir =>
      // the q196/q212-q218 shared input (round 15, VERDICT r14 #2's
      // structural fix: the consumers re-ran the encode chain per
      // invocation — the recurring q214/q215 bench outliers)
      def enc() = operators.TextAnalysis.encodedDocs(spark, sfTiny, 6)
      val base = enc().collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet
      assert(base.nonEmpty)
      val p = operators.ModelStore.artifactPath(spark, "bpe_tokens",
        sfTiny, "k=6,bk=32").get
      assert(new java.io.File(p, "_SUCCESS").exists(), s"artifact missing at $p")
      assert(new java.io.File(p, "_meta").exists(), s"_meta sidecar missing at $p")
      def mtimes() = new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified).toMap
      val before = mtimes()
      assert(before.nonEmpty)
      val t = "graft_bpetok_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(p).toLong & 0xffffffffL)
      assert(spark.catalog.tableExists(t), s"catalog table $t missing")
      spark.sql(s"DROP TABLE $t")
      Ann.clearCaches()
      assert(enc().collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet == base,
        "re-registered tokenized-corpus table changed the relation")
      assert(mtimes() == before,
        "bpe_tokens files rewritten — expected a DDL re-registration of the existing bucketed files")
    }
  }

  test("LM bigram model persists: a fresh catalog re-registers the bucketed files, never re-derives") {
    withIndexDir { dir =>
      // the q206-q209 shared model state (round 16, VERDICT r15 Next
      // #1's structural fix: docSurprisal re-derived the bigram model
      // per invocation — the r15 driver bench's top oob rows)
      def scored() = operators.LanguageModel.docSurprisal(spark, sfTiny)
      val base = scored().collect().map(_.toSeq).toSet
      assert(base.nonEmpty)
      val predSql = (col("lang") === "en").toString
      val predTag = predSql.replaceAll("[^A-Za-z0-9]", "").take(24) + "_" +
        java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(predSql).toLong & 0xffffffffL)
      val p = operators.ModelStore.artifactPath(spark, "lm_bigrams",
        sfTiny, s"pred=$predTag,bk=8").get
      assert(new java.io.File(p, "_SUCCESS").exists(), s"artifact missing at $p")
      assert(new java.io.File(p, "_meta").exists(), s"_meta sidecar missing at $p")
      def mtimes() = new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified).toMap
      val before = mtimes()
      assert(before.nonEmpty)
      val t = "graft_lmbg_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(p).toLong & 0xffffffffL)
      assert(spark.catalog.tableExists(t), s"catalog table $t missing")
      spark.sql(s"DROP TABLE $t")
      Ann.clearCaches()
      assert(scored().collect().map(_.toSeq).toSet == base,
        "re-registered LM bigram table changed the scored relation")
      assert(mtimes() == before,
        "lm_bigrams files rewritten — expected a DDL re-registration of the existing bucketed files")
    }
  }

  test("posting catalog-name COLLISION at a different location: re-register the true artifact, never serve the collider") {
    withIndexDir { dir =>
      def scored() = operators.Hybrid.lexScoredCandidates(spark, sfTiny,
        queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8, k1 = 1.2, b = 0.75)
      // the reference answer, computed with the store OFF
      spark.conf.unset("spark.graft.index.dir")
      Ann.clearCaches()
      val base = scored().collect().map(_.toSeq).toSet
      assert(base.nonEmpty)
      spark.conf.set("spark.graft.index.dir", dir)
      Ann.clearCaches()
      // forge the 32-bit hash collision (ADVICE r13, low): a table
      // already registered under OUR name but rooted at a DIFFERENT
      // location, holding another dataset's postings — the old code
      // trusted tableExists alone and would have served it silently
      val p = operators.ModelStore.artifactPath(spark, "bm25_postings",
        sfTiny, "df=0.85,k1=1.2,b=0.75,bk=32").get
      val table = "graft_postings_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(p).toLong & 0xffffffffL)
      val fake = Files.createTempDirectory("graft_collide").toString + "/other"
      spark.createDataFrame(Seq(("zzz_collider_term", 0L, 123L)))
        .toDF("term", "did", "c_ppm").write.parquet(fake)
      spark.sql(s"CREATE TABLE $table (term STRING, did BIGINT, c_ppm BIGINT) " +
        s"USING parquet LOCATION '$fake'")
      assert(spark.catalog.tableExists(table))
      // the location check must drop the collider, build + register the
      // true artifact, and score identically to the store-off run
      assert(scored().collect().map(_.toSeq).toSet == base,
        "collision victim served the wrong posting relation")
      val loc = spark.sql(s"DESCRIBE FORMATTED $table").collect()
        .find(_.getString(0).trim == "Location").map(_.getString(1).trim)
      assert(loc.exists(l => new org.apache.hadoop.fs.Path(l).toUri.getPath ==
        new org.apache.hadoop.fs.Path(p).toUri.getPath),
        s"catalog entry still points away from the artifact: $loc vs $p")
    }
  }

  test("curation stage chain persists: a re-run resumes from committed stages, never rewrites") {
    withIndexDir { dir =>
      def run() = Registry.byName("q193_curation_pipeline").run(spark, sfTiny)
        .collect().map(_.toSeq).toSeq
      val first = run()
      val work = operators.ModelStore
        .artifactPath(spark, "curation_stages", sfTiny, "v1").get
      assert(new java.io.File(work, "s1_gate/_DONE").exists(),
        s"committed stage marker missing under $work")
      def mtimes(): Map[String, Long] = {
        val base = java.nio.file.Paths.get(work)
        val st = java.nio.file.Files.walk(base)
        try st.filter(java.nio.file.Files.isRegularFile(_)).toArray
          .map(_.asInstanceOf[java.nio.file.Path])
          .map(p => base.relativize(p).toString ->
            java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
        finally st.close()
      }
      val before = mtimes()
      assert(run() == first, "resumed chain changed the manifest")
      assert(mtimes() == before,
        "stage files rewritten — the re-run should resume from the _DONE markers")
    }
  }

  test("without index.dir, nothing is written and queries still pass (in-memory fit)") {
    Ann.clearCaches()
    assert(GraftConf.indexDir(spark).isEmpty)
    val (_, centroids) = Ann.ivfIndex(spark, sfTiny)
    assert(centroids.count() == GraftConf.ivfCells(spark,
      plans.TableStats.embeddings(spark, sfTiny).rows))
    Ann.clearCaches()
  }
}
