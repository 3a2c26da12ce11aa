package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming surface (north-star extension; the reference is
  * batch-only with file-existence stage caching, app/main.py:110-177).
  *
  * The transforms are written against a plain DataFrame so the SAME logic
  * runs as a batch plan (operators.Events.q70) and as an incremental
  * streaming plan — the Spark unification the engine's pipeline-runner
  * relies on. StreamingSpec asserts batch/stream result equivalence on the
  * test events.
  *
  * At scale: the windowed agg carries a 1-hour watermark so state for
  * closed windows is dropped; dedup state is similarly watermark-bounded.
  * availableNow processes a backlog in bounded batches and terminates —
  * the "catch up the last day of postings" mode.
  */
object StreamingJobs {

  /** Shared transform: tumbling 1-hour window count/sum per event type. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Events as an unbounded stream from a parquet directory (one file =
    * one micro-batch here; on a cluster this is the landing zone dir).
    * ts arrives as TIMESTAMP(NANOS) -> read as epoch-nano long, converted
    * exactly like the batch path (Tables.eventsWithTs). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)")) // exact int division (see Tables.eventsWithTs)
  }

  /** Run the windowed agg over the directory's backlog with a 1-hour
    * watermark, availableNow trigger, memory sink; returns the finished
    * query (results in table `sinkName`). */
  def runWindowedAgg(spark: SparkSession, dir: String, sinkName: String): StreamingQuery = {
    val q = windowedAgg(eventStream(spark, dir).withWatermark("ts", "1 hour"))
      .writeStream
      .queryName(sinkName)
      .format("memory")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming windowed approx-distinct: unique users per tumbling
    * event-time hour via approx_count_distinct — the production shape
    * for cardinality over streams, because HLL state is a fixed-size
    * mergeable sketch per window (KBs) where exact distinct keeps every
    * key in state (unbounded per window at 100 TB rates). This demo
    * runs complete mode into a memory table (the AvailableNow backlog
    * shape, where the watermark is inert); an unbounded production
    * deployment uses update/append mode so the watermark EVICTS closed
    * windows and total state is open-windows × one sketch. The q103
    * error gate covers the estimator itself; StreamingSpec bounds the
    * streamed estimate against the batch exact count per window. */
  def runStreamingWindowedDistinct(spark: SparkSession, dir: String,
      sinkName: String): StreamingQuery = {
    val q = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"))
      .select(col("window.start").as("w_start"), col("approx_users"))
      .writeStream
      .queryName(sinkName)
      .format("memory")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming near-dup detection: embeddings arriving as a stream are
    * hashed with the *already-fitted* LSH model and stream-static joined
    * against the hashed corpus on (hash-table, bucket) — the reference's
    * batch question ("which existing postings does this new posting
    * duplicate?", app/main.py:201-265) answered continuously per
    * micro-batch. Candidates are verified with the exact cosine kernel.
    *
    * At scale the static side is the bucketed index table (Scale
    * .writeBucketed on the bucket key) so each micro-batch joins without
    * re-shuffling the corpus; dedup state on the output would be
    * watermark-bounded in production (unbounded here: availableNow demo).
    */
  def runStreamingNearDup(spark: SparkSession, streamDir: String, corpusDir: String,
      threshold: Double, sinkName: String): StreamingQuery = {
    import graft.functions.VectorKernels.cosineFast
    def hashed(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Ann.lshHashBuckets(spark, corpusDir, df)
    // Salt the bucket key: an LSH mega-bucket would otherwise hand one
    // task the whole bucket's candidate generation every micro-batch
    // (same join-output skew as the batch path, Ann.nearDupFromBuckets).
    // The *static* side carries the salt (cid % salts) so it is never
    // replicated; the small per-trigger stream side explodes to all
    // salts — every (stream row, corpus row) bucket pair still meets
    // exactly once.
    val salts = graft.GraftConf.lshBucketSalts(spark)
    val corpus = hashed(spark.read.parquet(s"$corpusDir/embeddings.parquet"))
      .withColumnRenamed("vec_id", "cid").withColumnRenamed("embedding", "cvec")
      .withColumn("salt", (col("cid") % salts).cast("int"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(streamDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = hashed(stream)
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
      .join(corpus, Seq("ht", "bucket", "salt"))
      .filter(col("vec_id") =!= col("cid"))
      .select(col("vec_id"), col("cid"),
        round(cosineFast(col("embedding"), col("cvec")), 4).as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("vec_id", "cid")
      .writeStream
      .queryName(sinkName)
      .format("memory")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Continuous "index add" (M3 as a process): embeddings arriving as a
    * stream are assigned their IVF cell with the corpus's fitted
    * quantizer and appended to the assignment table — the reference's
    * batched index.add loop (app/main.py:85-91) as a standing ingestion
    * job. foreachBatch is the idiomatic shape: each micro-batch is a
    * plain DataFrame, so the BATCH assignment path (Ann.assignCells,
    * model.transform) runs unchanged and the sink write can be bucketed
    * by centroid_id at scale (the probe join then stays shuffle-free,
    * see BucketingSpec). */
  def runStreamingIndexAdd(spark: SparkSession, streamDir: String, corpusDir: String,
      outDir: String): StreamingQuery = {
    graft.operators.Ann.ivfIndexFull(spark, corpusDir) // fit/load once, up front
    val schema = spark.read.parquet(streamDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Ann.assignCells(spark, corpusDir, batch)
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming incremental TEXT dedup (the q69 batch operator as a
    * standing job): document files arriving as a stream are MinHash-
    * banded, candidate-joined against the accumulated reference
    * (initial corpus + every previously seen increment), exact-Jaccard
    * verified, and only the surviving documents are appended to
    * `outDir`. foreachBatch so the batch operator
    * (Dedup.incrementalDedupFrames) runs unchanged per micro-batch;
    * every processed document (survivor or not) joins the reference so
    * a later re-crawl of a dropped document is still recognized.
    *
    * When increments arrive in ascending doc_id order (the natural
    * crawl-id layout), the accumulated result equals the one-shot batch
    * q69 answer bit-for-bit (StreamingSpec proves it). At scale the
    * reference's band/shingle relations are materialized bucketed
    * tables appended per trigger, not re-derived from text. */
  def runStreamingTextDedup(spark: SparkSession, streamDir: String,
      corpusParquet: String, outDir: String, threshold: Double): StreamingQuery = {
    val seenDir = s"$outDir/_seen"
    val survivorsDir = s"$outDir/survivors"
    val corpus = spark.read.parquet(corpusParquet)
      .select(col("doc_id"), col("source"), col("text"))
    val schema = corpus.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.select(col("doc_id"), col("source"), col("text"))
        val seen =
          try spark.read.parquet(seenDir)
          catch { case _: Exception => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema) }
        val ref = corpus.unionByName(seen)
        graft.operators.Dedup.incrementalDedupFrames(ref, b, threshold)
          .write.mode("append").parquet(survivorsDir)
        b.write.mode("append").parquet(seenDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming incremental aggregate maintenance — the q107 state-merge
    * loop as a standing job: each micro-batch is aggregated alone
    * (Scale.aggState) and merged into the persistent state table
    * (Scale.mergeAggStates), so refresh cost per trigger scales with the
    * batch, never with history. The state table is overwritten per
    * trigger (it is one row per key — KBs); at 100 TB key cardinality,
    * write it partitioned/bucketed and MERGE instead. After the stream
    * drains, the state must equal a one-shot batch aggregate over
    * everything seen (StreamingSpec proves it — the same associativity
    * q107's oracle proves cross-engine). */
  def runStreamingIncrementalAgg(spark: SparkSession, streamDir: String,
      key: String, valueCol: String, stateDir: String): StreamingQuery = {
    val schema = spark.read.parquet(streamDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // read-modify-write-SWAP: the merged state is written to a fresh
        // path, the old state renamed ASIDE (never deleted first), then
        // the new one renamed in — a crash at any point leaves either the
        // old or the new state present, never neither (the Scale.compact
        // pattern). Spark also cannot overwrite a parquet dir it is
        // reading in the same job, hence the separate path. NOTE:
        // foreachBatch is at-least-once — a production deployment keys
        // the merge on batchId (skip if already applied) to stay
        // idempotent under replay; the AvailableNow demo processes each
        // batch exactly once per run.
        val hadoopConf = spark.sparkContext.hadoopConfiguration
        val cur = new org.apache.hadoop.fs.Path(stateDir)
        val next = new org.apache.hadoop.fs.Path(stateDir + "__next")
        val old = new org.apache.hadoop.fs.Path(stateDir + "__old")
        val fs = cur.getFileSystem(hadoopConf)
        val deltaState = graft.plans.Scale.aggState(batch, key, valueCol)
        val merged =
          if (fs.exists(cur))
            graft.plans.Scale.mergeAggStates(
              spark.read.parquet(stateDir), deltaState, key)
          else deltaState
        merged.coalesce(1).write.mode("overwrite").parquet(next.toString)
        fs.delete(old, true)
        if (fs.exists(cur)) require(fs.rename(cur, old), s"state swap: $cur aside failed")
        require(fs.rename(next, cur), s"state swap: $next -> $cur failed")
        fs.delete(old, true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** STREAM-STREAM interval join: purchases attributed to every view by
    * the same user in the preceding 24 h — two independent readers over
    * the event stream, both watermarked, joined on user equality + a
    * two-sided event-time bound. The time bound is what makes this
    * runnable unbounded: with purchase_ts ∈ (view_ts, view_ts + 24 h]
    * and both watermarks at 1 h, Spark can discard a buffered view once
    * the purchase-side watermark passes view_ts + 24 h (and vice versa),
    * so join state is a sliding 25 h of per-user activity, not the full
    * history. Batch twin is q96 (equivalence asserted by StreamingSpec).
    * Inner join + append mode: rows emit as soon as both sides arrive. */
  def runStreamingIntervalJoin(spark: SparkSession, dir: String,
      sinkName: String): StreamingQuery = {
    val views = eventStream(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val buys = eventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val q = views.join(buys,
        col("user_id") === col("p_user") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts")))
          .as("gap_s"))
      .writeStream
      .queryName(sinkName)
      .format("memory")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming exact dedup: first event per (user_id, event_type), state
    * bounded by a 1-day watermark — dropDuplicates-with-watermark, the
    * streaming form of the batch keep-first window (q72). */
  def runStreamingDedup(spark: SparkSession, dir: String, sinkName: String): StreamingQuery = {
    val q = eventStream(spark, dir)
      .withWatermark("ts", "1 day")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
      .writeStream
      .queryName(sinkName)
      .format("memory")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
