package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.{GraftQuery, Tables}

/** Source/sink surface beyond the parquet test tables (SURVEY §2.1).
  *
  * The reference is CSV-in/CSV-out with npy sidecars (S1-S7); here CSV is
  * one more format on the same DataFrame plans. Schemas are always
  * explicit on read (S1's inferSchema is a correctness trap the reference
  * hit with all-object dtypes — SURVEY §1.3) and written headers make the
  * round trip self-describing. At 100 TB CSV is an ingest/egress format
  * only — plans land in parquet/bucketed tables immediately (S10). */
object Sources {

  // round-trip temp paths: concurrent Verify/Bench JVMs must not race on
  // the same directory. A per-process random id — identityHashCode of the
  // session (the previous scheme) is only unique within one JVM and two
  // JVMs can collide on it.
  private val runId: String = java.util.UUID.randomUUID().toString.take(8)

  /** S7 + S1: write a DataFrame as headered CSV, read it back with the
    * explicit schema. Timestamps round-trip via ISO format. */
  def csvRoundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    spark.read.option("header", "true").schema(df.schema).csv(path)
  }

  /** q80: documents through a CSV round trip, then the q40-style per-lang
    * profile. The oracle computes the same profile straight from parquet —
    * hash equality proves the CSV path is lossless for this schema. */
  val q80CsvRoundTrip = GraftQuery(
    "q80_csv_roundtrip",
    "S1,S2,S7; CSV scan + sink, explicit schema",
    (s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_rt_$runId"
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val back = csvRoundTrip(s, docs, tmp)
      back.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** S3: header-only schema peek — limit(0) keeps the scan metadata-only
    * (parquet footer; no row groups read). Returned as a relation of
    * (col_name, col_type) so it is a queryable operator, not an API call. */
  val q81SchemaPeek = GraftQuery(
    "q81_schema_peek",
    "S3; schema-only scan",
    (s, d) => {
      val fields = Tables.lineitem(s, d).limit(0).schema.fields.toSeq
      // timestamp flavors collapse to one label: Spark reads parquet
      // timestamp[us] as TIMESTAMP or TIMESTAMP_NTZ depending on the
      // file's isAdjustedToUTC flag (which has changed across testdata
      // generations), while the DuckDB oracle's information_schema says
      // TIMESTAMP for both — the peek asserts the logical schema, not
      // the zone flavor
      s.createDataFrame(fields.map { f =>
        val t = f.dataType.simpleString match {
          case ts if ts.startsWith("timestamp") => "timestamp"
          case other => other
        }
        (f.name, t)
      })
        .toDF("col_name", "col_type")
        .orderBy(col("col_name"))
    },
    Some("""SELECT column_name AS col_name,
      CASE
        WHEN lower(data_type) LIKE 'timestamp%' THEN 'timestamp'
        WHEN data_type = 'BIGINT' THEN 'bigint'
        WHEN data_type = 'INTEGER' THEN 'int'
        WHEN data_type = 'DOUBLE' THEN 'double'
        WHEN data_type = 'FLOAT' THEN 'float'
        WHEN data_type = 'VARCHAR' THEN 'string'
        ELSE lower(data_type) END AS col_type
      FROM information_schema.columns WHERE table_name = 'lineitem'
      ORDER BY col_name"""))

  /** JSONL (newline-delimited JSON) round trip — the lingua franca of
    * LLM training-data interchange (one JSON object per line; what a
    * 100 TB corpus usually lands as before parquet conversion). Same
    * explicit-schema discipline as CSV: no sampling inference on read. */
  def jsonlRoundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(path)
    spark.read.schema(df.schema).json(path)
  }

  /** q84: documents through a JSONL round trip, then a per-source profile
    * (text length survives JSON string escaping — the hash proves the
    * lossless round trip, including the HTML-ish text payload). */
  val q84JsonlRoundTrip = GraftQuery(
    "q84_jsonl_roundtrip",
    "S1,S7 ext; JSONL scan + sink, explicit schema",
    (s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_rt_$runId"
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val back = jsonlRoundTrip(s, docs, tmp)
      back.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n"),
          sum(length(col("text"))).as("total_len"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("source"))
    },
    Some("""SELECT source, count(*) AS n,
        CAST(sum(length(text)) AS BIGINT) AS total_len,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source ORDER BY source"""))

  /** ORC round trip — the other columnar format Spark ships natively
    * (warehouse interchange with Hive-lineage systems). Same explicit-
    * schema discipline; no spark-avro connector is bundled in this
    * distribution, so ORC is the third and last on-disk format here. */
  def orcRoundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).orc(path)
    spark.read.schema(df.schema).orc(path)
  }

  /** q85: documents through an ORC round trip, then a per-lang profile
    * (hash equality vs the parquet-side oracle proves losslessness). */
  val q85OrcRoundTrip = GraftQuery(
    "q85_orc_roundtrip",
    "S1,S7 ext; ORC scan + sink, explicit schema",
    (s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_rt_$runId"
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      val back = orcRoundTrip(s, docs, tmp)
      back.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          sum(length(col("text"))).as("total_len"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n,
        CAST(sum(length(text)) AS BIGINT) AS total_len,
        max(n_chars) AS max_chars
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** q86: documents through a Hive-partitioned parquet round trip
    * (Scale.writePartitioned), read back pruned to three partitions.
    * The partition column lives in directory names, not file contents —
    * the hash vs the flat-parquet oracle proves that move is lossless,
    * and the IN-list filter rides partition pruning (PartitionFilters in
    * the scan; plan-asserted in BucketingSpec), the coarse skipping
    * layer a 100 TB corpus keyed by source/lang/date relies on. */
  val q86PartitionedRoundTrip = GraftQuery(
    "q86_partitioned_roundtrip",
    "S10 ext; partitionBy write + pruned read-back",
    (s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_part_rt_$runId"
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
      graft.plans.Scale.writePartitioned(docs, tmp, "source")
      s.read.schema(docs.schema).parquet(tmp)
        .filter(col("source").isin("src0", "src1", "src2"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("source"))
    },
    Some("""SELECT source, count(*) AS n,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents WHERE source IN ('src0','src1','src2')
      GROUP BY source ORDER BY source"""))

  /** q110: `binaryFile` ingest — Spark's built-in whole-file source, the
    * entry point for raw multimodal payloads (images/audio dumped as one
    * file per object, the shape q60-q63 consume after ingest). A bounded
    * fixture set (64 one-file-per-doc ASCII payloads, derived from the
    * documents table) is laid down once per process; the OPERATOR is the
    * distributed part: `spark.read.format("binaryFile")` glob scan →
    * basename/length/md5 projection, one task per file group, no shuffle
    * before the output sort. The oracle never reads the files — it
    * recomputes the expected (name, length, md5) from the documents
    * table, so a hash match proves the file write+scan round trip is
    * byte-faithful. At 100 TB the same plan reads an object-store glob;
    * small-file pressure is handled by the q63/Scale.compact step
    * immediately downstream. */
  val q110BinaryFileIngest = GraftQuery(
    "q110_binaryfile_ingest",
    "S4 ext; binaryFile whole-file multimodal ingest",
    (s, d) => {
      // fixture keyed on the DATA DIR as well as the process: the file
      // contents derive from `d`, so a second scale factor in the same
      // JVM must not read the first one's cached fixtures
      val dirKey = java.lang.Integer.toHexString(d.hashCode)
      val dir =
        s"${System.getProperty("java.io.tmpdir")}/graft_binf_${runId}_$dirKey"
      val p = new java.io.File(dir)
      if (!p.exists()) {
        // fixture write, bounded to 64 files; payloads are ASCII so the
        // DuckDB oracle can md5 them as VARCHAR byte-for-byte. Written
        // into a staging dir and RENAMED into place on success: the bare
        // existence guard is not atomic with a 64-file write, so a
        // failure partway through must not leave a dir that later runs
        // in this JVM would treat as a complete fixture set.
        val stage = new java.io.File(dir + ".staging")
        if (stage.exists()) {
          stage.listFiles().foreach(_.delete()); stage.delete()
        }
        stage.mkdirs()
        Tables.documents(s, d)
          .filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"),
            concat(lit("doc:"), col("doc_id").cast("string"), lit(":"),
              md5(col("text").cast("binary"))).as("payload"))
          .orderBy(col("doc_id")).limit(64)
          .collect().foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(stage.getPath, s"doc_${r.getLong(0)}.txt"),
              r.getString(1).getBytes("UTF-8"))
          }
        java.nio.file.Files.move(stage.toPath, p.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      s.read.format("binaryFile").load(s"$dir/*.txt")
        .select(
          regexp_extract(col("path"), "([^/]+)\\.txt$", 1).as("fname"),
          col("length"),
          md5(col("content")).as("payload_md5"))
        .orderBy(col("fname"))
    },
    Some("""WITH fixture AS (
        SELECT doc_id,
          'doc:' || CAST(doc_id AS VARCHAR) || ':' || md5(text) AS payload
        FROM documents WHERE doc_id % 7 = 0
        ORDER BY doc_id LIMIT 64)
      SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS fname,
        CAST(len(payload) AS BIGINT) AS length,
        md5(payload) AS payload_md5
      FROM fixture ORDER BY fname"""))

  /** q113: schema-drift ingest — two parquet generations of the same
    * table (v1 without `source`, v2 with it) read as one relation via
    * `mergeSchema`: the real-world "a field was added mid-crawl" case.
    * Spark unions the footers at planning time and fills the missing
    * column with nulls — no rewrite of the old generation (at 100 TB,
    * rewriting history to add a column is exactly what must never
    * happen). The oracle recomputes the expectation from the documents
    * table: a hash match proves old-generation rows surface with NULL
    * source and new-generation rows keep theirs. */
  val q113SchemaDrift = GraftQuery(
    "q113_schema_drift",
    "S1 ext; mergeSchema evolution across parquet generations",
    (s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_drift_$runId"
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/gen1")
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("lang"), col("source"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/gen2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$dir/gen1", s"$dir/gen2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          count(col("source")).as("n_with_source"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n,
        CAST(count(CASE WHEN doc_id % 2 <> 0 THEN source END) AS BIGINT) AS n_with_source,
        CAST(count(DISTINCT CASE WHEN doc_id % 2 <> 0 THEN source END) AS BIGINT) AS n_sources
      FROM documents GROUP BY lang ORDER BY lang"""))

  def queries: Seq[GraftQuery] =
    Seq(q80CsvRoundTrip, q81SchemaPeek, q84JsonlRoundTrip, q85OrcRoundTrip,
      q86PartitionedRoundTrip, q110BinaryFileIngest, q113SchemaDrift)
}
