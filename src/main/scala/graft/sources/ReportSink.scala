package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** S8 — markdown report sink (reference: app/fetech_jd.py:129-184 formats
  * two sampled rows into a .md review doc). Driver-side by design: report
  * rendering is for human-scale row counts, so the only distributed work
  * is the plan that produced `df`; collect() here is bounded by `maxRows`
  * and is not part of any hot path. */
object ReportSink {

  /** Render a DataFrame as a GitHub-style markdown table. */
  def toMarkdown(df: DataFrame, maxRows: Int = 50): String = {
    val cols = df.columns
    val rows = df.limit(maxRows).collect()
    val header = cols.mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    val body = rows.map(r =>
      cols.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse("")
        .replace("|", "\\|").replace("\n", " "))
        .mkString("| ", " | ", " |"))
    (Seq(header, sep) ++ body).mkString("\n")
  }

  /** Write the markdown report to a local path. */
  def write(df: DataFrame, path: String, maxRows: Int = 50): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      toMarkdown(df, maxRows) + "\n")
  }

  // -------------------------------------------------------------------
  // Qualitative pair-detail docs — the reference's fetech_jd.py consumer
  // (app/fetech_jd.py:63-186): pick the first and last rows of the
  // similarity results, look up each referenced id's *cleaned* document
  // text, and render one human-review markdown doc per row with a
  // section per participant.
  // -------------------------------------------------------------------

  private val NotFound = "[Description Not Found in Processed File]"

  /** Render one (id1, id2, sim) pair with joined descriptions. */
  private def renderPair(title: String, r: Row, texts: Map[Long, String]): String = {
    val (id1, id2, sim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    Seq(
      s"# $title",
      s"**Pair:** $id1 <-> $id2",
      f"**Similarity:** $sim%.4f",
      "",
      s"## Document $id1",
      texts.getOrElse(id1, NotFound),
      "",
      "---",
      "",
      s"## Document $id2",
      texts.getOrElse(id2, NotFound),
      "").mkString("\n")
  }

  /** Write detail docs for the strongest and weakest surviving pair.
    *
    * `pairs` is the canonical (id1, id2, sim) relation; `docs` is any
    * (doc_id, text) frame (JobPipeline passes the *preprocessed* stage,
    * matching the reference's use of the cleaned descriptions). Only the
    * two boundary rows and their <= 4 referenced documents are ever
    * collected; the description lookup is a pushed-down `doc_id IN (...)`
    * scan, not a table collect — at 100 TB the report costs two top-1
    * queries and a 4-row point lookup. */
  def writePairDetails(pairs: DataFrame, docs: DataFrame,
      firstPath: String, lastPath: String): Unit = {
    val first = pairs.orderBy(col("sim").desc, col("id1"), col("id2")).limit(1).collect()
    val last = pairs.orderBy(col("sim").asc, col("id1"), col("id2")).limit(1).collect()
    val ids = (first ++ last).flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
    val texts =
      if (ids.isEmpty) Map.empty[Long, String]
      else docs.filter(col("doc_id").isin(ids: _*))
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    def writeDoc(path: String, rows: Array[Row], title: String): Unit = {
      val body =
        if (rows.isEmpty) s"# $title\n\n_No pairs above threshold._\n"
        else renderPair(title, rows.head, texts)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body)
    }
    writeDoc(firstPath, first, "Strongest near-duplicate pair")
    writeDoc(lastPath, last, "Weakest surviving pair")
  }
}
