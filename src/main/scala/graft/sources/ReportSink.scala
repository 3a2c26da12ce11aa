package graft.sources

import org.apache.spark.sql.DataFrame

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
}
