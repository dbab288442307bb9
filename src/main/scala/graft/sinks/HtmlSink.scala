package graft.sinks

import org.apache.spark.sql.DataFrame

/** S3 — styled-HTML table sink (reference `_save_df_table`,
  * time_series_study/time_series_study.py:113-125): the reference
  * renders `df.head(1000).style…to_html` with bold-centered headers and
  * padded cells next to the CSV copy of every published table.
  *
  * Spark-first shape: the HTML is presentation for humans, so it is a
  * driver-side render of `df.limit(limit).collect()` — a
  * `CollectLimit`, which short-circuits the scan after `limit` rows at
  * any corpus size (the reference's embedded head(1000) is part of the
  * operator's contract, SURVEY §2.1 S3). The CSV twin stays on the
  * engine's distributed CSV sink ([[graft.TimeSeriesStudy.saveCsv]]);
  * this object never collects more than `limit` rows.
  *
  * Determinism: cell text is `Row.get.toString` (null → empty cell),
  * escaped for `& < > "`; column order is the frame's. The styling
  * mirrors the reference's two style rules (th font-weight 600 +
  * centered, td 4px 8px padding). */
object HtmlSink {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  /** Render the first `limit` rows as a styled standalone HTML page. */
  def toHtmlTable(df: DataFrame, limit: Int = 1000): String = {
    require(limit >= 1, s"limit must be >= 1, got $limit")
    val cols = df.columns
    val rows = df.limit(limit).collect()
    val sb = new StringBuilder
    sb.append("<html><head><meta charset=\"utf-8\"><style>\n")
    sb.append("table.graft { border-collapse: collapse; }\n")
    sb.append("table.graft th { font-weight: 600; text-align: center; }\n")
    sb.append("table.graft td { padding: 4px 8px; }\n")
    sb.append("</style></head><body><table class=\"graft\">\n<thead><tr>")
    cols.foreach(c => sb.append("<th>").append(esc(c)).append("</th>"))
    sb.append("</tr></thead>\n<tbody>\n")
    rows.foreach { row =>
      sb.append("<tr>")
      var i = 0
      while (i < cols.length) {
        val v = row.get(i)
        sb.append("<td>").append(if (v == null) "" else esc(v.toString)).append("</td>")
        i += 1
      }
      sb.append("</tr>\n")
    }
    sb.append("</tbody>\n</table></body></html>\n")
    sb.toString
  }

  /** Write `<pathNoExt>.html` (driver-side single file, like the
    * reference's sink — presentation output is a local artifact). */
  def saveTable(df: DataFrame, pathNoExt: String, limit: Int = 1000): Unit = {
    val f = new java.io.File(pathNoExt + ".html")
    Option(f.getParentFile).foreach(_.mkdirs())
    // explicit UTF-8: the page declares <meta charset="utf-8">, so the
    // bytes must be UTF-8 regardless of the JVM's default charset
    java.nio.file.Files.write(f.toPath,
      toHtmlTable(df, limit).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}
