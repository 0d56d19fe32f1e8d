package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A3/S4 — per-document Markdown rendering (reference:
  * internal/text/text.go:219-279), as an ordered per-doc fold.
  *
  * Implemented with collect_list + array_sort + array_join inside a single
  * groupBy on doc_id (one exchange, reused from upstream per-doc stages) —
  * never a driver-side collect. Byte layout locked by kernel fixtures; the
  * distributed form is fixture-tested against the kernel.
  */
object Render {

  /** kept chunks (doc_id, id, text, idx) -> (doc_id, markdown).
    * Layout per reference: "# " + title + "\n\n" then per chunk
    * [optional "<!-- id -->\n"] + text + "\n\n"; then the sink
    * normalization (text.go:267-272): trailing newlines collapsed to one.
    */
  def markdown(kept: DataFrame, title: Column, includeChunkIds: Boolean): DataFrame = {
    val entry =
      if (includeChunkIds)
        (x: Column) => concat(lit("<!-- "), x("id"), lit(" -->\n"), x("text"), lit("\n\n"))
      else
        (x: Column) => concat(x("text"), lit("\n\n"))
    val t = when(length(title) === 0, lit("Extracted Notes")).otherwise(title)
    kept
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("idx"), col("id"), col("text")))),
          entry),
        "").as("body"))
      .select(
        col("doc_id"), {
          // finalizeMarkdown: CRLF->LF, CR->LF, trailing \n* -> exactly one
          val full = concat(lit("# "), t, lit("\n\n"), col("body"))
          val lf = regexp_replace(regexp_replace(full, "\\r\\n", "\n"), "\\r", "\n")
          concat(rtrim(lf, "\n"), lit("\n")).as("markdown")
        })
  }

  /** S3 — chunks-JSONL projection (reference: internal/text/text.go:187-198):
    * {id, text preview (<=500 BYTES + "..."), index, len (BYTES)}.
    */
  def jsonlProjection(chunks: DataFrame): DataFrame =
    chunks.select(
      col("doc_id"),
      col("id"),
      Exprs.byteTruncate(col("text"), 500).as("text"),
      col("idx").as("index"),
      octet_length(col("text")).cast("long").as("len"))
}
