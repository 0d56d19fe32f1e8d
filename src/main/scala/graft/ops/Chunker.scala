package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G1 — ChunkText as a distributed transform (reference:
  * internal/text/text.go:69-121): split each document's raw text on blank
  * lines, trim, drop segments under `minChars` BYTES, then assign
  * survivor-position ids `c%04d` / `idx`, plus the whole-text fallback when
  * nothing survives.
  *
  * Plan shape: posexplode + filter are map-side (no shuffle); the
  * survivor re-rank is ONE window exchange on doc_id, and every later
  * per-doc stage (chrome filter is map-side; dedup groups by doc_id)
  * reuses that partitioning, so the dedup groupBy does not re-shuffle.
  */
object Chunker {

  /** Chunk `rawCol` of `docs` (one row per doc) into
    * (doc_id, id, text, norm, idx) rows.
    */
  def chunk(docs: DataFrame, rawCol: Column, minChars: Int = Corpus.MinChunkChars): DataFrame = {
    val segs = docs
      .select(col("doc_id"), rawCol.as("raw"))
      .select(col("doc_id"), col("raw"),
        posexplode(split(col("raw"), Exprs.blankLineSplit, -1)).as(Seq("pos", "seg")))
      .withColumn("t", Exprs.trimAsciiWs(col("seg")))

    val survivors = segs.filter(octet_length(col("t")) >= minChars)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ranked = survivors
      .withColumn("rn", row_number().over(w))
      .select(
        col("doc_id"),
        concat(lit("c"), lpad(col("rn").cast("string"), 4, "0")).as("id"),
        col("t").as("text"),
        Exprs.normCol(col("t")).as("norm"),
        (col("rn") - 1).cast("long").as("idx"))

    // Fallback (text.go:107-118): docs with ZERO surviving segments whose
    // whole trimmed text is still >= minChars bytes become one chunk.
    // Anti-join on doc_id against the survivor set — both sides are already
    // hash-partitioned on doc_id from the window above.
    val fallback = docs
      .select(col("doc_id"), rawCol.as("raw"))
      .join(survivors.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .withColumn("t", Exprs.trimAsciiWs(col("raw")))
      .filter(octet_length(col("t")) >= minChars)
      .select(
        col("doc_id"),
        lit("c0001").as("id"),
        col("t").as("text"),
        Exprs.normCol(col("t")).as("norm"),
        lit(0L).as("idx"))

    ranked.unionByName(fallback)
  }
}
