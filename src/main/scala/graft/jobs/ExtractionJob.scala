package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.DedupeConfig
import graft.ops._

/** The flagship end-to-end pipeline — the graft of the reference's
  * `pipeline run` dataflow (cmd/pipeline/main.go:115-285) onto the
  * interleaved docs table:
  *
  *   docs(doc_id, spans)
  *     -> assemble   (per-row span fold + OCR map; ZERO shuffle)
  *     -> chunk      (posexplode + ONE window exchange on doc_id)
  *     -> chrome     (map-side filter, single combined regex)
  *     -> dedupe     (per-doc sequential kernel via groupByKey(doc_id) —
  *                    reuses the chunker's doc_id partitioning)
  *     -> spans out  (kept chunks as ordered text spans per doc)
  *
  * Shuffle budget: one exchange on doc_id end-to-end (plus the tiny
  * fallback anti-join). Large-document skew is bounded because per-doc
  * work is O(chunks · window); doc PLACEMENT is what gets salted at the
  * table-write level, not the scan (SURVEY.md §7.4.2).
  */
object ExtractionJob {

  val ChromePatterns: Seq[String] = graft.kernel.TextKernel.defaultChromePatterns

  def chunks(docs: DataFrame): DataFrame = {
    val assembled = Corpus.assemble(docs)
    Chunker.chunk(assembled, col("raw"), Corpus.MinChunkChars)
  }

  def filteredChunks(docs: DataFrame): DataFrame =
    chunks(docs).filter(
      Exprs.chromeKeep(col("norm"), ChromePatterns, Corpus.ChromeMaxLength))

  /** Full dedup output (kept + dropped audit in one frame). */
  def dedup(docs: DataFrame, config: DedupeConfig = DedupeConfig())(
      implicit spark: SparkSession): DataFrame =
    DedupeOps.perDocDedupe(filteredChunks(docs), config).toDF()

  /** The output span sequence per doc: kept chunks as ordered text spans
    * (kind, text, media_ref="", order) — the BASELINE.json per-row
    * invariant surface. Order is the kept chunks' survivor order.
    */
  def outputSpans(docs: DataFrame, config: DedupeConfig = DedupeConfig())(
      implicit spark: SparkSession): DataFrame =
    dedup(docs, config)
      .filter(col("kept"))
      .select(
        col("doc_id"),
        lit("text").as("kind"),
        col("text"),
        lit("").as("media_ref"),
        // kept order is emitted by the per-doc kernel — no window needed
        col("kept_order").as("order"))

  /** A4 — per-doc extraction metrics (north_star: spans/doc, boilerplate
    * ratio, dedup rate), joined from the stage frames.
    */
  def metrics(docs: DataFrame, config: DedupeConfig = DedupeConfig())(
      implicit spark: SparkSession): DataFrame = {
    val nSpans = docs.select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"))
    val ch = chunks(docs)
    val chromeKeepCol = Exprs.chromeKeep(col("norm"), ChromePatterns, Corpus.ChromeMaxLength)
    val chunkStats = ch
      .withColumn("keep", chromeKeepCol)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_chrome_dropped"))
    val dd = DedupeOps.stats(DedupeOps.perDocDedupe(
      ch.filter(chromeKeepCol), config))
    nSpans
      .join(chunkStats, Seq("doc_id"), "left")
      .join(dd, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_spans"), col("n_chunks"), col("n_chrome_dropped"),
        col("input_count"), col("kept_count"), col("dropped_count"),
        col("exact_dups"), col("near_dups"),
        // integer-quantized ratios (floor(x*10000)) keep the metrics
        // deterministic across engines
        floor(col("n_chrome_dropped") * 10000.0 / col("n_chunks")).as("boilerplate_ratio_bp"),
        floor(col("dropped_count") * 10000.0 / col("input_count")).as("dedup_rate_bp"))
  }
}
