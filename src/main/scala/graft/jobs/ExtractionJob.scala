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

  /** The reference CLI's pipeline knobs (cmd/pipeline/main.go:64-96):
    * min-chunk-chars, chrome patterns (defaults + optional custom regex
    * appended, main.go:92-96), the dedup config, and the sink options
    * (markdown title / chunk-id comments / chunks-JSONL toggle).
    */
  final case class PipelineConfig(
      minChunkChars: Int = Corpus.MinChunkChars,
      chromePatterns: Seq[String] = graft.kernel.TextKernel.defaultChromePatterns,
      dedupe: DedupeConfig = DedupeConfig(),
      markdownTitle: String = "",
      includeChunkIds: Boolean = false,
      // reference default is TRUE (cmd/pipeline/main.go:75)
      emitChunksJsonl: Boolean = true)

  def chunks(docs: DataFrame, minChunkChars: Int = Corpus.MinChunkChars): DataFrame = {
    val assembled = Corpus.assemble(docs)
    Chunker.chunk(assembled, col("raw"), minChunkChars)
  }

  def filteredChunks(docs: DataFrame): DataFrame = filteredChunks(docs, PipelineConfig())

  def filteredChunks(docs: DataFrame, cfg: PipelineConfig): DataFrame =
    chunks(docs, cfg.minChunkChars).filter(
      Exprs.chromeKeep(col("norm"), cfg.chromePatterns, Corpus.ChromeMaxLength))

  /** Full dedup output (kept + dropped audit in one frame). */
  def dedup(docs: DataFrame, config: DedupeConfig = DedupeConfig())(
      implicit spark: SparkSession): DataFrame =
    DedupeOps.perDocDedupe(filteredChunks(docs), config).toDF()

  /** Full dedup output under a complete [[PipelineConfig]]. */
  def dedupWith(docs: DataFrame, cfg: PipelineConfig)(
      implicit spark: SparkSession): DataFrame =
    DedupeOps.perDocDedupe(filteredChunks(docs, cfg), cfg.dedupe).toDF()

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
    * ratio, dedup rate) in ONE pass: `size(spans)` rides through assemble
    * and the chunker as a carried column, chrome verdicts are a map-side
    * flag, and one `groupByKey(doc_id)` computes chunk counts AND runs the
    * dedup kernel on the keepers — one chunker subtree, one exchange, no
    * joins (the former shape built the chunk pipeline twice and joined
    * three frames). Emits one row per doc that produced >= 1 chunk.
    */
  def metrics(docs: DataFrame, config: DedupeConfig = DedupeConfig())(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val assembled = Corpus.assembleWith(docs, size(col("spans")).cast("long").as("n_spans"))
    val ch = Chunker.chunk(assembled, col("raw"), Corpus.MinChunkChars,
      passThrough = Seq("n_spans"))
    val keep = Exprs.chromeKeep(col("norm"), ChromePatterns, Corpus.ChromeMaxLength)
    val cfg = config.validated
    ch.select(col("doc_id"), col("id"), col("text"), col("norm"), col("idx"),
        keep.as("keep"), col("n_spans"))
      .as[(String, String, String, String, Long, Boolean, Long)]
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val rows = it.toArray.sortBy(_._5)
        val nChunks = rows.length.toLong
        val nChromeDropped = rows.count(!_._6).toLong
        val keepers = rows.iterator.filter(_._6)
          .map(r => graft.kernel.Chunk(r._2, r._3, r._4, r._5.toInt)).toSeq
        val st = graft.kernel.DedupeKernel.dedupe(keepers, cfg).stats
        (docId, rows.head._7, nChunks, nChromeDropped,
          st.inputCount.toLong, st.keptCount.toLong, st.droppedCount.toLong,
          st.exactDups.toLong, st.nearDups.toLong)
      }
      .toDF("doc_id", "n_spans", "n_chunks", "n_chrome_dropped",
        "input_count", "kept_count", "dropped_count", "exact_dups", "near_dups")
      .select(
        col("doc_id"), col("n_spans"), col("n_chunks"), col("n_chrome_dropped"),
        col("input_count"), col("kept_count"), col("dropped_count"),
        col("exact_dups"), col("near_dups"),
        // integer-quantized ratios (floor(x*10000)) keep the metrics
        // deterministic across engines; a doc whose chunks were ALL
        // chrome-dropped has input_count=0 — its dedup rate is 0, not null
        // (the contract is one metrics row per doc that produced >= 1
        // chunk, chrome-dropped or not; zero-CHUNK docs emit no row)
        floor(col("n_chrome_dropped") * 10000.0 / col("n_chunks")).as("boilerplate_ratio_bp"),
        when(col("input_count") > 0,
          floor(col("dropped_count") * 10000.0 / col("input_count")))
          .otherwise(lit(0L)).as("dedup_rate_bp"))
  }
}
