package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.jobs.ExtractionJob

/** Streaming common-paragraph (boilerplate) screen — the streaming twin of
  * the q73 batch filter ([[graft.ops.Similarity.commonParagraphFilter]]):
  * each micro-batch of interleaved docs is chunked with the batch chunker
  * and a chunk is suppressed when the CUMULATIVE number of distinct
  * documents carrying its normalized text (across everything ingested so
  * far, this batch included) exceeds `maxDocs`.
  *
  * Documented divergence from the batch operator (same class as D2's
  * canonicalized drop order): batch q73 drops retroactively — once a norm
  * is boilerplate, ALL its occurrences go, including the earliest ones —
  * while a stream cannot recall rows already emitted, so occurrences seen
  * BEFORE the threshold crossing stay emitted and everything from the
  * crossing batch onward is dropped. The classified-boilerplate NORM SET
  * converges to the batch operator's once the same corpus has flowed
  * through (pinned by StreamingBoilerplateSpec: streamed-kept ⊇ batch-kept,
  * and the surplus is exactly the pre-crossing occurrences).
  *
  * Shape: `foreachBatch` + a persisted parquet (h, doc_id) pair index, NOT
  * `flatMapGroupsWithState` — the verdict needs a per-hash DISTINCT-doc
  * count joined back against the batch, which is the same broadcast
  * anti-join plan the batch operator runs, reused verbatim. Index writes
  * follow [[StreamingScreen]]'s idempotence contract: one `batch=<id>`
  * partition dir per micro-batch with overwrite semantics, so a REPLAYED
  * batch rewrites its own partition instead of double-counting it, and
  * reads exclude the current batch's own partition. The index carries
  * 16-byte hashes + doc ids only (never text); at web scale the per-hash
  * count table it aggregates to is the compaction target — heavy hashes
  * are a vanishing fraction, so the broadcast in the anti-join holds.
  */
object StreamingBoilerplate {

  /** Classify one micro-batch of chunks against the cumulative (h, doc_id)
    * pair index. Returns the surviving chunks (doc_id, id, idx) — the same
    * contract as the batch operator, per batch.
    */
  def screenBatch(chunks: DataFrame, indexPairs: Option[DataFrame],
      maxDocs: Long = 2L): DataFrame = {
    val hashed = chunks.withColumn("h", md5(col("norm")))
    val batchPairs = hashed.select(col("h"), col("doc_id"))
    val all = indexPairs.map(_.unionByName(batchPairs)).getOrElse(batchPairs)
    val heavy = all.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select(col("h"))
    hashed.join(heavy, Seq("h"), "left_anti")
      .select(col("doc_id"), col("id"), col("idx"))
  }

  /** The per-batch body `attach` wires into foreachBatch, callable directly
    * (and idempotently) for tests and backfills: chunk the docs `batch`,
    * screen it against the pair index at `indexDir` (excluding this batch's
    * own partition — a replay overwrites it), append this batch's distinct
    * (h, doc_id) pairs as `indexDir/batch=<id>`, and hand the kept chunks
    * to `sink`.
    */
  def processBatch(indexDir: String, maxDocs: Long,
      sink: (DataFrame, Long) => Unit)(batch: DataFrame, id: Long): Unit = {
    val spark = batch.sparkSession
    val existing =
      try {
        val idx = spark.read.parquet(indexDir)
        Some(idx.filter(col("batch") =!= id).select(col("h"), col("doc_id")))
          .filter(_ => idx.columns.contains("batch"))
      } catch { case _: AnalysisException => None }
    val chunks = ExtractionJob.chunks(batch).persist()
    try {
      chunks.select(md5(col("norm")).as("h"), col("doc_id")).distinct()
        .write.mode("overwrite").parquet(s"$indexDir/batch=$id")
      sink(screenBatch(chunks, existing, maxDocs), id)
    } finally chunks.unpersist()
  }

  /** Attach the screen to an interleaved-docs stream. Start with
    * `.attach(...).start()`; every micro-batch flows through
    * [[processBatch]].
    */
  def attach(docsStream: DataFrame, indexDir: String, maxDocs: Long = 2L)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docsStream.writeStream.foreachBatch {
      (b: Dataset[Row], id: java.lang.Long) =>
        processBatch(indexDir, maxDocs, sink)(b.toDF(), id)
    }
}
