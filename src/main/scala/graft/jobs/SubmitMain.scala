package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.DedupeConfig
import graft.ops.{Corpus, Render}
import graft.table.SnapshotTable

/** spark-submit entry point (north_star: "runs via spark-submit with
  * explicit doc_id-salted repartitioning, Iceberg snapshot-based
  * checkpointing so a killed run resumes at partition granularity, and
  * per-partition lineage + extraction metrics written to a metrics table"),
  * carrying the reference CLI's full knob surface
  * (cmd/pipeline/main.go:64-96).
  *
  * Usage:
  *   spark-submit --class graft.jobs.SubmitMain <jar> \
  *     --sf-dir <dir> --out <root> [--buckets 32] [--max-buckets-per-run N]
  *     [--replicate 1] [--dedupe-method exact|simhash|both] [--simhash-k 5]
  *     [--simhash-threshold 6] [--window 250] [--min-chunk-chars 60]
  *     [--chrome-regex <pattern>] [--markdown-title <t>]
  *     [--include-chunk-ids] [--emit-chunks-jsonl] [--emit-report]
  *
  * The resumable table materializes the FULL dedup audit frame (kept +
  * dropped rows); every sink (output spans, final markdown, chunks JSONL,
  * report) is then derived by READING BACK the committed parquet — the
  * expensive pipeline runs exactly once per bucket across any number of
  * kills/resumes, and sink derivation is a cheap scan.
  *
  * Re-running after a kill resumes from the last committed snapshot.
  */
object SubmitMain {

  final case class Args(
      sfDir: String = "",
      out: String = "",
      buckets: Int = 32,
      maxPerRun: Int = Int.MaxValue,
      replicate: Int = 1,
      pipeline: ExtractionJob.PipelineConfig = ExtractionJob.PipelineConfig(),
      emitReport: Boolean = false)

  private[jobs] def parse(argv: Array[String]): Args = {
    var a = Args()
    var cfg = a.pipeline
    var dd = cfg.dedupe
    var i = 0
    def next(): String = { i += 1; argv(i) }
    while (i < argv.length) {
      argv(i) match {
        case "--sf-dir" => a = a.copy(sfDir = next())
        case "--out" => a = a.copy(out = next())
        case "--buckets" => a = a.copy(buckets = next().toInt)
        case "--max-buckets-per-run" => a = a.copy(maxPerRun = next().toInt)
        case "--replicate" => a = a.copy(replicate = next().toInt)
        case "--dedupe-method" => dd = dd.copy(method = next())
        case "--simhash-k" => dd = dd.copy(simHashK = next().toInt)
        case "--simhash-threshold" => dd = dd.copy(simHashThreshold = next().toInt)
        case "--window" => dd = dd.copy(window = next().toInt)
        case "--min-chunk-chars" => cfg = cfg.copy(minChunkChars = next().toInt)
        // reference appends ONE custom pattern to the defaults; last flag
        // wins, mirroring the plain flag.String there (main.go:76, 92-96)
        case "--chrome-regex" =>
          cfg = cfg.copy(chromePatterns =
            graft.kernel.TextKernel.defaultChromePatterns :+ next())
        case "--markdown-title" => cfg = cfg.copy(markdownTitle = next())
        case "--include-chunk-ids" => cfg = cfg.copy(includeChunkIds = true)
        case "--emit-chunks-jsonl" => cfg = cfg.copy(emitChunksJsonl = true)
        case "--emit-report" => a = a.copy(emitReport = true)
        // legacy positional form: <sfDir> <outRoot> [buckets] [maxPerRun] [replicate]
        case v if !v.startsWith("--") && a.sfDir.isEmpty => a = a.copy(sfDir = v)
        case v if !v.startsWith("--") && a.out.isEmpty => a = a.copy(out = v)
        case v if !v.startsWith("--") && a.buckets == 32 && i == 2 =>
          a = a.copy(buckets = v.toInt)
        case v if !v.startsWith("--") && i == 3 => a = a.copy(maxPerRun = v.toInt)
        case v if !v.startsWith("--") && i == 4 => a = a.copy(replicate = v.toInt)
        case other => throw new IllegalArgumentException(s"unknown flag: $other")
      }
      i += 1
    }
    a.copy(pipeline = cfg.copy(dedupe = dd.validated))
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    require(args.sfDir.nonEmpty && args.out.nonEmpty, "--sf-dir and --out are required")

    implicit val spark: SparkSession = SparkSession.builder()
      .appName("graft-extraction")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Corpus.docsTable(spark, args.sfDir, args.replicate)
    val t0 = System.nanoTime()
    val ran = SnapshotTable.runResumable(
      docs, d => ExtractionJob.dedupWith(d, args.pipeline),
      args.out, args.buckets, args.maxPerRun)
    val sec = (System.nanoTime() - t0) / 1e9

    val done = SnapshotTable.completedBuckets(args.out)
    println(s"[graft] completed buckets this run: ${ran.toSeq.sorted.mkString(",")}")
    println(f"[graft] cumulative: ${done.size}/${args.buckets} buckets, $sec%.1fs")
    if (done.size == args.buckets) {
      writeSinks(args)
      val m = SnapshotTable.metrics(args.out)
      val rows = m.agg(sum("n_rows")).head.getLong(0)
      val nDocs = m.agg(sum("n_docs")).head.getLong(0)
      println(s"[graft] table complete: $nDocs docs, $rows audit rows")
    }
    spark.stop()
  }

  /** Derive the reference's file sinks from the COMMITTED dedup table
    * (read-back, no pipeline re-execution): output spans, final markdown
    * (text.go:249-279), chunks JSONL (text.go:166-215), report JSON
    * (report.go:34-72, dropped list as deterministic digest).
    */
  def writeSinks(args: Args)(implicit spark: SparkSession): Unit = {
    val cfg = args.pipeline
    val table = SnapshotTable.read(args.out)

    val kept = table.filter(col("kept"))
    kept.select(col("doc_id"), lit("text").as("kind"), col("text"),
        lit("").as("media_ref"), col("kept_order").as("order"))
      .write.mode(SaveMode.Overwrite).parquet(s"${args.out}/output_spans")

    Render.markdown(
        kept.withColumn("idx", col("kept_order")),
        lit(cfg.markdownTitle), includeChunkIds = cfg.includeChunkIds)
      .write.mode(SaveMode.Overwrite).parquet(s"${args.out}/final_md")

    if (cfg.emitChunksJsonl)
      // the audit frame holds EVERY filtered chunk (kept + dropped), which is
      // exactly the reference's pre-dedup JSONL input set
      Render.jsonlProjection(table.select("doc_id", "id", "text", "norm", "idx"))
        .write.mode(SaveMode.Overwrite).json(s"${args.out}/chunks_jsonl")

    if (args.emitReport) {
      val dd = cfg.dedupe
      val droppedEntry = when(!col("kept"),
        concat_ws("|", col("id"), col("reason"), col("matched_id"),
          col("distance").cast("string")))
      table.groupBy(col("doc_id")).agg(
          count(lit(1)).as("input_chunks"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("kept"),
          sum(when(!col("kept"), 1L).otherwise(0L)).as("dropped"),
          sum(when(col("reason") === "exact_duplicate", 1L).otherwise(0L)).as("exact_dups"),
          sum(when(col("reason") === "near_duplicate", 1L).otherwise(0L)).as("near_dups"),
          md5(concat_ws(";", sort_array(collect_list(droppedEntry)))).as("dropped_digest"))
        .withColumn("method", lit(dd.method))
        .withColumn("simhash_k", lit(dd.simHashK))
        .withColumn("simhash_threshold", lit(dd.simHashThreshold))
        .withColumn("window", lit(dd.window))
        .withColumn("generated_at", current_timestamp())
        .write.mode(SaveMode.Overwrite).json(s"${args.out}/report_json")
    }
  }
}
