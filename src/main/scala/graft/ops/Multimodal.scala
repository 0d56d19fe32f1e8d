package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded-media record per media span. The decode payload fields are
  * produced by the STUBBED decoder (see [[Multimodal.decodeBatch]]).
  */
final case class MediaMeta(
    doc_id: String, media_ref: String, format: String,
    n_bytes: Long, width: Long, height: Long, ocr_conf_bp: Long)

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-shaped decode via mapPartitions.
  *
  * The real image/audio decode libraries are NOT in this container, so the
  * decode step is a clearly-marked DETERMINISTIC STUB — the Spark-side
  * plumbing (binary schema, partitioning, batched per-partition execution,
  * typed output) is real and is what the pipeline exercises. Swap
  * [[stubDecode]] for a real codec (or a `mapInPandas`-style Arrow batch UDF
  * on PySpark) without touching any schema.
  */
object Multimodal {

  /** Media spans materialized as (doc_id, media_ref, payload binary).
    * Payload is a deterministic fake body derived from the ref — in
    * production this is the Iceberg/Parquet binary column itself.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    Corpus.spanRows(docs)
      .filter(col("kind") === "media")
      .select(
        col("doc_id"), col("media_ref"),
        encode(concat(lit("IMGDATA:"), col("media_ref"), lit(":"),
          repeat(lit("x"), 64)), "UTF-8").as("payload"))

  /** ==== STUB ==== deterministic fake decode of one payload.
    * Real implementation would parse the container header (PNG IHDR / JPEG
    * SOF0) and run the OCR model; here every derived field is a pure
    * function of the bytes so tests are stable.
    */
  private def stubDecode(ref: String, payload: Array[Byte]): (String, Long, Long, Long, Long) = {
    val fmt = ref.substring(ref.lastIndexOf('.') + 1) match {
      case "png" => "png"
      case "jpg" | "jpeg" => "jpeg"
      case other => other
    }
    val h = graft.kernel.Hashing.fnv1a64(payload)
    // dim bases straddle the default resize maxDim=512 (widths 256..1535,
    // heights 256..975), so ~7% of stub media take resizeBatch's keep
    // branch — the oracle then exercises BOTH `when` arms (the former
    // 640/480 bases made every dim > 512 and the keep branch dead on the
    // whole synthetic corpus)
    val width = 256L + (Math.floorMod(h, 1280L))
    val height = 256L + (Math.floorMod(h >>> 17, 720L))
    val conf = 5000L + Math.floorMod(h >>> 32, 5000L)
    (fmt, payload.length.toLong, width, height, conf)
  }

  /** Batched decode: one partition = one batch stream, mirroring the
    * `mapInPandas` batch shape (Iterator[rows] -> Iterator[rows]) without
    * per-row task overhead. Partitioning is whatever the media table scan
    * gives — decode is embarrassingly parallel, so NO repartition (and no
    * shuffle) is inserted.
    */
  def decodeBatch(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("doc_id", "media_ref", "payload")
      .as[(String, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (docId, ref, payload) =>
          val (fmt, n, w, h, conf) = stubDecode(ref, payload)
          MediaMeta(docId, ref, fmt, n, w, h, conf)
        }
      }
  }

  /** Resize to fit `maxDim` (aspect preserved, integer floor): the
    * dimension PROBE is the batched stub decode; the scaling itself is
    * pure Catalyst arithmetic on top — a real codec swap changes only
    * [[stubDecode]], the scaling plan is production-ready. No shuffle:
    * decode batches + a map-side projection.
    */
  def resizeBatch(media: DataFrame, maxDim: Int = 512)(
      implicit spark: SparkSession): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    decodeBatch(media).toDF()
      .select(
        col("doc_id"), col("media_ref"), col("width"), col("height"),
        when(longest <= maxDim, col("width"))
          .otherwise(floor(col("width") * maxDim / longest)).cast("long").as("out_w"),
        when(longest <= maxDim, col("height"))
          .otherwise(floor(col("height") * maxDim / longest)).cast("long").as("out_h"))
  }

  /** Frame sampling for video-like payloads: every `everyNth` frame of a
    * clip whose frame count comes from the stub container probe (FNV of
    * the payload — a real probe would read the container header). The
    * sampling PLAN is pure Catalyst — `sequence` + `explode`, codegen'd,
    * zero shuffle, fan-out bounded by n_frames/everyNth — which is the
    * part that matters at 100 TB: frame rows never materialize more than
    * the sampled subset.
    */
  def frameSample(media: DataFrame, everyNth: Int = 24, fps: Int = 24): DataFrame =
    media
      .withColumn("h", Exprs.fnv1a64(decode(col("payload"), "UTF-8")))
      .withColumn("n_frames", (pmod(col("h"), lit(240L)) + 1L).cast("long"))
      .select(
        col("doc_id"), col("media_ref"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(everyNth.toLong)))
          .as("frame_idx"))
      .withColumn("ts_ms", floor(col("frame_idx") * 1000.0 / fps).cast("long"))

  /** Catalyst-only metadata projection (format + sizes) — the part of the
    * decode that IS expressible without the stub, used for the oracle query.
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    mediaTable(docs).select(
      col("doc_id"),
      col("media_ref"),
      lower(regexp_extract(col("media_ref"), "\\.([A-Za-z]+)$", 1)).as("ext"),
      octet_length(col("payload")).cast("long").as("n_bytes"))
}
