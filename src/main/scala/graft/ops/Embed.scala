package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.Hashing

/** Deterministic doc -> embedding operator, so the ANN family (q25-q27/q37)
  * runs END-TO-END from the `documents` table instead of requiring a
  * driver-provided `embeddings` input.
  *
  * Same stub discipline as the multimodal decoder (Multimodal.stubDecode):
  * the real thing would be a model-server / ONNX batch call; here the
  * embedding is a FEATURE-HASHING projection (hashed bag-of-words — a real
  * published technique, not a toy: Weinberger et al., "Feature Hashing for
  * Large Scale Multitask Learning", ICML'09) that is a pure deterministic
  * function of the text, so the DuckDB oracle can recompute it exactly.
  * Swapping in a real encoder changes ONLY this projection; every consumer
  * (ANN indexes, cosine dedup) reads the same (id, Array[Float]) shape.
  *
  * Construction: for each whitespace token of asciiLower(text),
  * h = fnv1a64(unsignedDecimalString(fnv1a64(token))) — DOUBLE-hashed,
  * because a single FNV-1a pass does not avalanche trailing-byte deltas
  * into the mid/high bits (the sparse prime moves a last-byte delta only
  * into bits ~0-8 and ~40, see Similarity.hyperplaneSign's trap note):
  * token families differing only in a trailing counter ("w1 w2 w3 ...")
  * collide on the index bits with parity-alternating signs and CANCEL to a
  * zero vector (observed on the first cut of this operator). Rehashing the
  * first hash's ~20-char decimal string smears every input bit across many
  * multiplies. The token then adds sign(bit 40 of h) to coordinate
  * (h >>> 32) % dim. Accumulation is exact INT arithmetic (magnitudes
  * far below 2^24, so the final float cast is lossless) — bit-identical
  * cross-engine, no float-sum order sensitivity.
  *
  * Scale shape: a map-only stage (one compiled UDF pass per doc, no
  * shuffle); the output feeds the bucketed/celled ANN joins unchanged.
  */
object Embed {

  val Dim = 16

  /** The per-token hash: double FNV via the unsigned decimal string of the
    * first pass (see class doc for why one pass is not enough).
    */
  def tokenHash(t: String): Long =
    Hashing.fnv1a64(java.lang.Long.toUnsignedString(Hashing.fnv1a64(t)))

  /** Null text embeds to the ZERO vector, which is exactly what the
    * oracle's dense grid produces for a token-less doc (no NPE, no
    * null-row/zero-row shape divergence); lowering is ASCII-only
    * ([[Similarity.asciiLower]]) so the token bytes entering FNV are
    * identical cross-engine even on İ/ß-class input.
    */
  private def embedU(dim: Int) = udf { (text: String) =>
    val acc = new Array[Long](dim)
    if (text != null) {
      val toks = Similarity.asciiLower(text).split("[\t\n\f\r ]+")
      for (t <- toks if t.nonEmpty) {
        val h = tokenHash(t)
        val idx = ((h >>> 32) % dim).toInt
        acc(idx) += (if (((h >>> 40) & 1L) == 1L) 1L else -1L)
      }
    }
    acc.map(_.toFloat).toSeq
  }

  /** (doc_id, embedding Array[Float]) — drop-in for the `embeddings` table's
    * (vec_id, embedding) shape via a rename at the call site.
    */
  def docEmbeddings(docs: DataFrame, dim: Int = Dim): DataFrame =
    docs.select(col("doc_id"), embedU(dim)(col("text")).as("embedding"))

  /** Oracle surface (q48): the same embeddings exploded to one
    * (doc_id, dim_idx, val) row per coordinate — scalar BIGINT rows hash
    * deterministically in the driver's compare, and the integer cast is
    * exact by construction.
    */
  def docEmbeddingRows(docs: DataFrame, dim: Int = Dim): DataFrame =
    docEmbeddings(docs, dim)
      .select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim_idx", "val")))
      .select(col("doc_id"), col("dim_idx").cast("long").as("dim_idx"),
        col("val").cast("long").as("val"))
}
