package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level vocabulary statistics and the unigram-frequency document
  * score built on them — the tokenizer-training and language-model-free
  * quality-proxy surface of a training-data pipeline (no reference
  * analogue; graft-added §2.9).
  *
  * Scale shapes:
  *  - [[tokenStats]]: explode tokens map-side → ONE exchange keyed by the
  *    token with map-side partial aggregation (the classic word-count; at
  *    100 TB the exchange carries one partial row per (partition, distinct
  *    token), not one per token occurrence). Term frequency and document
  *    frequency come out of the same groupBy (Spark plans the distinct
  *    doc_id count as a two-phase partial-distinct aggregate).
  *  - [[unigramScore]]: corpus counts joined back to the exploded tokens.
  *    The join keys on the TOKEN (big-big shuffle join by default; AQE
  *    turns it into a broadcast when the vocab fits, which it does for
  *    ASCII web text), then one doc_id exchange for the per-doc sum.
  *    Three token-keyed exchanges total for a corpus-relative signal —
  *    the honest cost of any TF-based score; there is no map-only form
  *    unless the vocab is precomputed and broadcast (pass `vocab` to do
  *    exactly that).
  *
  * Tokens are ASCII-lowercased with translate (not lower()) because they
  * are JOIN/GROUP KEYS — see OracleSql.asciiLower for why engine lower()s
  * cannot be trusted across engines. The per-token weight is
  * floor(log2(tf)) computed as length(bin(tf)) - 1: pure integer bit
  * arithmetic, exact on both engines, immune to the float-log rounding
  * that would make a cross-engine hash compare flaky.
  */
object Vocab {

  def asciiTokens(text: Column): Column =
    TextAnalysis.tokens(translate(text,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"))

  /** (token, tf, df) over the corpus: term frequency (total occurrences)
    * and document frequency (docs containing it), dropping tokens below
    * `minTf` — the input a BPE/unigram tokenizer trainer actually consumes.
    */
  def tokenStats(docs: DataFrame, minTf: Long = 2L): DataFrame =
    docs
      .select(col("doc_id"), explode(asciiTokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .filter(col("tf") >= minTf)

  /** Adjacent character-pair counts over the corpus, weighted by word
    * frequency — the first merge-candidate table a BPE tokenizer trainer
    * computes (Sennrich et al. 2016: the merge chosen is the argmax of
    * exactly this table).
    *
    * Scale shape — the classic BPE-trainer optimization, distributed:
    * count DISTINCT WORDS first (one token-keyed exchange with map-side
    * partials, one row per distinct word), THEN expand each distinct
    * word's pairs once and weight by its frequency (second exchange keyed
    * by the pair, again partial-aggregated). At 100 TB the pair expansion
    * runs over the vocabulary (millions), not the corpus (trillions of
    * occurrences) — expanding pairs per occurrence would shuffle 2-char
    * strings per token instead.
    *
    * Pair splitting is CHARACTER-based substring (1-indexed, identical
    * semantics in Spark and DuckDB, multibyte-safe); single-char words
    * contribute nothing and are filtered BEFORE the expansion (Spark's
    * sequence(1, 0) would generate a descending sequence, not empty).
    */
  def bpePairCounts(docs: DataFrame, minCount: Long = 2L): DataFrame =
    docs
      .select(explode(asciiTokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
      .filter(length(col("w")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("wf")).as("n"))
      .filter(col("n") >= minCount)

  /** floor(log2(n)) for n >= 1 as exact integer bit arithmetic. */
  def log2Floor(n: Column): Column = (length(bin(n)) - 1).cast("long")

  /** Per-doc unigram-frequency score: mean floor(log2(corpus tf)) of the
    * doc's tokens, in basis points — high for docs made of common words,
    * low for gibberish/rare-token soup; the cheap corpus-relative stand-in
    * for an LM perplexity filter. Every doc keeps a row (empty docs score
    * 0). Pass a precomputed `vocab` (token, tf) to skip the counting pass
    * and broadcast it explicitly.
    */
  def unigramScore(docs: DataFrame, vocab: Option[DataFrame] = None): DataFrame = {
    val counts = vocab.getOrElse(tokenStats(docs, minTf = 1L)).select(col("token"), col("tf"))
    val toks = docs.select(col("doc_id"), explode(asciiTokens(col("text"))).as("token"))
    val perDoc = toks
      .join(counts, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sum(log2Floor(col("tf"))).as("l2sum"), count(lit(1)).as("n_tokens"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        floor(coalesce(col("l2sum"), lit(0L)) * 10000.0 /
          greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L))).as("uni_score_bp"))
  }
}
