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
    // LEFT join + coalesce(tf, 1), not inner: a vocab from tokenStats'
    // default minTf=2 omits exactly the tokens with corpus tf = 1, whose
    // weight floor(log2(1)) = 0 the coalesce reproduces EXACTLY — an inner
    // join instead shrinks the denominator, making a gibberish doc full of
    // unique tokens score HIGH on its few common words (the opposite of
    // the signal's purpose). Same discipline as [[tfidfKeywords]]'s
    // dfTable; spec-pinned at the default-minTf vocab.
    val perDoc = toks
      .join(counts, Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(log2Floor(coalesce(col("tf"), lit(1L)))).as("l2sum"),
        count(lit(1)).as("n_tokens"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        floor(coalesce(col("l2sum"), lit(0L)) * 10000.0 /
          greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L))).as("uni_score_bp"))
  }

  /** Default keywords kept per document. */
  val KeywordsK = 5

  /** Per-doc keyword extraction: the top-k tokens by tf-over-df, the
    * corpus-relative "what is this document about" signal (tagging /
    * clustering / mixture analysis input in a curation pipeline).
    *
    * Scoring is DELIBERATELY tf/df rather than tf·log(N/df): as a per-doc
    * RANKING both reward tokens frequent here and rare corpus-wide, but a
    * float log2/ln is rounded differently across engines (a 1-ulp
    * disagreement near a tie flips the top-k set), while
    * floor(tf·10000/df) is one exact integer product (tf·10⁴ < 2^53
    * always, since tf is bounded by a document's token count) followed by
    * one correctly-rounded IEEE division and a floor — bit-identical in
    * Spark and DuckDB, the same discipline as every other _bp column.
    * Ties (same score) break on the token ascending, so the kept set is a
    * pure function of the corpus on both engines.
    *
    * Scale shape: (doc_id, token) groupBy for tf (ONE exchange with
    * map-side partials — the word-count shape), df by a token-keyed groupBy
    * (second exchange, vocabulary-sized output), tf⋈df on the token (AQE
    * broadcasts the vocab side when it fits), then one doc_id exchange for
    * the per-doc top-k window — which Spark 4 executes as WindowGroupLimit,
    * pruning each map partition to its local top-k BEFORE the exchange, so
    * the window shuffle carries ~k rows per (partition, doc), not every
    * (doc, token) pair.
    *
    * Deliberate plan choice, eyes open: without a precomputed `dfTable`,
    * the df branch re-runs the scan→explode→partial-agg subtree (the
    * formatted plan shows two scans — column pruning makes the branches'
    * exchanges non-identical, so ReuseExchange cannot merge them, the q23
    * lesson). The two rejected single-pass shapes are WORSE at 10^12 docs:
    * a count-over-token window on one explicit exchange (q23's own fix)
    * puts every occurrence row of a stop word into ONE window partition —
    * a guaranteed straggler, where q23 had a semantic df-cap to lean on
    * and a keyword ranking does not; persisting the tf table caches a
    * corpus-scale intermediate to dodge a map-only recompute. Two perfectly
    * parallel map passes is the cheapest honest plan — and a production
    * pipeline passes `dfTable` (one [[tokenStats]] pass, reused across
    * every query of the corpus), which makes this single-pass anyway: the
    * same precompute-and-broadcast discipline as [[unigramScore]]'s
    * `vocab`.
    */
  def tfidfKeywords(docs: DataFrame, k: Int = KeywordsK,
      dfTable: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(asciiTokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = dfTable.getOrElse(
      tf.groupBy(col("token")).agg(count(lit(1)).as("df")))
    // LEFT join + coalesce(df, 1), not inner: a dfTable from tokenStats'
    // default minTf=2 omits exactly the tokens with corpus tf = 1 — whose
    // df is therefore EXACTLY 1 — so the coalesce makes the documented
    // fast path bit-identical to the self-computed one (an inner join
    // would silently drop a doc's rarest, highest-scoring keywords).
    // For minTf > 2 the bound loosens (absent ⇒ df <= minTf - 1 but
    // coalesced to 1, overscoring the dropped tail) — spec-pinned at the
    // default.
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_bp").desc, col("token").asc)
    tf.join(df, Seq("token"), "left")
      .withColumn("df", coalesce(col("df"), lit(1L)))
      .withColumn("score_bp", floor(col("tf") * 10000.0 / col("df")))
      .withColumn("krank", row_number().over(w).cast("long"))
      .filter(col("krank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score_bp"), col("krank"))
  }
}
