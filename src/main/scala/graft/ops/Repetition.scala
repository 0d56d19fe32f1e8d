package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition signals (Gopher-style, Rae et al. 2021 App. A) over the
  * `documents` table: duplicate-line fraction, duplicate-line character
  * fraction, and top-bigram character fraction — the cheap structural
  * filters every web-scale training-data pipeline applies before the
  * expensive cross-doc dedup. (The reference has no per-doc repetition
  * surface — its dedup is cross-chunk, `internal/dedupe/dedupe.go:193-257`;
  * this is a graft-added §2.9 operator.)
  *
  * Everything is WITHIN-ROW: lines/bigrams of one document never leave its
  * row, so the whole operator is a map-only stage — zero exchanges at any
  * corpus scale. The alternative relational form (explode lines → groupBy
  * (doc_id, line) → groupBy doc_id) costs two exchanges carrying per-LINE
  * rows; since every metric here is a function of one document alone,
  * paying a shuffle for it would be pure overhead. The per-row folds are
  * interpreted HOFs (Spark executes lambda bodies interpreted), but they
  * run over LINES and TOKEN BIGRAMS — 1-2 orders fewer elements than the
  * per-character folds we already moved to native codegen (RollingHashExpr)
  * — and the fold bodies are O(1) per element.
  *
  * Exact tie-free definitions (ratios as floor(x*10000) basis points, so
  * the DuckDB oracle compares exactly):
  *  - lines   = non-empty '\n'-separated segments (no trimming);
  *  - dup_line_frac        = (n_lines - n_distinct_lines) / n_lines —
  *    occurrences beyond the first count as duplicates;
  *  - dup_line_char_frac   = chars in those beyond-first occurrences /
  *    chars in all lines;
  *  - top_bigram_char_frac = max over distinct token bigrams of
  *    (count * length(bigram)) / chars in the document — the max of the
  *    PRODUCT, not count-then-length, so ties cannot make the answer
  *    depend on which gram an engine happens to pick.
  */
object Repetition {

  private def lines(text: Column): Column =
    filter(split(text, "\n"), l => l =!= "")

  /** Duplicate-line fraction in basis points, as a single reusable Column —
    * THE canonical definition (identical arithmetic to the `dup_line_frac_bp`
    * emitted by [[signals]]; RepetitionSpec pins the two equal row-by-row),
    * shared with the curation-manifest capstone ([[Curation.manifest]]).
    */
  def dupLineFracBp(text: Column): Column = {
    val ls = lines(text)
    floor((size(ls) - size(array_distinct(ls))) * 10000.0 /
      greatest(size(ls), lit(1)))
  }

  /** Token bigrams joined by one space; empty below 2 tokens. */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(slice(toks, lit(1), size(toks) - 1),
        (t, i) => concat(t, lit(" "), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  private def charSum(arr: Column): Column =
    aggregate(arr, lit(0L), (a, l) => a + length(l))

  /** Longest (count * gram-length) over equal runs of a SORTED gram array —
    * the within-row twin of "groupBy gram, max(count*len)". The fold state
    * carries (previous gram, current run length, best chars so far); the
    * zero's empty-string sentinel cannot collide with a real bigram (every
    * bigram contains the joining space).
    */
  private def topRunChars(sortedGrams: Column): Column =
    aggregate(
      sortedGrams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, g) => {
        val run = when(g === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(st.getField("best"), run * length(g)).as("best"))
      },
      st => st.getField("best"))

  def signals(docs: DataFrame): DataFrame = {
    val ls = lines(col("text"))
    val dls = array_distinct(ls)
    val toks = TextAnalysis.tokens(col("text"))
    docs
      .select(col("doc_id"), col("text"), ls.as("ls"), dls.as("dls"),
        sort_array(bigrams(toks)).as("grams"))
      .select(
        col("doc_id"),
        size(col("ls")).cast("long").as("n_lines"),
        floor((size(col("ls")) - size(col("dls"))) * 10000.0 /
          greatest(size(col("ls")), lit(1))).as("dup_line_frac_bp"),
        floor((charSum(col("ls")) - charSum(col("dls"))) * 10000.0 /
          greatest(charSum(col("ls")), lit(1L))).as("dup_line_char_frac_bp"),
        floor(topRunChars(col("grams")) * 10000.0 /
          greatest(length(col("text")), lit(1))).as("top_bigram_char_frac_bp"))
  }

  val DefaultDupN = 10

  /** CORPUS-LEVEL duplicated n-gram fraction (the RefinedWeb/FineWeb
    * `dup_ngram` family): for each doc, the fraction of its token n-gram
    * POSITIONS whose gram occurs >= `minCount` times across the WHOLE
    * corpus (within-doc repeats count toward the total — a doc repeating
    * its own boilerplate flags itself). The signal the within-row
    * [[signals]] cannot see: text duplicated across documents at
    * sub-document granularity, the tail exact-substring dedup misses.
    *
    * Scale shape: grams are hashed to 64-bit fnv MAP-SIDE, so every
    * exchange carries (doc_id, long) — never gram strings (a 10-token gram
    * is ~70 bytes; the hash is 8). Three exchanges, the honest minimum for
    * any corpus-relative signal: the gram-hash groupBy (map-side partial
    * count), the hash join of positions against the duplicated set (AQE
    * broadcasts it when the duplicated vocabulary fits), and the doc_id
    * aggregation of surviving positions. A 64-bit collision marks a
    * position duplicated spuriously (~n²/2^64 — irrelevant at 10^12 grams
    * for a per-doc FRACTION in basis points, and the DuckDB oracle computes
    * the identical hash, so parity is exact regardless).
    */
  /** Exact-substring dedup (the Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better" family, n-gram approximated): every
    * token position whose n-gram occurs >= `minCount` times across the
    * whole corpus is REMOVED — all copies, both sides, like the paper's
    * remove-every-occurrence policy (and unlike doc/paragraph dedup, which
    * keeps a winner). A maximal duplicated run of m >= n tokens contributes
    * m-n+1 duplicated gram starts whose [start, start+n) cover exactly its
    * m tokens, so this removes all duplicated substrings of length >= n
    * without building suffix arrays. Output per doc: token counts and the
    * cleaned text (surviving tokens rejoined by single spaces).
    *
    * Scale shape: gram hashes travel as (doc_id, pos, 8-byte fnv) — never
    * gram strings (shared machinery with [[corpusDupNgrams]], so the
    * DuckDB oracle recomputes the identical hash). Exchanges: the gram-hash
    * groupBy (map-side partials), the positions⋈duplicated-set hash join
    * (AQE broadcasts a small dup vocabulary), the doc_id agg of matched
    * starts, and ONE doc_id join back to the token arrays — the splice
    * itself is a per-row Column HOF (tokens never explode into an
    * exchange; matched starts per doc are bounded by the doc's own token
    * count). No suffix array, no sort of the corpus, no driver state.
    */
  /** Sliding n-grams of a token array as a compiled UDF — the HOF
    * transform+array_join(slice) form runs an interpreted lambda per gram
    * (~23 µs each, measured; see Decontaminate.ngrams for the identical
    * finding and Similarity.shinglesU for the round-3 precedent).
    */
  private val gramsOfTokensU = udf { (toks: Seq[String], n: Int) =>
    if (toks == null || toks.length < n) Array.empty[String]
    else toks.sliding(n).map(_.mkString(" ")).toArray
  }

  def exactSubstringDedup(docs: DataFrame, n: Int = DefaultDupN,
      minCount: Long = 2L): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(translate(col("text"),
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")).as("tk"))
    val grams = gramsOfTokensU(col("tk"), lit(n))
    val pos = toks.select(col("doc_id"), posexplode(grams))
      .select(col("doc_id"), col("pos"), Exprs.fnv1a64(col("col")).as("h"))
    val dup = pos.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select(col("h"))
    val starts = pos.join(dup, Seq("h"))
      .groupBy(col("doc_id")).agg(collect_set(col("pos")).as("starts"))
    val st = coalesce(col("starts"), array().cast("array<int>"))
    val kept = filter(col("tk"),
      (t, i) => not(exists(st, s => s <= i && i < s + n)))
    toks.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(kept)).cast("long").as("n_removed"),
        concat_ws(" ", kept).as("cleaned"))
  }

  def corpusDupNgrams(docs: DataFrame, n: Int = DefaultDupN,
      minCount: Long = 2L): DataFrame = {
    val pos = docs.select(col("doc_id"),
      explode(Decontaminate.ngrams(col("text"), n)).as("gram"))
      .select(col("doc_id"), Exprs.fnv1a64(col("gram")).as("h"))
    val dup = pos.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select(col("h"))
    val perDoc = pos
      .join(dup, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    docs.select(col("doc_id"),
        greatest(size(TextAnalysis.tokens(translate(col("text"),
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")))
          - (n - 1), lit(0)).cast("long").as("n_pos"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_pos"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        floor(coalesce(col("n_dup"), lit(0L)) * 10000.0 /
          greatest(col("n_pos"), lit(1L))).as("dup_ngram_frac_bp"))
  }
}
