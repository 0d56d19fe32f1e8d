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
}
