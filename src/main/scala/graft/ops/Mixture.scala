package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture surface over `documents.source`: per-source composition
  * stats (docs, tokens, exact-dup fraction) and the balanced downsampling
  * rate that equalizes token mass across sources — the "data mixing" step
  * (Pile/Dolma-style source weighting) that sits between dedup and
  * sequence packing in an LLM data pipeline. (The reference is a
  * single-corpus batch tool — cmd/pipeline/main.go:90-131 — with no
  * source/mixture surface; graft-added §2.9.)
  *
  * Scale shape: the corpus is traversed ONCE — a (source, hash)-keyed
  * partial-distinct exchange then the source-keyed final (Spark's standard
  * two-phase count-distinct; both exchanges carry per-partition partial
  * rows over the 8-byte normalized-content hash — text never shuffles).
  * The min-token scalar comes from an unbounded window over the AGGREGATED
  * rows (#sources of them — domain-bounded, the same documented exception
  * as the q53 histogram window); the tempting `stats.agg(min).crossJoin
  * (broadcast(...))` form instead plans a SECOND full aggregation subtree
  * (DataFrame reuse is by plan, not by materialization), re-scanning and
  * re-hashing the whole corpus for one scalar. Ratios are integer basis
  * points, floor'd from the same double expression on both engines, so the
  * DuckDB oracle compares exactly.
  */
object Mixture {

  /** Per-source mixture report: `n_docs`, `n_tokens` (whitespace tokens),
    * `n_distinct` (distinct docs by fnv1a64 of normalized text — the exact
    * dedup key of the A1 surface, so "duplicate" means the same thing here
    * as in the dedup kernels), `dup_frac_bp`, and `rate_bp` — the balanced
    * mixture rate floor(min_source_tokens * 10000 / n_tokens), i.e. the
    * per-source downsampling factor that equalizes token mass across
    * sources. Apply it deterministically with [[Splits.bucketOf]] on
    * doc_id (rate scaled to the bucket count), exactly as
    * [[Splits.stratifiedSample]] applies per-stratum rates.
    */
  def sourceMixture(docs: DataFrame): DataFrame = {
    val stats = docs
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("ntok"),
        Exprs.fnv1a64(Exprs.normCol(col("text"))).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        countDistinct(col("h")).as("n_distinct"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    stats
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_distinct"),
        floor((col("n_docs") - col("n_distinct")) * 10000.0 / col("n_docs"))
          .as("dup_frac_bp"),
        floor(min(col("n_tokens")).over(all) * 10000.0 / col("n_tokens"))
          .as("rate_bp"))
  }

  val MixSalt = "|mix|v1"

  /** Apply the mixture: keep each doc with its source's balanced rate via
    * the content-addressed coin — the materialization step that turns the
    * [[sourceMixture]] REPORT into the actual token-balanced corpus.
    * The keep test cross-multiplies exact integers (coin/buckets <
    * rate_bp/10000 ⟺ coin·10000 < rate_bp·buckets): no scaled-rate
    * rounding choice to disagree on across engines.
    *
    * Scale shape: the rate table is #sources rows — broadcast (explicitly;
    * it is derived from an aggregation, so letting AQE discover its size
    * costs a shuffle first), making the whole apply a map-side join +
    * filter over one corpus scan. Pass a precomputed `mixture` to skip
    * the stats pass entirely (the report is usually computed once and
    * reviewed before being applied).
    *
    * The applied rate is floored at 1 bp: a source holding more than
    * 10000x the minimum source's tokens reports rate_bp = 0 (the report
    * states the true truncated ratio), but applying a literal zero would
    * drop that source ENTIRELY — the head crawl silently vanishing from
    * the mix is strictly worse than keeping ~1/10000 of it, and a
    * token-balancing step must never zero a source. Mirrored in the q72
    * oracle (greatest(rate_bp, 1)).
    */
  def applyMixture(docs: DataFrame, mixture: Option[DataFrame] = None): DataFrame = {
    val rates = mixture.getOrElse(sourceMixture(docs))
      .select(col("source"), col("rate_bp"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("coin", Splits.bucketOf(col("doc_id"), MixSalt, Splits.SampleBuckets))
      .join(broadcast(rates), Seq("source"))
      .filter(col("coin") * lit(10000L) <
        greatest(col("rate_bp"), lit(1L)) * lit(Splits.SampleBuckets.toLong))
      .select(col("doc_id"), col("source"), col("coin"), col("rate_bp"))
  }
}
