package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe keyed join: salt the fact side, replicate the dim side.
  *
  * The motivating case at 100 TB: a fact table keyed on a heavy-tailed
  * column (crawl `source` domains, user ids) joined to a keyed table too
  * large (or too hot) to broadcast. A plain hash join puts EVERY row of a
  * head key in one reduce task — the classic single-straggler shape that
  * AQE's skew-split only fixes for sort-merge joins after the skewed
  * exchange has already been written. Salting fixes it at plan time:
  * facts get a deterministic salt in [0, salts), dims are replicated once
  * per salt, and the join keys on (key, salt) — each head key fans out
  * over `salts` tasks, at the cost of salts× the (small) dim side.
  *
  * The salt is CONTENT-ADDRESSED (fnv1a64 of a caller-chosen unique
  * column, masked to a power of two — same discipline as
  * [[Splits.bucketOf]]): `rand()` would be re-rolled per task attempt,
  * so a retried stage could emit duplicate/missing join rows under
  * non-idempotent sinks. A pure function of the row cannot.
  *
  * The join result is EXACTLY the plain inner join's (the salt column
  * matches by construction and is dropped) — which is what the q67 oracle
  * checks: DuckDB runs the unsalted join.
  *
  * (Reference has no join surface at all; graft-added §2.9. The per-source
  * stats dim here is the usual "domain reputation" enrichment a curation
  * pipeline joins onto every doc.)
  */
object Skew {

  /** Default fact-side fanout per key. */
  val Salts = 16

  /** Inner-join `facts` to `dim` on `key`, salted `salts` ways.
    * `saltOf` must be a per-row deterministic column (typically the fact
    * table's primary key); `salts` a power of two. The shuffle_hash hint
    * keeps the join a shuffled hash join (the large-dim regime this
    * operator models) instead of letting a small test dim broadcast,
    * which would bypass the salted exchange being demonstrated.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltOf: Column, salts: Int = Salts): DataFrame = {
    require(salts > 0 && Integer.bitCount(salts) == 1,
      s"salts must be a power of two, got $salts")
    val fs = facts.withColumn("__salt",
      Exprs.fnv1a64(saltOf.cast("string")).bitwiseAND(lit(salts - 1L)))
    val ds = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    fs.join(ds.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** Per-source reputation dim: doc count + total chars per `source`
    * (exact longs — no float averages to disagree on). Tiny here; stands
    * in for the billion-row domain-stats table of the real pipeline.
    */
  def sourceStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("src_docs"), sum(col("n_chars")).as("src_chars"))

  /** Every doc enriched with its source's stats via the salted join —
    * `source` is the textbook skew key (a handful of head domains carry
    * most of a crawl).
    */
  def enrichBySource(docs: DataFrame, salts: Int = Salts): DataFrame =
    saltedJoin(docs.select(col("doc_id"), col("source")),
      sourceStats(docs), "source", col("doc_id"), salts)
      .select(col("doc_id"), col("source"), col("src_docs"), col("src_chars"))
}
