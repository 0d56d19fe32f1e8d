package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: the full extraction pipeline (assemble -> chunk ->
    * chrome -> exact+simhash dedup -> output span sequence) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    jobs.ExtractionJob.outputSpans(
      ops.Corpus.docsTable(spark, "/root/testdata/sf0.001"))(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables — EVERY query has one (the hash kernels, greedy
    * windowed dedup, minhash/ANN and connected components are recomputed
    * independently in DuckDB SQL by graft.OracleHash / the recursive
    * CTEs in Queries.oracle, not read back from Spark output).
    */
  def oracleSql: Map[String, String] = Queries.oracle
}
