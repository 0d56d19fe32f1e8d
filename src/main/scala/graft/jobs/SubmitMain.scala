package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.ops.Corpus
import graft.table.SnapshotTable

/** spark-submit entry point (north_star: "runs via spark-submit with
  * explicit doc_id-salted repartitioning, Iceberg snapshot-based
  * checkpointing so a killed run resumes at partition granularity, and
  * per-partition lineage + extraction metrics written to a metrics table").
  *
  * Usage:
  *   spark-submit --class graft.jobs.SubmitMain <jar> \
  *     <sfDir> <outRoot> [nBuckets=32] [maxBucketsPerRun=all] [replicate=1]
  *
  * Re-running after a kill resumes from the last committed snapshot.
  */
object SubmitMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outRoot = args(1)
    val nBuckets = if (args.length > 2) args(2).toInt else 32
    val maxPerRun = if (args.length > 3) args(3).toInt else Int.MaxValue
    val replicate = if (args.length > 4) args(4).toInt else 1

    implicit val spark: SparkSession = SparkSession.builder()
      .appName("graft-extraction")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Corpus.docsTable(spark, sfDir, replicate)
    val t0 = System.nanoTime()
    val ran = SnapshotTable.runResumable(
      docs, d => ExtractionJob.outputSpans(d), outRoot, nBuckets, maxPerRun)
    val sec = (System.nanoTime() - t0) / 1e9

    val done = SnapshotTable.completedBuckets(outRoot)
    println(s"[graft] completed buckets this run: ${ran.toSeq.sorted.mkString(",")}")
    println(f"[graft] cumulative: ${done.size}/$nBuckets buckets, $sec%.1fs")
    if (done.size == nBuckets) {
      val m = SnapshotTable.metrics(outRoot)
      val rows = m.agg(org.apache.spark.sql.functions.sum("n_rows")).head.getLong(0)
      val nDocs = m.agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0)
      println(s"[graft] table complete: $nDocs docs, $rows span rows")
    }
    spark.stop()
  }
}
