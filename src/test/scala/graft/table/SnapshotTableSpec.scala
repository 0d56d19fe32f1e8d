package graft.table

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus
import graft.jobs.ExtractionJob

/** Kill-and-resume at partition granularity (SURVEY.md §7.5 / north_rule):
  * a run that commits only some buckets must resume from the manifest,
  * complete the rest, and never duplicate or lose rows — including when the
  * kill left uncommitted partial data on disk.
  */
class SnapshotTableSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private def pipeline(docs: org.apache.spark.sql.DataFrame) =
    ExtractionJob.outputSpans(docs)(spark)

  test("kill-and-resume: partial run + resume == single full run, no dup rows") {
    val root = Files.createTempDirectory("snap").toString
    val docs = Corpus.docsTable(spark, sfDir)
    val nBuckets = 8

    // "killed" run: commits only 3 buckets
    val first = SnapshotTable.runResumable(docs, pipeline, root, nBuckets, maxBucketsPerRun = 3)
    assert(first.size == 3)
    assert(SnapshotTable.completedBuckets(root) == first)

    // resume: completes the rest, skips committed buckets
    val second = SnapshotTable.runResumable(docs, pipeline, root, nBuckets)
    assert(second.size == nBuckets - 3)
    assert(first.intersect(second).isEmpty)
    assert(SnapshotTable.completedBuckets(root) == (0 until nBuckets).toSet)

    // nothing left to do
    assert(SnapshotTable.runResumable(docs, pipeline, root, nBuckets).isEmpty)

    // resumed table == direct full pipeline output, row for row
    val got = SnapshotTable.read(root).drop("bucket")
      .collect().map(_.toSeq).sortBy(_.toString)
    val expected = pipeline(docs)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == expected.length)
    assert(got.toSeq == expected.toSeq)

    // lineage metrics cover every bucket exactly once
    val m = SnapshotTable.metrics(root)
    assert(m.select("bucket").distinct().count() == nBuckets)
    assert(m.agg(sum("n_rows")).head.getLong(0) == expected.length.toLong)
  }

  test("uncommitted partial data is discarded on resume (no duplicates)") {
    val root = Files.createTempDirectory("snap2").toString
    val docs = Corpus.docsTable(spark, sfDir)
    val nBuckets = 4

    SnapshotTable.runResumable(docs, pipeline, root, nBuckets, maxBucketsPerRun = 2)
    // simulate a kill AFTER data write but BEFORE manifest commit for bucket 2:
    // write garbage partial data into an uncommitted bucket dir
    val partial = new java.io.File(s"$root/data/bucket=2")
    partial.mkdirs()
    pipeline(docs.limit(5)).drop("doc_id").withColumn("doc_id", lit("zzz"))
      .write.mode("append").parquet(partial.toString)

    SnapshotTable.runResumable(docs, pipeline, root, nBuckets)
    val got = SnapshotTable.read(root).drop("bucket")
      .collect().map(_.toSeq).sortBy(_.toString)
    val expected = pipeline(docs)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == expected.toSeq, "partial uncommitted data must not leak into the table")
  }
}
