package graft.jobs

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus
import graft.table.SnapshotTable

/** CLI parsing (flag/positional mixing) and the reference's single-FILE
  * artifact contract (result.md / chunks_raw.jsonl / dedupe_report.json —
  * cmd/pipeline/main.go:231,259,276).
  */
class SubmitMainSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("parse: flags and positionals mix without slot misassignment") {
    val a = SubmitMain.parse(Array("--emit-report", "/sf", "/out", "64"))
    assert(a.emitReport && a.sfDir == "/sf" && a.out == "/out")
    assert(a.buckets == 64, "third positional is buckets even after a flag")
    assert(a.maxPerRun == Int.MaxValue)

    val b = SubmitMain.parse(Array("/sf", "/out", "8", "2", "3"))
    assert(b.sfDir == "/sf" && b.out == "/out" && b.buckets == 8 &&
      b.maxPerRun == 2 && b.replicate == 3)

    val c = SubmitMain.parse(Array("--sf-dir", "/sf", "--out", "/out",
      "--dedupe-method", "both", "--window", "9"))
    assert(c.sfDir == "/sf" && c.pipeline.dedupe.method == "both" &&
      c.pipeline.dedupe.window == 9)

    intercept[IllegalArgumentException] {
      SubmitMain.parse(Array("/sf", "/out", "8", "2", "3", "junk"))
    }
  }

  test("single-doc corpus produces the reference's artifact tree (names + shapes)") {
    // build a 1-doc sf dir: docsTable only needs documents.parquet(doc_id, text)
    import spark.implicits._
    val sfDir = Files.createTempDirectory("sf1doc").toString
    Seq(("7", "A modest paragraph of source text that is comfortably long enough to chunk."))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$sfDir/documents.parquet")

    val out = Files.createTempDirectory("subout").toString
    val args = SubmitMain.Args(sfDir = sfDir, out = out, buckets = 2)
    val docs = Corpus.docsTable(spark, sfDir)
    SnapshotTable.runResumable(docs,
      d => ExtractionJob.dedupWith(d, args.pipeline), out, args.buckets)
    SubmitMain.writeSinks(args)
    SubmitMain.writeArtifacts(args)

    // exact reference artifact names at the artifacts root
    val md = Paths.get(out, "artifacts", "result.md")
    val jsonl = Paths.get(out, "artifacts", "chunks_raw.jsonl")
    val report = Paths.get(out, "artifacts", "dedupe_report.json")
    assert(Files.exists(md), "single-doc corpus writes ONE result.md")
    assert(Files.exists(jsonl) && Files.exists(report))

    // result.md: reference finalize contract — title header, single trailing \n
    val mdTxt = Files.readString(md)
    assert(mdTxt.startsWith("# Extracted Notes\n\n"))
    assert(mdTxt.endsWith("\n") && !mdTxt.endsWith("\n\n"))

    // chunks_raw.jsonl: one JSON object per line, Go's sorted key order
    val lines = Files.readAllLines(jsonl)
    assert(!lines.isEmpty)
    assert(lines.asScala.forall(l => l.startsWith("{\"id\":") && l.contains("\"index\":") &&
      l.contains("\"len\":") && l.contains("\"text\":")))

    // dedupe_report.json: the reference's exact key set (report.go:13-31)
    val rep = Files.readString(report)
    for (k <- Seq("input_images", "input_chunks", "kept_chunks", "dropped_chunks",
        "exact_duplicates", "near_duplicates", "config", "dropped", "timestamp"))
      assert(rep.contains("\"" + k + "\""), s"report must carry key $k")
    assert(rep.contains("\"simhash_k\": 5") && rep.contains("\"window\": 250"))

    // stats are consistent with the committed table
    val table = SnapshotTable.read(out)
    val kept = table.filter(col("kept")).count()
    assert(rep.contains(s""""kept_chunks": $kept"""))
  }

  test("distributed per-doc tree is byte-identical to the driver-loop tree (2-doc corpus)") {
    import spark.implicits._
    val sfDir = Files.createTempDirectory("sf2doc").toString
    Seq(
      ("3", "First document body with a paragraph long enough to survive the chunker."),
      ("9", "Second document body, also comfortably beyond the minimum chunk length."))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$sfDir/documents.parquet")
    val out = Files.createTempDirectory("subout2").toString
    val args = SubmitMain.Args(sfDir = sfDir, out = out, buckets = 2)
    SnapshotTable.runResumable(Corpus.docsTable(spark, sfDir),
      d => ExtractionJob.dedupWith(d, args.pipeline), out, args.buckets)

    // small-corpus contract: driver loop writes result_md/<doc_id>.md
    SubmitMain.writeArtifacts(args)
    // scale contract: docLimit forced below nDocs -> distributed partitionBy
    SubmitMain.writeArtifacts(args, docLimit = 1L)

    for (docId <- Seq("3", "9")) {
      val driver = Files.readString(Paths.get(out, "artifacts", "result_md", s"$docId.md"))
      val partDir = Paths.get(out, "artifacts", "result_md_dist", s"doc_id=$docId")
      val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(
          Files.list(partDir).iterator()).asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
      assert(parts.size == 1, s"expected one text part for doc $docId, got $parts")
      val dist = Files.readString(parts.head)
      assert(dist == driver, s"doc $docId: distributed tree diverges from driver tree")
    }
  }

  private implicit class JavaListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
  }
}
