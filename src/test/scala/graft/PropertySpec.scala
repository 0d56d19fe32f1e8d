package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.kernel._
import graft.ops.Corpus

/** Property-based span-sequence equality: RANDOM adversarial documents
  * (unicode whitespace, CRLF, chrome lines, near-duplicate paragraphs,
  * empty/short spans) through the full distributed pipeline must equal the
  * sequential kernel, row for row. The round-2 Unicode-TrimSpace divergence
  * was exactly the class of bug a generator finds and example tests miss.
  */
class PropertySpec extends AnyFunSuite {

  // no scalatest-scalacheck bridge in the offline cache: drive Gen directly
  // with FIXED seeds — deterministic, replayable, still generator-powered
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val wordGen = Gen.oneOf(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "café", "über", "naïve", "żółć", "日本語", "कखग", "wifi", "battery",
    "12", "34pm", "100", "résumé")
  private val sepGen = Gen.oneOf(" ", "  ", "\t", " ", " ", " \r ")
  private val lineGen = for {
    n <- Gen.choose(1, 14)
    ws <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(n, sepGen)
  } yield ws.zip(seps).map { case (w, s) => w + s }.mkString.trim
  private val paraGen = for {
    n <- Gen.choose(1, 4)
    ls <- Gen.listOfN(n, lineGen)
    crlf <- Gen.oneOf("\n", "\r\n")
  } yield ls.mkString(crlf)
  private val docGen = for {
    n <- Gen.choose(1, 10)
    ps <- Gen.listOfN(n, paraGen)
    dupAt <- Gen.choose(0, math.max(0, n - 1))
    withDup <- Gen.oneOf(true, false)
    blanks <- Gen.oneOf("\n\n", "\n\n\n", "\n \n", "\r\n\r\n")
  } yield (if (withDup) ps :+ ps(dupAt) else ps).mkString(blanks)

  test("property: distributed pipeline == sequential kernel on random documents") {
    import spark.implicits._
    // a batch of generated docs per pass keeps Spark job count sane
    for (seed <- 1L to 8L) {
      val texts = sample(Gen.listOfN(24, docGen), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (s"p$i", t) }
      val frame = docs.toDF("doc_id", "t")
        .select(col("doc_id"), array(struct(
          lit("text").as("kind"), col("t").as("text"),
          lit("").as("media_ref"), lit(0).as("offset"))).as("spans"))
      val got = jobs.ExtractionJob.outputSpans(frame)(spark)
        .collect().map(r => (r.getString(0), (r.getString(2), r.getLong(4))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._2).map(_._1).toSeq).toMap
      for ((docId, t) <- docs) {
        val chunks = TextKernel.chunkText(t, Corpus.MinChunkChars)
        val filtered = TextKernel.filterChrome(
          chunks, TextKernel.defaultChromePatterns, Corpus.ChromeMaxLength)
        val expected = DedupeKernel.dedupe(filtered, DedupeConfig()).kept.map(_.text)
        val actual = got.getOrElse(docId, Seq.empty)
        assert(actual == expected,
          s"seed $seed: mismatch for generated doc $docId: ${t.take(120).replace("\n", "\\n")}")
      }
    }
  }

  test("property: fused normalize == regex chain on random strings") {
    import spark.implicits._
    val junkGen = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.oneOf(" ", "\t", "\n", "\r", ".", "!", "%"),
      Gen.oneOf("é", "Ω", "ß", "٣", "７", "𝔘", "😀", " ", "　")))
      .map(_.mkString)
    for (seed <- 1L to 8L) {
      val ss = sample(Gen.listOfN(60, junkGen), seed)
      val bad = ss.toDF("s")
        .select(ops.Exprs.normCol(col("s")).as("a"), ops.Exprs.normColRegex(col("s")).as("b"))
        .filter(col("a") =!= col("b")).collect()
      assert(bad.isEmpty, s"seed $seed: " + bad.take(3).mkString("; "))
    }
  }
}
