package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture suite for the source-mixture report: known per-source
  * doc/token/dup counts must come out exactly, and the balanced rate must
  * equalize token mass (the min-token source at exactly 10000 bp).
  */
class MixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("sourceMixture: planted counts, dup fraction, balanced rate") {
    import spark.implicits._
    // srcA: 4 docs, one exact dup pair (after normalize: case folds), 12 tokens
    // srcB: 2 docs, no dups, 4 tokens -> the min-token source
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "srcA", 0L),
      (2L, "ALPHA  beta   gamma", "en", "srcA", 0L), // normalizes == doc 1
      (3L, "one two three four five", "en", "srcA", 0L),
      (4L, "six seven eight nine", "en", "srcA", 0L),
      (5L, "left right", "en", "srcB", 0L),
      (6L, "up down", "en", "srcB", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Mixture.sourceMixture(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // srcA: 4 docs, 3+3+5+4=15 tokens, 3 distinct, dup 1/4 = 2500 bp,
    //       rate = floor(4 * 10000 / 15) = 2666
    assert(got("srcA") == ((4L, 15L, 3L, 2500L, 2666L)), got.toString)
    // srcB: min-token source -> rate exactly 10000
    assert(got("srcB") == ((2L, 4L, 2L, 0L, 10000L)), got.toString)
  }

  test("sourceMixture: deterministic under repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Mixture.sourceMixture(docs).collect().map(_.toSeq).toSet
    val b = Mixture.sourceMixture(docs.repartition(7)).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
