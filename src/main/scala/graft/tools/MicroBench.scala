package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Corpus, Exprs}

/** Dev tool: steal-resistant A/B timing of the fused NormalizeExpr vs the
  * 4-pass regex chain — ALTERNATING reps inside one JVM so a co-tenant
  * CPU-steal burst hits both variants symmetrically; per-variant best and
  * median are reported. Usage: runMain graft.tools.MicroBench [sfDir] [reps]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // chunk-shaped input: the chunker's actual normalize workload
    val chunks = graft.jobs.ExtractionJob.chunks(Corpus.docsTable(spark, sfDir, 24))
      .select("text").persist()
    println(s"rows: ${chunks.count()}")

    def time(c: Column): Double = {
      val t0 = System.nanoTime()
      chunks.select(sum(length(c))).head()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up both
    time(Exprs.normCol(col("text"))); time(Exprs.normColRegex(col("text")))
    val fused = collection.mutable.ArrayBuffer.empty[Double]
    val chain = collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      fused += time(Exprs.normCol(col("text")))
      chain += time(Exprs.normColRegex(col("text")))
    }
    def stats(xs: Seq[Double]) = f"best ${xs.min}%.2fs median ${xs.sorted.apply(xs.size / 2)}%.2fs all ${xs.map(x => f"$x%.2f").mkString(",")}"
    println(s"fused  : ${stats(fused.toSeq)}")
    println(s"regex  : ${stats(chain.toSeq)}")
    println(f"speedup (best/best): ${chain.min / fused.min}%.2fx")

    // second A/B: q31's rolling hash — native codegen expression vs the
    // interpreted per-character HOF fold, same alternating-reps discipline
    def timeD(c: Column): Double = {
      val t0 = System.nanoTime()
      chunks.select(sum(c)).head()
      (System.nanoTime() - t0) / 1e9
    }
    timeD(Exprs.rollingHash(col("text")))
    timeD(graft.ops.TextAnalysis.rollingHashHof(col("text")))
    val native = collection.mutable.ArrayBuffer.empty[Double]
    val hof = collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      native += timeD(Exprs.rollingHash(col("text")))
      hof += timeD(graft.ops.TextAnalysis.rollingHashHof(col("text")))
    }
    println(s"rollN  : ${stats(native.toSeq)}")
    println(s"rollHOF: ${stats(hof.toSeq)}")
    println(f"rolling speedup (best/best): ${hof.min / native.min}%.2fx")
    spark.stop()
  }
}
