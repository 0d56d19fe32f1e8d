package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query in a loop under the bench session config so
  * the process can be stack-sampled (jstack) while hot.
  * Usage: runMain graft.tools.QLoop <name> [sfDir] [reps]
  */
object QLoop {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // "pipeline" pseudo-name: the Bench headline (outputSpans over the
    // replicated corpus) so the hot loop can be stack-sampled too
    def run(): Long =
      if (name == "pipeline") {
        val docs = graft.ops.Corpus.docsTable(spark, sfDir,
          sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "8").toInt)
        graft.jobs.ExtractionJob.outputSpans(docs)(spark).count()
      } else graft.Queries.queries(name)(spark, sfDir).count()
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = run()
      println(f"rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
