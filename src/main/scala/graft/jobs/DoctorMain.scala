package graft.jobs

import org.apache.spark.sql.SparkSession

/** Environment probe + smoke test — the graft of the reference's `doctor`
  * subcommand (reference: cmd/pipeline/doctor.go:22-137, which checks the
  * external toolchain; here the "toolchain" is the Spark runtime and the
  * testdata tables) and its `version` subcommand (cmd/pipeline/main.go:105-107).
  *
  * Usage:  runMain graft.jobs.DoctorMain [--sf-dir <dir>] [--smoke] [version]
  */
object DoctorMain {

  /** Library version (the `version` subcommand surface) — read from the
    * sbt-generated resource, so build.sbt's `version` is the single source
    * of truth.
    */
  val Version: String =
    Option(getClass.getResourceAsStream("/graft-version.txt"))
      .map { in =>
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      }
      .getOrElse("unknown")

  val Tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    if (args.contains("version")) { println(s"graft $Version"); return }
    val sfDir = args.sliding(2).collectFirst {
      case Array("--sf-dir", d) => d
    }.getOrElse("/root/testdata/sf0.001")
    val smoke = args.contains("--smoke")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var ok = true
    def check(name: String, pass: Boolean, detail: String): Unit = {
      println(f"[doctor] ${if (pass) "OK  " else "FAIL"} $name%-22s $detail")
      ok &= pass
    }
    check("graft.version", pass = true, Version)
    check("spark.version", spark.version.startsWith("4."), spark.version)
    check("scala.version", util.Properties.versionNumberString.startsWith("2.13"),
      util.Properties.versionNumberString)
    check("java.version", true, System.getProperty("java.version"))
    check("spark.master", true, spark.sparkContext.master)
    check("parallelism", spark.sparkContext.defaultParallelism >= 1,
      spark.sparkContext.defaultParallelism.toString)
    check("shuffle.partitions", true, spark.conf.get("spark.sql.shuffle.partitions"))
    for (t <- Tables) {
      val p = s"$sfDir/$t.parquet"
      val readable = scala.util.Try(spark.read.parquet(p).schema).isSuccess
      check(s"table.$t", readable, p)
    }
    if (smoke) {
      // the reference's --smoke runs a tiny end-to-end pipeline (doctor.go);
      // ours runs the flagship extraction over the probe corpus
      val n = scala.util.Try(
        ExtractionJob.outputSpans(graft.ops.Corpus.docsTable(spark, sfDir))(spark).count())
      check("smoke.pipeline", n.isSuccess && n.getOrElse(0L) > 0L,
        s"output spans: ${n.getOrElse(-1L)}")
    }
    println(s"[doctor] ${if (ok) "all checks passed" else "SOME CHECKS FAILED"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
