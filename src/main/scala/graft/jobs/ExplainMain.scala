package graft.jobs

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: formatted plans of the round-5 q67-q72 operators at
  * sf0.01 (planning only — no job execution beyond tiny driver collects in
  * kmeans init/update).
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"\n===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
