package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for the given query names
  * (default: the flagship pipeline) so shuffle counts and codegen spans can
  * be reviewed. Usage: runMain graft.tools.Explain <sfDir> [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q17_pipeline_spans")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      graft.Queries.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
