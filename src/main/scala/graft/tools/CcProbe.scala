package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the q38 composition stage by stage (pairs vs CC rounds)
  * under the bench session config, printing per-round CcRoundStats.
  * Usage: runMain graft.tools.CcProbe [sfDir] [reps]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (r <- 1 to reps) {
      println(s"rep $r")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val pairs = graft.ops.Similarity.simhashDocPairs(docs, 5, 6)
      t("pairs count")(pairs.count())
      val stats = scala.collection.mutable.Buffer.empty[graft.ops.LshDedup.CcRoundStat]
      val w = t("clusterWinners build")(
        graft.ops.LshDedup.clusterWinners(pairs, stats = Some(stats)))
      t("winners count")(w.count())
      stats.foreach(s => println(s"  $s"))
    }
    spark.stop()
  }
}
