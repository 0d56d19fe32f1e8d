package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RanksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("globalRank reproduces the global window rank exactly") {
    import spark.implicits._
    // keys deliberately out of order and spread over all buckets
    val rows = (1 to 997).map(i => s"IMG_${(i * 7919) % 1009}.png").distinct
    val df = rows.toDF("name").repartition(7)
    val got = Ranks.globalRank(df, Exprs.naturalKey(col("name")))
      .select("name", "rank")
    val want = df.withColumn("rank",
      row_number().over(Window.orderBy(Exprs.naturalKey(col("name")))).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "distributed rank diverged from the single-partition window rank")
  }

  test("q11 executed plan has no single-partition exchange") {
    val df = graft.Queries.queries("q11_o1_natural_rank")(spark, "/root/testdata/sf0.001")
    df.collect() // force AQE finalization
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"q11 still funnels through one task:\n$plan")
  }
}
