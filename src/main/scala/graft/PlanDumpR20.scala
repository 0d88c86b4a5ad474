package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named queries into plans/<round>/ —
  * the optimization rounds' before/after plan evidence.
  *
  * Usage: runMain graft.PlanDumpR20 <round> <suffix> <query>[,<query>...] [sfDir]
  * writes plans/<round>/<query>_<suffix>.txt for each query.
  */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val round = args(0)
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Harness.quietBenignWindowWarns()
    spark.experimental.extraOptimizations = Seq(graft.plans.RewriteWindowTopK)
    spark.experimental.extraStrategies = Seq(graft.plans.TopKStrategy)
    Files.createDirectories(Paths.get(s"plans/$round"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/$round/${name}_$suffix.txt"), plan)
      println(s"wrote plans/$round/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
