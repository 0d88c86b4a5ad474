package graft

import graft.plans.{RewriteWindowTopK, TopKStrategy}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmark: stock Filter(Window(row_number)) top-k vs the custom
  * TopKPerGroup bounded-heap path, on the sf dir in SPARK_GRAFT_SF_DIR.
  * Prints one JSON line with both steady-state timings.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def query() = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(spark, sfDir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
    }
    def time(reps: Int)(f: => Unit): Double = {
      f // warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      (System.nanoTime() - t0) / 1e9 / reps
    }
    val stock = time(5) { query().count() }
    spark.experimental.extraOptimizations = Seq(RewriteWindowTopK)
    spark.experimental.extraStrategies = Seq(TopKStrategy)
    val custom = time(5) { query().count() }
    println(s"""{"stock_sec":$stock,"custom_topk_sec":$custom,"sf":"$sfDir"}""")
    spark.stop()
  }
}
