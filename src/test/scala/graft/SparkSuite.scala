package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session keeps the
  * suite fast; tests run on the sf0.001 fixtures).
  */
object SparkSuite {
  val sf: String = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // VERDICT r19 task 6: the suite exercises the same whitelisted global
    // windows as the mains; without the filter the `sbt test` tail is pure
    // WindowExec "No Partition Defined" spam. The filter is message-exact
    // (Harness.scala), so WindowLintSpec remains the proof the silenced
    // warnings are benign while every other window WARN still surfaces.
    Harness.quietBenignWindowWarns()
    s
  }
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark
  val sf: String = SparkSuite.sf
}
