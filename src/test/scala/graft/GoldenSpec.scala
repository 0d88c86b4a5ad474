package graft

import scala.io.Source

/** SURVEY §5.2 — sf0.001 golden regression net: every declared query's
  * row count + content checksum must match the checked-in goldens
  * (regenerate deliberately with `sbt "runMain graft.GoldenGen"`).
  * Catches semantic drift without needing the driver's DuckDB.
  */
class GoldenSpec extends SparkSuite {

  private lazy val goldens: Map[String, (Long, String)] = {
    val src = Source.fromInputStream(
      getClass.getClassLoader.getResourceAsStream("goldens_sf0.001.tsv"))
    try src.getLines().map { l =>
      val Array(n, c, h) = l.split("\t")
      n -> (c.toLong, h)
    }.toMap
    finally src.close()
  }

  test("golden coverage: every declared query has a golden") {
    val missing = SparkEntry.queries.keySet -- goldens.keySet
    assert(missing.isEmpty, s"queries without goldens (run GoldenGen): $missing")
  }

  test("all queries match their sf0.001 goldens") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val rows = fn(spark, sf).collect().map(_.toString)
      val got = (rows.length.toLong, GoldenGen.checksum(rows))
      if (goldens.get(name).contains(got)) None
      else Some(s"$name: got $got want ${goldens.get(name)}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
