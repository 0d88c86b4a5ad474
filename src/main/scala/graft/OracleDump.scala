package graft
import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as oracle_sql.json WITHOUT starting Spark.
  *
  * Exists so tools/round_close.sh can type-lint every oracle text in DuckDB
  * (tools/oracle_typelint.py) in seconds, catching the R9
  * engine-widened-integer class (DuckDB sum(BIGINT) -> HUGEINT) before the
  * driver's rendering-hash gate does. See VERDICT r5 item #2.
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val Array(outPath) = args
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonUtil.q(k)}: ${JsonUtil.q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(outPath), json)
  }
}
