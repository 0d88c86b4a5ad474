package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object ops {

  /** Every operator in the contract is a (session, sfDir) => DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** Decimal-exact SUM (SURVEY.md §2.1 R2): floating sums are order-dependent
    * across engines; decimal sums are exact and associative, so partial/final
    * aggregation (map-side combine) stays deterministic at any parallelism —
    * the property that makes these queries reproducible on a 1000-executor
    * cluster, not just on local[32]. Result cast to DECIMAL(38,2) so Spark's
    * sum precision (28,2) and DuckDB's (38,2) agree.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DecimalType(38, 2))

  /** R2 average: exact decimal sum, one deterministic double division. */
  def davg(c: Column): Column = (dsum(c).cast("double") / count(lit(1)))

  /** DuckDB spelling of [[dsum]]. */
  def dsumSql(e: String): String = s"CAST(sum(CAST($e AS DECIMAL(18,2))) AS DECIMAL(38,2))"
}
