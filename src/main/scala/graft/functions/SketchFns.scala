package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** Registry handles for Spark's NATIVE sketch expressions — the exact
  * operators Catalyst injects for runtime bloom-filter joins
  * ([public: o.a.s.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
  * [public: o.a.s.sql.catalyst.expressions.BloomFilterMightContain]) —
  * exposed as callable functions so the sketch-path queries
  * ([[graft.ops.SketchOps]]) build and probe the filter with codegen'd
  * built-ins instead of a Scala UDF. The value is pre-hashed with Spark's
  * own XxHash64, matching the runtime-filter shape, so the aggregate's
  * input is a long and the probe never materializes the gram twice.
  */
object SketchFns {

  val bloomAggName = "graft_bloom_agg"
  val bloomMightName = "graft_bloom_might"

  /** `graft_bloom_agg(value, estItems, numBits)` — distributed build via
    * partial/final TypedImperativeAggregate merge; the result is the
    * serialized filter, ≤ numBits/8 bytes BY CONSTRUCTION at any corpus
    * size (the bound that makes the one-row driver materialization in
    * SketchOps legitimate).
    */
  private def bloomAggBuilder(es: Seq[Expression]): Expression = {
    GraftFnArgs.exact(bloomAggName, es, 3)
    new BloomFilterAggregate(XxHash64(Seq(es.head), 42L), es(1), es(2))
  }

  /** `graft_bloom_might(bloomBinary, value)` — bloomBinary must be a
    * literal/foldable (the broadcast-inlined filter); value is hashed the
    * same way the build side was.
    */
  private def bloomMightBuilder(es: Seq[Expression]): Expression = {
    GraftFnArgs.exact(bloomMightName, es, 2)
    BloomFilterMightContain(es.head, XxHash64(Seq(es(1)), 42L))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(bloomAggName, bloomAggBuilder, "internal")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(bloomMightName, bloomMightBuilder, "internal")
  }
}
