package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** The sketch-path queries (j35–j37) are hash-gated against SKETCH-FREE
  * oracles; these specs pin the one-sidedness properties that make that
  * equivalence hold by construction rather than by luck:
  * bloom membership has no false negatives (every inserted key passes
  * the probe), and a count-min estimate never underestimates (so a
  * threshold filter on estimates keeps a superset of the true heavy
  * hitters). If either property broke, the exact confirm stages would
  * silently LOSE rows — the failure mode the driver gate can only catch
  * after the fact.
  */
class SketchOpsSpec extends SparkSuite {

  test("bloom build+probe: no false negatives over the fixture grams") {
    graft.functions.SketchFns.register(spark)
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"gram-$i token-${i % 97}").toDF("g")
    val bytes = keys
      .agg(call_function(graft.functions.SketchFns.bloomAggName,
        col("g"), lit(65536L), lit(1048576L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val misses = keys.where(!call_function(
        graft.functions.SketchFns.bloomMightName, lit(bytes), col("g")))
      .count()
    assert(misses == 0, s"bloom dropped $misses inserted keys")
  }

  test("bloom probe rejects the overwhelming majority of absent keys (prefilter is real)") {
    graft.functions.SketchFns.register(spark)
    import spark.implicits._
    val in = (0 until 5000).map(i => s"present-$i").toDF("g")
    val bytes = in
      .agg(call_function(graft.functions.SketchFns.bloomAggName,
        col("g"), lit(65536L), lit(1048576L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val absent = (0 until 5000).map(i => s"absent-$i").toDF("g")
    val falsePositives = absent.where(call_function(
        graft.functions.SketchFns.bloomMightName, lit(bytes), col("g")))
      .count()
    // 2^20 bits for 5k items: fpp is ~0; allow 1% before calling it broken
    assert(falsePositives < 50, s"$falsePositives/5000 false positives")
  }

  test("count-min estimates never underestimate (threshold filter keeps a superset)") {
    import spark.implicits._
    // zipf-ish: token i appears 5000/(i+1) times
    val rows = (0 until 200).flatMap(i => Seq.fill(5000 / (i + 1))(s"tok-$i"))
    val df = rows.toDF("g")
    val bytes = df.agg(expr("count_min_sketch(g, 0.0001d, 0.99d, 42)").as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val trueCounts = rows.groupBy(identity).view.mapValues(_.size)
    val under = trueCounts.count { case (g, c) => sk.estimateCount(g) < c }
    assert(under == 0, s"$under grams under-estimated")
  }
}
