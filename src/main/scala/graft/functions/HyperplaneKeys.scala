package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native random-hyperplane LSH keys: `graft_hyperplane_keys(emb, nBits,
  * tables)` maps an `array<float>` embedding to one packed sign-bit bucket
  * key per hash table (`array<bigint>`, length = tables) —
  * SURVEY.md §2.11 J9's bucketing step.
  *
  * Why native: the HOF spelling folds `aggregate(sequence(...))` lambdas
  * three deep — tables × nBits × dim interpreted closure dispatches per
  * row (665M at 200k vectors / 13 bits / 4 tables; the 1000× smoke
  * measured the bucketing, not the joins, dominating cosineNearDupPairs).
  * This is the same per-element-lambda pathology the Shingles / MinHashSig
  * / Winnow expressions fixed, with the same cure: one fused JVM loop.
  *
  * Semantics contract: BIT-IDENTICAL keys to the HOF spelling
  * (`AnnOps.hyperplaneKeyHof`, kept as the test reference) — the
  * hyperplane component reproduces Catalyst's `xxhash64(plane, j)` chain
  * (seed 42, ints hashed in child order) exactly, and both folds preserve
  * index order, so every existing bucket assignment is unchanged.
  * AnnSpec pins the equality.
  */
case class HyperplaneKeys(child: Expression, nBits: Int, tables: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = HyperplaneKeys.name

  // this is injected as public SQL surface (GraftExtensions): reject
  // non-float arrays at analysis time — getFloat over an 8-byte-stride
  // double array would read garbage with no error
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    HyperplaneKeys.keys(input.asInstanceOf[ArrayData], nBits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneKeys.keys($c, $nBits, $tables)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneKeys =
    copy(child = newChild)
}

object HyperplaneKeys {

  val name = "graft_hyperplane_keys"

  /** One packed key per table. Component (plane, j) reproduces Spark's
    * `xxhash64(plane, j)` for int inputs: hash = hashInt(j, hashInt(plane,
    * 42L)); j is 1-based like the `sequence(1, dim)` HOF spelling.
    */
  def keys(emb: ArrayData, nBits: Int, tables: Int): ArrayData = {
    val dim = emb.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = emb.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var p = 0
      while (p < nBits) {
        val planeSeed = XXH64.hashInt(p + t * 1024, 42L)
        var dot = 0.0
        var j = 1
        while (j <= dim) {
          dot += v(j - 1) * XXH64.hashInt(j, planeSeed).toDouble
          j += 1
        }
        acc = acc * 2 + (if (dot >= 0) 1L else 0L)
        p += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Runtime registration on an existing session (test/driver path). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      es => HyperplaneKeys(GraftFnArgs.exact(name, es, 3).head,
        GraftFnArgs.intLit(name, es, 1), GraftFnArgs.intLit(name, es, 2)),
      "internal")
}
