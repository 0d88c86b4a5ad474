package graft

import graft.functions.MinHashAgg

/** SURVEY §5.3 — K4 sketch properties: merge algebra and Jaccard-estimate
  * ε-bound vs exact, on generated sets (seeded generator — the
  * scalatestplus scalacheck bridge isn't in the offline cache).
  */
class MinHashAggSpec extends SparkSuite {

  private val n = 128

  private def sketch(xs: Set[Long]): Array[Long] = {
    val agg = new MinHashAgg(n)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }

  test("identical sets estimate 1.0; disjoint sets estimate ~0") {
    val a = (1L to 200L).toSet
    val b = (1000L to 1200L).toSet
    assert(MinHashAgg.estimate(sketch(a), sketch(a)) == 1.0)
    assert(MinHashAgg.estimate(sketch(a), sketch(b)) < 0.1)
  }

  test("merge is commutative and equals whole-set sketch") {
    val a = (1L to 100L).toSet
    val b = (50L to 150L).toSet
    val agg = new MinHashAgg(n)
    val m1 = agg.merge(sketch(a), sketch(b)).toSeq
    val m2 = agg.merge(sketch(b), sketch(a)).toSeq
    val whole = sketch(a ++ b).toSeq
    assert(m1 == m2)
    assert(m1 == whole)
  }

  test("property: estimate within 0.2 of exact Jaccard on generated sets") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val a = Set.fill(30 + rnd.nextInt(270))(rnd.nextLong(500))
      val b = Set.fill(30 + rnd.nextInt(270))(rnd.nextLong(500))
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val est = MinHashAgg.estimate(sketch(a), sketch(b))
      assert(math.abs(est - exact) < 0.2, s"est $est vs exact $exact")
    }
  }

  test("aggregator works end-to-end through Spark groupBy") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (2L, 30L))
      .toDF("doc", "h")
    val mh = udaf(new MinHashAgg(16), org.apache.spark.sql.Encoders.scalaLong)
    val sigs = df.groupBy("doc").agg(mh(col("h")).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // same element sets ⇒ identical signatures
    assert(sigs(1L) == sigs(2L))
  }
}
