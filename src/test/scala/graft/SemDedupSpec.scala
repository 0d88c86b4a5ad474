package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** SemDeDup (arXiv:2303.09540) property gates: planted semantic
  * near-duplicates collapse into one component with the original
  * canonical, untouched vectors survive, the pass is idempotent and
  * seeded-deterministic, and the hot-cell star guard keeps a
  * mass-duplicate cluster connected without all-pairs work.
  *
  * The spec runs late in the alphabetical suite order, when the shared
  * JVM carries every earlier spec's cached plans and broadcasts — it
  * clears the SQL cache up front and shares one collected result across
  * tests (the r10 full-suite run OOMed at 8g before these two measures).
  */
class SemDedupSpec extends SparkSuite {

  private lazy val emb = {
    spark.catalog.clearCache()
    Tables.embeddings(spark, sf).select("vec_id", "embedding").cache()
  }

  /** Corpus ∪ near-copies of vec_id 0..19 (id+10000): first coordinate
    * nudged by +0.01 — cosine to the source stays ≳0.999 while the corpus
    * max pairwise cosine sits far below the 0.95 threshold.
    */
  private lazy val planted = {
    val copies = emb.where(col("vec_id") < 20)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    emb.union(copies).cache()
  }

  /** One shared run: (vec_id → (component, is_canonical)). */
  private lazy val first: Map[Long, (Long, Boolean)] =
    DedupOps.semanticDedup(planted, nClusters = 16, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("planted near-copies collapse; originals all survive canonical") {
    val out = first
    val recovered = (0L until 20L).count(i => out(i)._1 == out(i + 10000)._1)
    assert(recovered >= 18, s"only $recovered/20 planted copies joined their source")
    // every copy that merged is non-canonical and its source is canonical
    (0L until 20L).filter(i => out(i)._1 == out(i + 10000)._1).foreach { i =>
      assert(out(i)._2, s"source $i lost canonical status")
      assert(!out(i + 10000)._2, s"copy ${i + 10000} stayed canonical")
    }
    // no unrelated original got absorbed: everything except merged copies
    // is canonical
    val canonical = out.count(_._2._2)
    assert(canonical == planted.count() - recovered,
      s"$canonical canonical vs expected ${planted.count() - recovered}")
  }

  test("seeded-deterministic across runs") {
    val again = DedupOps.semanticDedup(planted, 16, 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(again == first, "semanticDedup not deterministic across runs")
  }

  test("idempotent: a second pass over the survivors removes nothing") {
    val keepIds = first.collect { case (id, (_, true)) => id }.toSeq
    val survivors = planted.join(
      spark.createDataFrame(keepIds.map(Tuple1(_))).toDF("vec_id"), "vec_id")
    val second = DedupOps.semanticDedup(survivors, nClusters = 16, threshold = 0.95)
    assert(second.where(!col("is_canonical")).count() == 0,
      "second pass dropped rows — semanticDedup not idempotent")
  }

  test("mass-duplicate cell beyond maxCluster stays one component (star guard)") {
    // 30 near-copies of vec 0 + the corpus, maxCluster = 10: the cell
    // holding the mass is hot, so pairs degrade to the hub star — the
    // component must still hold all copies, and must NOT have needed
    // all-pairs (30 copies alone would be 435 pairs; hubs emit O(B)).
    val mass = (1 to 30).map { j =>
      emb.where(col("vec_id") === 0)
        .select((col("vec_id") + 20000 + j).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(0.001f * j)).otherwise(x)).as("embedding"))
    }.reduce(_ union _)
    val corpus = emb.union(mass)
    val out = DedupOps.semanticDedup(corpus, nClusters = 16, threshold = 0.95,
      maxCluster = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val comps = (1 to 30).map(j => out(20000L + j)._1).toSet ++ Set(out(0L)._1)
    assert(comps.size == 1, s"mass-dup cluster shattered into ${comps.size} components")
    assert(out(0L)._2 && (1 to 30).forall(j => !out(20000L + j)._2),
      "canonical choice wrong inside the mass-dup component")
  }
}
