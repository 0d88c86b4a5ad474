package graft

import graft.ops.{AnnOps, TextOps}
import org.apache.spark.sql.functions._

/** SURVEY §5.3 — ANN acceptance: recall@k against the brute-force exact
  * top-k (TextOps.j8 machinery), plus cosine near-dup on a planted
  * duplicate vector.
  */
class AnnSpec extends SparkSuite {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("ann recall@5 >= 0.6 vs brute force") {
    val probes = emb.where(col("vec_id") < 10)
    val exact = TextOps.j8_sim_topk(spark, sf).select("pid", "vec_id")
    // Fixture embeddings are near-uniform (neighbor angles ≈ 90°), the
    // hardest case for hyperplane LSH — wide coverage (4 bits, 16 tables)
    // is needed here; clustered real-world corpora allow far tighter
    // buckets (standard recall/candidate-count tuning).
    val ann = AnnOps.annTopK(emb, probes, k = 5, nBits = 4, tables = 16)
    val recall = AnnOps.recallAtK(ann.select("pid", "vec_id"), exact)
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("ann candidates are a strict subset of the corpus (no self matches)") {
    val probes = emb.where(col("vec_id") < 5)
    val ann = AnnOps.annTopK(emb, probes, k = 5, nBits = 8, tables = 4)
    assert(ann.where(col("pid") === col("vec_id")).count() == 0)
    assert(ann.groupBy("pid").count().where(col("count") > 5).count() == 0)
  }

  test("cosine near-dup finds a planted duplicate vector") {
    val dup = emb.where(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val withDup = emb.select("vec_id", "embedding").union(dup)
    val pairs = AnnOps.cosineNearDupPairs(withDup, threshold = 0.999, nBits = 8, tables = 8)
    assert(pairs.where(col("a") === 0 && col("b") === 100000).count() == 1,
      "planted identical vector not recovered as near-dup")
  }

  test("IVF ANN: recall@5 vs brute force, bounded candidate work") {
    val probes = emb.where(col("vec_id") < 10)
    val exact = TextOps.j8_sim_topk(spark, sf).select("pid", "vec_id")
    // uniform fixture again needs wide probing; nProbe=8 of nlist=16
    val ivf = AnnOps.ivfTopK(spark, emb, probes, k = 5, nlist = 16, nProbe = 8)
    val recall = AnnOps.recallAtK(ivf.select("pid", "vec_id"), exact)
    assert(recall >= 0.6, s"IVF recall@5 = $recall")
    assert(ivf.groupBy("pid").count().where(col("count") > 5).count() == 0)
  }

  test("LSH candidate shuffles move ids only, never embedding vectors") {
    // The r2 audit found the candidate distinct dragging two 64-float
    // arrays per pair through its Exchange; the fix dedups on the id pair
    // and re-joins embeddings by id. Pin it: no shuffle anywhere in
    // either ANN plan may carry an array column. (AQE hides exchanges
    // inside leaf query stages, so assert on the static plan.)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probes = emb.where(col("vec_id") < 5)
      for (df <- Seq(
          AnnOps.annTopK(emb, probes, k = 5, nBits = 8, tables = 4),
          AnnOps.cosineNearDupPairs(emb.select("vec_id", "embedding")))) {
        val shuffled = df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e.output
        }
        assert(shuffled.nonEmpty)
        shuffled.foreach { attrs =>
          assert(!attrs.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
            s"shuffle carries a vector column: ${attrs.map(a => a.name + ":" + a.dataType.simpleString)}")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("multi-probe expands the candidate set, never shrinks recall") {
    val probes = emb.where(col("vec_id") < 10)
    val exact = TextOps.j8_sim_topk(spark, sf).select("pid", "vec_id")
    val cb = AnnOps.bucketed(emb, 6, 2).select("tbl", "key", "vec_id")
    def cands(multiProbe: Int) =
      AnnOps.probeBuckets(probes, 6, 2, multiProbe)
        .join(cb, Seq("tbl", "key")).where(col("vec_id") =!= col("pid"))
        .select("pid", "vec_id").distinct()
    val plainC = cands(0); val multiC = cands(6)
    // strict superset: every single-probe candidate survives, new ones appear
    assert(plainC.exceptAll(multiC).isEmpty, "multi-probe lost a candidate")
    assert(multiC.count() > plainC.count(), "multi-probe added no candidates")
    // recall is monotone in the candidate set (exact re-rank of a superset);
    // the uniform fixture's neighbors sit at ~90 deg — many sign bits away —
    // so Hamming-1 probing may not RAISE recall here (AnnSpec's standing
    // caveat); clustered corpora are where the knob pays
    val rPlain = AnnOps.recallAtK(
      AnnOps.annTopK(emb, probes, k = 5, nBits = 6, tables = 2)
        .select("pid", "vec_id"), exact)
    val rMulti = AnnOps.recallAtK(
      AnnOps.annTopK(emb, probes, k = 5, nBits = 6, tables = 2, multiProbe = 6)
        .select("pid", "vec_id"), exact)
    assert(rMulti >= rPlain, s"multi-probe recall $rMulti < single-probe $rPlain")
    // fan-out is probe-side only and bounded: still at most k rows per probe
    val multi = AnnOps.annTopK(emb, probes, k = 5, nBits = 6, tables = 2, multiProbe = 6)
    assert(multi.groupBy("pid").count().where(col("count") > 5).count() == 0)
  }

  test("native hyperplane keys are bit-identical to the HOF reference spelling") {
    import org.apache.spark.sql.functions.{call_function, lit, posexplode, sequence, transform, struct, explode}
    graft.functions.HyperplaneKeys.register(spark)
    val nBits = 12; val tables = 4
    val sample = emb.limit(100)
    val native = sample.select(col("vec_id"),
      posexplode(call_function(graft.functions.HyperplaneKeys.name,
        col("embedding"), lit(nBits), lit(tables))))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("key"))
    val hof = sample.select(col("vec_id"),
      explode(transform(sequence(lit(0), lit(tables - 1)),
        t => struct(t.as("tbl"),
          ops.AnnOps.hyperplaneKeyHof(col("embedding"), nBits, 64, t).as("key")))).as("bkt"))
      .select(col("vec_id"), col("bkt.tbl").as("tbl"), col("bkt.key").as("key"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("IVF with sampled quantizer training keeps recall") {
    val probes = emb.where(col("vec_id") < 10)
    val exact = TextOps.j8_sim_topk(spark, sf).select("pid", "vec_id")
    val ivf = AnnOps.ivfTopK(spark, emb, probes, k = 5, nlist = 16, nProbe = 8,
      trainFraction = 0.3)
    val recall = AnnOps.recallAtK(ivf.select("pid", "vec_id"), exact)
    assert(recall >= 0.6, s"sampled-training IVF recall@5 = $recall")
    // deterministic: the seeded sample gives the same centroids every run
    val again = AnnOps.ivfTopK(spark, emb, probes, k = 5, nlist = 16, nProbe = 8,
      trainFraction = 0.3)
    assert(ivf.collect().map(_.toString).sorted
      .sameElements(again.collect().map(_.toString).sorted))
  }

  test("hyperplane bucketing is deterministic") {
    val b1 = AnnOps.bucketed(emb.limit(50)).select("vec_id", "tbl", "key").collect()
    val b2 = AnnOps.bucketed(emb.limit(50)).select("vec_id", "tbl", "key").collect()
    assert(b1.map(_.toString).sorted.sameElements(b2.map(_.toString).sorted))
  }
}
