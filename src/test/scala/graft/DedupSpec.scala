package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** SURVEY §5.3 property tests for the near-dup stack: planted near-dups
  * are found, Jaccard estimates track exact Jaccard, exact dedup is
  * idempotent, SimHash behaves like a locality-sensitive fingerprint.
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()

  /** docs ∪ lightly-mutated copies (id+10000): each copy differs from its
    * source by one appended token — a planted near-duplicate.
    */
  private lazy val planted = {
    val mutated = docs.select((col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" xq")).as("text"))
    docs.select("doc_id", "text").union(mutated).cache()
  }

  test("minhash signature length and determinism") {
    val sigs = DedupOps.signatures(docs.limit(20))
    val two = sigs.select(size(col("sig"))).distinct().collect()
    assert(two.map(_.getInt(0)).toSet == Set(128))
    assert(sigs.collect().map(_.toString).sorted.sameElements(
      DedupOps.signatures(docs.limit(20)).collect().map(_.toString).sorted))
  }

  test("jaccard estimate within eps of exact for planted pairs") {
    val sigs = DedupOps.signatures(planted)
    val pairs = (0L until 20L).map(i => (i, i + 10000)).toDF("a", "b")
    val est = pairs
      .join(sigs.select(col("doc_id").as("a"), col("sig").as("sa")), "a")
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sb")), "b")
      .select(col("a"), DedupOps.sigSimilarity(col("sa"), col("sb")).as("est"))
    val exact = DedupOps.exactJaccard(planted, pairs)
    val joined = est.join(exact, "a").select("est", "jaccard").collect()
    joined.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.15,
        s"estimate ${r.getDouble(0)} vs exact ${r.getDouble(1)}")
    }
  }

  test("planted near-dups land in the same cluster") {
    val sigs = DedupOps.signatures(planted)
    val pairs = DedupOps.candidatePairs(sigs, threshold = 0.6)
    val labels = DedupOps.clusters(pairs, planted.select("doc_id"))
    val clusterOf = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val together = (0L until 50L).count(i => clusterOf(i) == clusterOf(i + 10000))
    assert(together >= 45, s"only $together/50 planted pairs clustered together")
  }

  test("mass-duplicate cluster larger than maxBucket stays one cluster") {
    // 30 near-identical copies of one document (one appended token each,
    // so every pair's Jaccard stays ≥ ~0.9) with maxBucket = 10: every
    // band bucket the cluster lands in exceeds the cap, so without the
    // hot-bucket star pairs the cluster would shatter into singletons.
    val base = docs.where(col("doc_id") === 0).select("text").as[String].head()
    val massDup = (0 until 30).map(i => (i.toLong, s"$base x$i")).toDF("doc_id", "text")
    val sigs = DedupOps.signatures(massDup)
    val pairs = DedupOps.candidatePairs(sigs, threshold = 0.6, maxBucket = 10)
    val labels = DedupOps.clusters(pairs, massDup.select("doc_id"))
    val nClusters = labels.select("cluster_id").distinct().count()
    assert(nClusters == 1, s"mass-dup cluster shattered into $nClusters clusters")
  }

  test("hot-bucket extra hubs raise direct-pair recall over the single star") {
    // 30 near-identical docs, maxBucket = 10: nearly every bucket is hot,
    // so min-id stars recover mostly (0, j) edges directly (measured pair
    // recall ~0.33 vs the exact-Jaccard ground truth). Two seeded extra
    // hubs per bucket must materially raise that at O(B) extra cost
    // (measured ~0.94).
    val base = docs.where(col("doc_id") === 0).select("text").as[String].head()
    val massDup = (0 until 30).map(i => (i.toLong, s"$base x$i")).toDF("doc_id", "text")
    val truth = DedupOps.exactJaccard(massDup,
        (for (a <- 0L until 30L; b <- a + 1 to 29L) yield (a, b)).toDF("a", "b"))
      .where(col("jaccard") >= 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size > 100, s"ground truth too small to measure recall: ${truth.size}")
    val sigs = DedupOps.signatures(massDup)
    def recall(extraReps: Int): Double = {
      val got = DedupOps.candidatePairs(sigs, threshold = 0.6, maxBucket = 10,
          hotExtraReps = extraReps)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }
    val starOnly = recall(0)
    val withHubs = recall(2)
    info(f"hot-bucket direct-pair recall: star-only $starOnly%.3f, +2 hubs $withHubs%.3f")
    assert(withHubs > starOnly,
      f"extra hubs did not improve recall ($starOnly%.3f -> $withHubs%.3f)")
    assert(withHubs >= starOnly + 0.05, "expected a material recall gain on an all-hot corpus")
  }

  test("LSH -> exact-Jaccard verify chain recovers planted dups, rejects banded negatives") {
    // VERDICT r15 nit 2: j61 gates exactJaccard over STAND-IN successor
    // pairs (the xxhash64 banding can't cross the DuckDB oracle), so the
    // real composition candidatePairs -> exactJaccard was pinned nowhere.
    // This golden runs the REAL chain on a corpus with planted positives
    // (one-token mutations, exact Jaccard >= ~0.9) and planted NEGATIVES:
    // boilerplate-sharing docs whose estimated similarity is high enough
    // for banding to admit some pairs but whose exact Jaccard sits below
    // the verify threshold — the pairs only the verify stage can kill.
    val base = docs.where(col("doc_id") < 30).select("doc_id", "text")
    val copies = base.select((col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" zq")).as("text"))
    val boiler = docs.where(col("doc_id") === 0).select("text").as[String].head()
      .split(" ").take(60).mkString(" ")
    val negatives = (0 until 10).map { i =>
      // shared 60-token boilerplate + a distinct 40-token tail: exact
      // 5-gram Jaccard between two negatives ~= 56/(56+2*36) ~ 0.44 -- far
      // below the 0.7 verify bar, close enough for banding to admit some
      (20000L + i, boiler + " " + (0 until 40).map(t => s"tail${i}w$t").mkString(" "))
    }.toDF("doc_id", "text")
    val corpus = base.union(copies).union(negatives).cache()
    val sigs = DedupOps.signatures(corpus)
    val cands = DedupOps.candidatePairs(sigs, threshold = 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val negCross = (for (i <- 0 until 10; j <- i + 1 until 10)
      yield (20000L + i, 20000L + j)).toSet
    val bandedNegatives = cands & negCross
    assert(bandedNegatives.nonEmpty,
      "no boilerplate pair was banded together — the verify stage has nothing to reject and the test is vacuous")
    val verified = DedupOps.exactJaccard(corpus,
        cands.toSeq.toDF("a", "b"))
      .where(col("jaccard") >= 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val positives = (0L until 30L).map(i => (i, i + 10000)).toSet
    val recovered = verified & positives
    assert(recovered.size >= 27,
      s"only ${recovered.size}/30 planted near-dups survived the LSH->verify chain")
    assert((verified & negCross).isEmpty,
      s"verify accepted banded boilerplate pairs: ${(verified & negCross).take(5)}")
    info(s"chain: ${cands.size} candidates, ${bandedNegatives.size} banded negatives " +
      s"all rejected, ${recovered.size}/30 positives recovered")
    corpus.unpersist()
  }

  test("clusters: 200-hop chain converges logarithmically to one component") {
    // the pathological shape for one-hop min-label propagation (d rounds
    // for a d-long chain — the r15 design would have BLOWN the default
    // maxIter=30 cap here): large-star/small-star must collapse it in
    // O(log d) rounds and still produce the exact closure
    val n = 201
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val verts = (0L until n.toLong).toDF("doc_id")
    val labels = DedupOps.clusters(chain, verts)
    val rounds = DedupOps.lastCcRounds
    val comps = labels.select("cluster_id").distinct().collect().map(_.getLong(0))
    assert(comps.sameElements(Array(0L)),
      s"chain shattered: components ${comps.mkString(",")}")
    assert(labels.count() == n)
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound,
      s"chain of ${n - 1} hops took $rounds star rounds (bound $bound) — " +
        "convergence is not logarithmic")
    info(s"200-hop chain: $rounds star rounds (bound $bound)")
  }

  test("j66 split is leakage-safe: every near-dup edge's endpoints share a split, full corpus covered") {
    // the structural property the gate's aggregate report cannot see,
    // over the FULL uncapped fixture: hashing the CLUSTER means no
    // duplicate pair ever straddles train/val/test
    val assigned = graft.ops.ckpt(DedupOps.splitAssign(docs))
    assert(assigned.count() == docs.count(), "every doc assigned")
    assert(assigned.select("doc_id").distinct().count() == docs.count(),
      "exactly one assignment per doc")
    assert(assigned.select("split").distinct().count() == 3,
      "all three splits non-vacuous on the fixture")
    val e = DedupOps.shingleEdges(docs)
    assert(e.count() > 0, "no duplicate edges — leakage property vacuous")
    val viol = e
      .join(assigned.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(assigned.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .where(col("sa") =!= col("sb")).count()
    assert(viol == 0, s"$viol duplicate edges straddle splits — leakage")
    // and the naive per-DOC hash would NOT be safe on this fixture —
    // the property comes from cluster hashing, not from luck
    val docHash = pmod(conv(substring(
      md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"), lit(10L))
    val naive = docs.select(col("doc_id"),
      when(docHash <= 7, "train").when(docHash === 8, "val")
        .otherwise("test").as("split"))
    val naiveViol = e
      .join(naive.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(naive.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .where(col("sa") =!= col("sb")).count()
    assert(naiveViol > 0,
      "fixture has no cross-split doc-hash pairs — the safety comparison is vacuous")
  }

  test("clusters: two components with shared-looking ids stay separate") {
    // star + triangle, disjoint: labels must be the per-component minima,
    // nothing may leak across components through the edge rewiring
    val edges = Seq((10L, 11L), (10L, 12L), (10L, 13L), // star at 10
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle at 20
      .toDF("a", "b")
    val verts = Seq(10L, 11L, 12L, 13L, 20L, 21L, 22L, 99L).toDF("doc_id")
    val got = DedupOps.clusters(edges, verts).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 99L -> 99L)
    assert(got == want, s"labels $got != $want")
  }

  test("exact dedup idempotence: dedup(dedup(x)) = dedup(x)") {
    val once = docs.groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
    val kept = docs.join(once.select("doc_id"), "doc_id")
    val twice = kept.groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
    assert(once.count() == twice.count())
  }

  test("simhash: identical docs distance 0, near-dups close, determinism") {
    val fp = DedupOps.simhash(planted).cache()
    val d = fp.select(col("doc_id"), col("simhash"))
    val dist = d.where(col("doc_id") < 50)
      .join(d.select((col("doc_id") - 10000).as("doc_id"), col("simhash").as("s2")),
        "doc_id")
      .select(DedupOps.hamming(col("simhash"), col("s2")).as("dist"))
      .agg(avg("dist"), max("dist")).collect().head
    assert(dist.getDouble(0) <= 8.0, s"avg hamming ${dist.getDouble(0)} too high for near-dups")
    // identical text ⇒ identical fingerprint
    val self = DedupOps.simhash(docs.limit(10))
      .join(DedupOps.simhash(docs.limit(10)).withColumnRenamed("simhash", "s2"), "doc_id")
      .where(col("simhash") =!= col("s2")).count()
    assert(self == 0)
  }

  test("SimHashAgg equals the declarative HOF spelling bit-for-bit") {
    val fast = DedupOps.simhash(docs.limit(40)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = DedupOps.simhashHof(docs.limit(40)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
  }

  test("simhash blocking finds low-distance pairs") {
    val fp = DedupOps.simhash(planted)
    val pairs = DedupOps.simhashPairs(fp, maxHamming = 3)
    // every reported pair honors the bound
    assert(pairs.where(col("dist") > 3).count() == 0)
    // planted copies (1-token diff on ~60-token docs) mostly within 3 bits
    val hits = pairs.where(col("b") - col("a") === 10000).count()
    assert(hits >= 30, s"only $hits planted pairs under Hamming 3")
  }

  test("LSH band join and simhash blocking plan as equi-joins, never cross") {
    val sigs = DedupOps.signatures(docs.limit(50))
    val lshPlan = DedupOps.candidatePairs(sigs)
      .queryExecution.executedPlan.toString
    assert(!lshPlan.contains("CartesianProduct")
      && !lshPlan.contains("BroadcastNestedLoop"), lshPlan)
    val simPlan = DedupOps.simhashPairs(DedupOps.simhash(docs.limit(50)))
      .queryExecution.executedPlan.toString
    assert(!simPlan.contains("CartesianProduct")
      && !simPlan.contains("BroadcastNestedLoop"), simPlan)
  }
}
