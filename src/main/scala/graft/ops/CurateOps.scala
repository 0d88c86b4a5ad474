package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the J-family operators composed the
  * way a pre-training data run uses them —
  *
  *   quality gate ([[TextAnalysisOps.qualityScore]])
  *     → exact dedup (normalized content hash, keep min doc_id)
  *       → near-dup dedup (MinHash+LSH clusters via [[DedupOps]],
  *         keep the min-doc_id representative per cluster)
  *
  * Every stage is shuffle-keyed (quality is a narrow per-row map; exact
  * dedup one shuffle on the content hash; near-dup the banded equi-join
  * + CC clustering DedupOps documents) and nothing collects to the
  * driver, so the same composition runs at any corpus size. CurateSpec
  * pins each gate on planted junk / exact-dup / near-dup documents.
  *
  * Operational note: the output should be MATERIALIZED (parquet /
  * checkpoint) before further pipeline stages consume it — the near-dup
  * stage's iterative clustering produces a deep lineage, and composing
  * another full pipeline on top of the live plan multiplies the tree
  * (a re-curation over the unmaterialized output OOMs plan
  * stringification long before execution; over a materialized snapshot
  * it is cheap and idempotent — CurateSpec pins exactly that).
  */
object CurateOps {

  /** Documents surviving all three gates, original columns preserved. */
  def curate(docs: DataFrame, nearDupThreshold: Double = 0.7): DataFrame = {
    // 1. quality gate: composite [0,1] score, keep >= 0.75
    val kept1 = docs.join(
      TextAnalysisOps.qualityScore(docs).where(col("keep")).select("doc_id"),
      "doc_id")
    // 2. exact dedup: one survivor per normalized content hash (same
    //    normalization as j1_dedup_exact)
    val kept2 = kept1.join(
      kept1.groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
        .agg(min("doc_id").as("doc_id")).select("doc_id"),
      "doc_id")
    // 3. near-dup dedup: cluster the survivors, keep each cluster's rep
    val sigs = DedupOps.signatures(kept2).cache()
    val pairs = DedupOps.candidatePairs(sigs, threshold = nearDupThreshold)
    val reps = DedupOps.clusters(pairs, kept2.select("doc_id"))
      .groupBy("cluster_id").agg(min("doc_id").as("doc_id")).select("doc_id")
    kept2.join(reps, "doc_id")
  }

  /** Per-stage survival counts — the curation funnel report. */
  def curationFunnel(docs: DataFrame, nearDupThreshold: Double = 0.7): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kept1 = docs.join(
      TextAnalysisOps.qualityScore(docs).where(col("keep")).select("doc_id"), "doc_id")
    val kept2 = kept1.join(
      kept1.groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
        .agg(min("doc_id").as("doc_id")).select("doc_id"), "doc_id")
    val kept3 = curate(docs, nearDupThreshold)
    Seq(
      ("0_input", docs.count()),
      ("1_quality", kept1.count()),
      ("2_exact_dedup", kept2.count()),
      ("3_near_dedup", kept3.count()))
      .toDF("stage", "docs")
  }
}
