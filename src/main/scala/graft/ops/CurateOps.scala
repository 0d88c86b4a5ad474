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

  /** Stage 1 — quality gate: composite [0,1] score, keep >= 0.75. */
  private def qualityStage(docs: DataFrame): DataFrame =
    docs.join(
      TextAnalysisOps.qualityScore(docs).where(col("keep")).select("doc_id"),
      "doc_id")

  /** Stage 2 — exact dedup: one survivor per normalized content hash
    * (same normalization as j1_dedup_exact).
    */
  private def exactStage(df: DataFrame): DataFrame =
    df.join(
      df.groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
        .agg(min("doc_id").as("doc_id")).select("doc_id"),
      "doc_id")

  /** Stage 3 — near-dup dedup: cluster the survivors, keep each
    * cluster's min-doc_id representative. Signatures are cached only for
    * the duration of the (eager) clustering loop, then released.
    */
  private def nearDupStage(df: DataFrame, threshold: Double): DataFrame = {
    val sigs = DedupOps.signatures(df).cache()
    val pairs = DedupOps.candidatePairs(sigs, threshold = threshold)
    // clusters() runs its label-propagation loop eagerly and leaves the
    // final labels cached, so sigs can be released as soon as it returns
    val labels = DedupOps.clusters(pairs, df.select("doc_id"))
    sigs.unpersist()
    val reps = labels.groupBy("cluster_id")
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    df.join(reps, "doc_id")
  }

  /** Documents surviving all three gates, original columns preserved. */
  def curate(docs: DataFrame, nearDupThreshold: Double = 0.7): DataFrame =
    nearDupStage(exactStage(qualityStage(docs)), nearDupThreshold)

  /** Per-stage survival counts — the curation funnel report. One lineage,
    * intermediate stages cached while both their count and the next stage
    * consume them, then released.
    */
  def curationFunnel(docs: DataFrame, nearDupThreshold: Double = 0.7): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kept1 = qualityStage(docs).cache()
    val kept2 = exactStage(kept1).cache()
    val rows = Seq(
      ("0_input", docs.count()),
      ("1_quality", kept1.count()),
      ("2_exact_dedup", kept2.count()),
      ("3_near_dedup", nearDupStage(kept2, nearDupThreshold).count()))
    kept1.unpersist(); kept2.unpersist()
    rows.toDF("stage", "docs")
  }
}
