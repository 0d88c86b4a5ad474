package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the curated-vs-crawl filter of
  * the published LLM-data pipelines (GPT-3, arXiv:2005.14165 Appendix A;
  * the LLaMA/RedPajama "quality classifier" pass): fit a logistic
  * regression that separates a curated reference slice from raw crawl on
  * cheap row-local features, then score EVERY document with the trained
  * weights and keep what clears a threshold. Complements the static
  * heuristic gate ([[TextAnalysisOps.qualityScore]]), the LM scorers
  * (j32/j43), and the repetition signals (j30): this is the LEARNED
  * member of the quality family.
  *
  * Spark-first split, by design:
  *  - the FIT is bounded: [[AnnOps.boundedTrainSet]] caps the rows that
  *    can ever reach mllib (TakeOrderedAndProject by content hash — a
  *    pure function of corpus content, so training is deterministic and
  *    the driver/fit cost is O(cap) at ANY corpus size);
  *  - the SCORE is a pure Column expression: the trained weights are a
  *    handful of doubles folded back to RAW feature space (the
  *    standardizer's mean/std are absorbed into weights + intercept), so
  *    scoring is one literal dot product + sigmoid inside whole-stage
  *    codegen — no mllib transformer, no UDF, nothing non-relational on
  *    the 100 TB hot path.
  */
object QualityClassifierOps {

  /** Trained model in RAW feature space: score = σ(w·x + b). */
  final case class QualityModel(featureNames: Seq[String],
                                weights: Array[Double],
                                intercept: Double)

  /** The row-local feature set (shared with j17's gated features). */
  val featureCols: Seq[String] =
    Seq("n_chars2", "alpha_ratio", "punct_ratio", "stop_ratio",
      "distinct_ratio", "n_tokens")

  /** doc_id + the numeric features — one map-only pass. */
  def featurize(docs: DataFrame): DataFrame =
    TextAnalysisOps.qualityFeatures(docs)

  /** Fit on a BOUNDED, content-deterministic sample of the labeled
    * corpus. `docs` must carry `doc_id`, `text`, and an integer/double
    * `label` column (1 = curated reference, 0 = raw crawl). Features are
    * standardized for the optimizer's sake, then the scaler is folded
    * into the returned raw-space weights.
    */
  def train(docs: DataFrame, labelCol: String = "label",
            cap: Int = 20000, seed: Long = 42L): QualityModel = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.LogisticRegressionModel
    import org.apache.spark.ml.feature.{StandardScalerModel, VectorAssembler, StandardScaler}

    // the bounded-selection sort key must carry the LABEL too: two rows
    // with identical text but different labels (a curated doc also
    // present in the crawl — exactly the overlap this classifier
    // handles) would otherwise tie in (hash(text), text) order, and a
    // cap boundary inside the tie group would keep a partition-order-
    // dependent label multiset, breaking deterministic refit
    val labeled = featurize(docs)
      .join(docs.select(col("doc_id"), col(labelCol).cast("double").as("label"),
        col("text")), "doc_id")
      .withColumn("sort_key",
        concat(col("text"), lit("\u0001"), col("label").cast("string")))
    val bounded = AnnOps.boundedTrainSet(labeled, "sort_key", cap,
      trainFraction = 1.0, minRows = 10, seed = seed)

    val va = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("fv")
    val sc = new StandardScaler().setInputCol("fv").setOutputCol("sfv")
      .setWithMean(true).setWithStd(true)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("sfv").setLabelCol("label")
      .setMaxIter(100).setRegParam(1e-3).setStandardization(false)
    val model = new Pipeline().setStages(Array(va, sc, lr)).fit(bounded)

    // fold the standardizer into raw-space weights:
    //   σ(w·(x-μ)/s + b) = σ((w/s)·x + (b - Σ wᵢμᵢ/sᵢ))
    val scaler = model.stages(1).asInstanceOf[StandardScalerModel]
    val lrm = model.stages(2).asInstanceOf[LogisticRegressionModel]
    val mu = scaler.mean.toArray
    val sd = scaler.std.toArray
    val wStd = lrm.coefficients.toArray
    val wRaw = wStd.zip(sd).map { case (w, s) => if (s == 0.0) 0.0 else w / s }
    val bRaw = lrm.intercept -
      wRaw.zip(mu).map { case (w, m) => w * m }.sum
    QualityModel(featureCols, wRaw, bRaw)
  }

  /** The scoring expression over the feature columns: σ(w·x + b) as a
    * single codegen'd arithmetic chain of literals.
    */
  def scoreCol(m: QualityModel): Column = scoreCol(m, col)

  /** [[scoreCol]] with an explicit feature-name resolver, so callers that
    * bind the feature expressions under collision-proof temp names (see
    * [[classifierFilter]]) can score off those.
    */
  private def scoreCol(m: QualityModel, feature: String => Column): Column = {
    val z = m.featureNames.zip(m.weights)
      .map { case (f, w) => feature(f).cast("double") * lit(w) }
      .foldLeft(lit(m.intercept): Column)(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** doc_id + q_score for every document — map-only at any scale. */
  def score(docs: DataFrame, m: QualityModel): DataFrame =
    featurize(docs).select(col("doc_id"), scoreCol(m).as("q_score"))

  /** Keep documents whose classifier score clears the threshold (the
    * deterministic analog of GPT-3's Pareto lottery on the score).
    * ONE map-only pass: the feature expressions and the sigmoid are
    * computed inline on each row and dropped after the predicate — no
    * second corpus scan, no semi-join shuffle, full row preserved. The
    * inline features bind under `__qc_`-prefixed temp names so a caller
    * frame that already carries a column named `n_tokens`/`alpha_ratio`/…
    * keeps it untouched (ADVICE r11 — the bare names silently overwrote
    * and then dropped it).
    */
  def classifierFilter(docs: DataFrame, m: QualityModel,
                       threshold: Double = 0.5): DataFrame = {
    val exprs = TextAnalysisOps.qualityFeatureExprs.toMap
    def tmp(f: String): String = s"__qc_$f"
    require(!docs.columns.exists(_.startsWith("__qc_")),
      "classifierFilter: input already carries __qc_-prefixed columns")
    val withFeats = m.featureNames.foldLeft(docs) {
      case (df, f) => df.withColumn(tmp(f), exprs(f))
    }
    withFeats.where(scoreCol(m, f => col(tmp(f))) >= threshold)
      .drop(m.featureNames.map(tmp): _*)
  }
}
