package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY.md §2.11 J11 — clustering over embedding columns via spark-ml
  * KMeans (jar present in /opt/spark/jars). Seeded for reproducibility;
  * centroid init is engine-specific so acceptance is silhouette/purity
  * sanity (§5.3), not a cross-engine oracle.
  *
  * Scale: KMeans|| init + Lloyd iterations are each one map-reduce over
  * the corpus (broadcast centroids, partial sums per partition) — the
  * textbook 100 TB-able clustering loop.
  */
object ClusterOps {

  /** Cluster embeddings into k groups; returns (vec_id, label, cluster). */
  def kmeans(emb: DataFrame, k: Int = 10, seed: Long = 42L): DataFrame = {
    val feats = emb.select(col("vec_id"), col("label"),
      array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(feats)
    model.transform(feats).select("vec_id", "label", "cluster")
  }

  /** Majority-label purity of a clustering — the sanity metric used by
    * ClusterSpec (fixture labels 0–9 were generated from the embedding
    * space, so decent purity is expected).
    */
  def purity(clustered: DataFrame): Double = {
    val n = clustered.count().toDouble
    val top = clustered.groupBy("cluster", "label").count()
      .groupBy("cluster").agg(max("count").as("m"))
      .agg(sum("m")).first().getLong(0)
    top / n
  }
}
