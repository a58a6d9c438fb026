package graft.kmeans

import org.apache.spark.ml.clustering.{KMeans => MLKMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Capability-parity path through Spark MLlib's production KMeans
  * (`org.apache.spark.ml.clustering.KMeans`) — the implementation a user
  * would pick at 100 TB (distributed k-means|| init, DenseVector kernels,
  * instrumented convergence).
  *
  * Semantic deltas vs the reference / [[Lloyd]] (SURVEY.md §7.4):
  *   - init: MLlib offers `k-means||` (default) and `random`; the reference's
  *     "first K rows" init (`master.py:27-30`) is not expressible, so
  *     reference-parity runs go through [[Lloyd]]/[[LloydN]].
  *   - tol: MLlib compares squared distance against tol², per center, using
  *     the *previous* assignment's centers — same intent as the reference's
  *     0.001 Euclidean check (`master.py:32`).
  *   - empty clusters: MLlib keeps the previous center (our `Keep` policy);
  *     the reference drops (`reducer.py:116-122`).
  */
object MLlibKMeans {

  /** Fit on a (pid, features ARRAY<DOUBLE>) frame; returns the model. */
  def fit(
      points: DataFrame,
      k: Int,
      maxIter: Int = 20,
      tol: Double = 0.001,
      seed: Long = 42L): KMeansModel = {
    // loud degenerate-input refusal (one limit-1 probe, negligible next
    // to the fit's own passes): MLlib otherwise dies deep in a stage
    // with an opaque task failure on an empty frame
    require(!points.isEmpty,
      "MLlibKMeans.fit: empty input — k-means needs at least one point")
    val vecs = points.select(
      col("pid"),
      array_to_vector(col("features")).as("features"))
    new MLKMeans()
      .setK(k)
      .setMaxIter(maxIter)
      .setTol(tol)
      .setSeed(seed)
      .setFeaturesCol("features")
      .fit(vecs)
  }

  /** Assignment under a fitted MLlib model: (pid, features, cid). */
  def transform(points: DataFrame, model: KMeansModel): DataFrame = {
    val vecs = points.select(
      col("pid"),
      col("features"),
      array_to_vector(col("features")).as("fv"))
    model
      .setFeaturesCol("fv")
      .setPredictionCol("cid")
      .transform(vecs)
      .select(col("pid"), col("features"), col("cid"))
  }

  /** The fitted centroids as a (cid, features) DataFrame. */
  def centroids(
      spark: org.apache.spark.sql.SparkSession,
      model: KMeansModel): DataFrame = {
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }
      .toSeq
      .toDF("cid", "features")
  }
}
