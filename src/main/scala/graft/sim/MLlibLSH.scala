package graft.sim

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Capability-parity wrappers over MLlib's production LSH estimators —
  * the library path a user would reach for at scale, complementing the
  * engine's own oracle-checkable LSH in [[Similarity]] and
  * [[graft.dedup.Dedup]] (MLlib's hash seeds are internal, so these have
  * no SQL oracle; tests assert behavioral properties instead).
  */
object MLlibLSH {

  /** Approximate near-dup pairs over binary shingle-set vectors via
    * MLlib MinHashLSH. Input: (doc_id, features Vector). Output:
    * (d1, d2, distance) with Jaccard distance <= maxDistance.
    */
  def minHashSimilarityJoin(
      docs: DataFrame,
      numHashTables: Int,
      maxDistance: Double): DataFrame = {
    // loud degenerate-input refusal (one limit-1 probe): MinHashLSH.fit
    // otherwise throws a bare head-of-empty-array on an empty frame
    require(!docs.isEmpty,
      "minHashSimilarityJoin: empty input — MLlib MinHashLSH cannot " +
        "fit on zero vectors")
    val mh = new MinHashLSH()
      .setNumHashTables(numHashTables)
      .setInputCol("features")
      .setOutputCol("hashes")
      .setSeed(42L)
    val model = mh.fit(docs)
    model
      .approxSimilarityJoin(docs, docs, maxDistance, "distance")
      .select(
        col("datasetA.doc_id").as("d1"),
        col("datasetB.doc_id").as("d2"),
        col("distance"))
      .filter(col("d1") < col("d2"))
  }

  /** Shingle-set docs -> sparse binary vectors for [[minHashSimilarityJoin]]:
    * dimension `dim`, indices = shingle-key mod dim (from
    * [[graft.dedup.Dedup.docShingleKeys]]).
    */
  def shingleVectors(docs: DataFrame, n: Int, dim: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.dedup.Dedup.docShingleKeys(docs, n)
      .filter(size(col("keys")) > 0)
      .select(
        col("doc_id"),
        transform(col("keys"), k =>
          pmod(k.getField("u") * lit(31L) + k.getField("v"), lit(dim.toLong))
            .cast("int")).as("idx"))
      .as[(Long, Seq[Int])]
      .map { case (id, idx) =>
        val distinct = idx.distinct.sorted.toArray
        (id, Vectors.sparse(dim, distinct, Array.fill(distinct.length)(1.0)))
      }
      .toDF("doc_id", "features")
  }

  /** Approximate nearest neighbors via MLlib BucketedRandomProjectionLSH
    * (Euclidean). Input corpus: (id, vec ARRAY<DOUBLE>). Output: the k
    * approximate nearest corpus ids for the query vector.
    */
  def euclideanANN(
      corpus: DataFrame,
      queryVec: Array[Double],
      k: Int,
      bucketLength: Double,
      numHashTables: Int = 4): DataFrame = {
    val vecs = corpus.select(
      col("id"),
      array_to_vector(col("vec")).as("features"))
    val brp = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength)
      .setNumHashTables(numHashTables)
      .setInputCol("features")
      .setOutputCol("hashes")
      .setSeed(42L)
    val model = brp.fit(vecs)
    model
      .approxNearestNeighbors(vecs, Vectors.dense(queryVec), k)
      .select(col("id"), col("distCol").as("dist"))
  }
}
