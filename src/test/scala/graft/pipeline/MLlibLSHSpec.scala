package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.sim.MLlibLSH

class MLlibLSHSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("MinHashLSH similarity join finds the planted near-dup pair") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vecs = MLlibLSH.shingleVectors(docs, n = 3, dim = 1 << 16).cache()
    val pairs = MLlibLSH.minHashSimilarityJoin(vecs, numHashTables = 6, maxDistance = 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    // the engine's own exact-Jaccard pairs are the ground truth
    val truth = graft.dedup.Dedup.jaccardPairs(docs, n = 3, threshold = 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val recall = (truth intersect pairs).size.toDouble / truth.size
    assert(recall >= 0.8, s"MLlib MinHashLSH recall $recall over ${truth.size} pairs")
  }

  test("MLlib-seeded queries are run-to-run deterministic (seeds pinned)") {
    // the two `no_oracle` registry entries: DuckDB can't mirror MLlib's
    // internal hash/init RNG, so the driver's check degrades to rows-only —
    // pin it by asserting two consecutive runs produce IDENTICAL results
    // (row count stability is what the driver can observe across rounds)
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("mllib_kmeans_sizes", "mllib_minhash_pairs")) {
      def run() = graft.SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      val first = run()
      assert(first.nonEmpty, s"$name returned no rows")
      assert(run() === first, s"$name is not deterministic across runs")
    }
  }

  test("BucketedRandomProjectionLSH ANN returns plausible neighbors") {
    val corpus = graft.kmeans.OpsN.pointsFromEmbeddings(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
      .select($"pid".as("id"), $"features".as("vec"))
    val q = corpus.filter($"id" === 0)
      .select($"vec").as[Array[Double]].head()
    val nn = MLlibLSH.euclideanANN(corpus, q, k = 5, bucketLength = 2.0)
      .as[(Long, Double)].collect()
    assert(nn.length === 5)
    assert(nn.map(_._1).contains(0L)) // the query itself is its own 0-NN
    assert(nn.map(_._2).min === 0.0)
  }
}
