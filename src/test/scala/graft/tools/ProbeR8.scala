package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only round-8 probe (not part of the driver contract): can the two
  * `no_oracle` MLlib rows carry an exact oracle at the test scales?
  *
  *  1. mllib_minhash_pairs: is MLlib MinHashLSH recall vs the exact
  *     Jaccard join (same mod-dim index-set representation) 1.0 at
  *     sf0.001/0.01/0.1?
  *  2. mllib_kmeans_sizes: does the MLlib k-means size multiset equal the
  *     engine's own LloydN(5) size multiset?
  */
object ProbeR8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")

      // --- 1: MLlib MinHashLSH vs exact Jaccard on the SAME representation
      val vecs = graft.sim.MLlibLSH.shingleVectors(docs, n = 3, dim = 1 << 16)
      val mllib = graft.sim.MLlibLSH
        .minHashSimilarityJoin(vecs, numHashTables = 6, maxDistance = 0.5)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // exact: distinct idx sets per doc, inverted-index join, true Jaccard
      val idx = graft.dedup.Dedup.docShingleKeys(docs, 3)
        .filter(size(col("keys")) > 0)
        .select(col("doc_id"),
          explode(array_distinct(transform(col("keys"), k =>
            pmod(k.getField("u") * lit(31L) + k.getField("v"), lit(65536L))
              .cast("int")))).as("i"))
      val sizes = idx.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val exact = idx.as("a").join(idx.as("b"), col("a.i") === col("b.i"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("c"))
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
        // MLlib filters distance < 0.5, distance = 1 - jac
        .filter(lit(1.0) - col("c") / (col("s1") + col("s2") - col("c")) < 0.5)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val missed = exact -- mllib
      val ghost = mllib -- exact
      println(s"PROBE $sf minhash: mllib=${mllib.size} exact=${exact.size} " +
        s"missed=${missed.size} ghost=${ghost.size}")
      if (missed.nonEmpty) println(s"  missed: ${missed.take(5)}")
      if (ghost.nonEmpty) println(s"  ghost: ${ghost.take(5)}")

      // --- 2: MLlib kmeans sizes vs LloydN(5) sizes, as multisets
      val pts = graft.kmeans.OpsN.pointsFromEmbeddings(
        spark.read.parquet(s"$dir/embeddings.parquet"))
      val model = graft.kmeans.MLlibKMeans.fit(pts, k = 4, maxIter = 5)
      val msizes = graft.kmeans.MLlibKMeans.transform(pts, model)
        .groupBy("cid").count().collect().map(_.getLong(1)).sorted.toSeq
      val cs = graft.kmeans.LloydN.iterateN(pts, k = 4, iters = 5)
      val lsizes = graft.kmeans.OpsN.assignN(pts, cs)
        .groupBy("cid").count().collect().map(_.getLong(1)).sorted.toSeq
      println(s"PROBE $sf kmeans: mllib=$msizes lloydn5=$lsizes " +
        s"equal=${msizes == lsizes}")
    }
    spark.stop()
  }
}
