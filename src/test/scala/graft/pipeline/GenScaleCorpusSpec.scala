package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.kmeans.{OpsN, SparkTestSession}
import graft.sim.Similarity
import graft.tools.GenScaleCorpus

/** Validates the assumptions Bench's scale smoke rests on: the replicated
  * corpus must be a BIGGER instance of the same workload, not a different
  * one. Concretely, near-dup structure must replicate exactly WITHIN each
  * replica and (for text) vanish ACROSS replicas — otherwise the
  * "ratio_vs_base stays ~linear" signal would be measuring a workload with
  * a different pair density, and a superlinear operator could hide behind
  * (or be faked by) the changed density.
  */
class GenScaleCorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val base = "/root/testdata/sf0.001"
  private val off = 10000000L // GenScaleCorpus per-replica id offset

  // one 2x corpus shared by the suite (generated into a fresh temp dir)
  private lazy val scaled: String = {
    val dir = Files.createTempDirectory("graft_scale_spec").toString
    assert(GenScaleCorpus.ensure(spark, base, dir, replicas = 2))
    dir
  }

  test("ensure: generates once, then reuses via the _OK marker; a new " +
    "replica count regenerates and invalidates the old marker") {
    // fresh dir, NOT `scaled` — this test changes the corpus under it
    val dir = Files.createTempDirectory("graft_scale_marker").toString
    assert(GenScaleCorpus.ensure(spark, base, dir, replicas = 2))
    assert(!GenScaleCorpus.ensure(spark, base, dir, replicas = 2),
      "second call must hit the marker and skip regeneration")
    // a different replica count is a different corpus -> regenerates,
    // and must drop the x2 marker so x2 doesn't later reuse x3 data
    assert(GenScaleCorpus.ensure(spark, base, dir, replicas = 3))
    assert(GenScaleCorpus.ensure(spark, base, dir, replicas = 2),
      "x2 marker must have been invalidated by the x3 regeneration")
  }

  test("row counts scale by the replica factor; ids never collide") {
    val docs = spark.read.parquet(s"$scaled/documents.parquet")
    val emb = spark.read.parquet(s"$scaled/embeddings.parquet")
    val baseDocs = spark.read.parquet(s"$base/documents.parquet").count()
    val baseEmb = spark.read.parquet(s"$base/embeddings.parquet").count()
    assert(docs.count() === 2 * baseDocs)
    assert(emb.count() === 2 * baseEmb)
    assert(docs.select("doc_id").distinct().count() === 2 * baseDocs)
    assert(emb.select("vec_id").distinct().count() === 2 * baseEmb)
  }

  test("documents: near-dedup drops replicate exactly within replicas, " +
    "never across (tagged tokens make cross-replica Jaccard 0)") {
    val baseDocs = spark.read.parquet(s"$base/documents.parquet")
    val scaledDocs = spark.read.parquet(s"$scaled/documents.parquet")
    def survivors(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.nearDedup(df, n = 3, numHashes = 12, bands = 4, threshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = survivors(baseDocs)
    val s = survivors(scaledDocs)
    // each replica's survivor set is the base set (offset by r*off): a doc
    // survives iff no smaller-id near-identical doc exists, and replica-r
    // pairs mirror base pairs with ids uniformly offset
    assert(s === (b ++ b.map(_ + off)))
  }

  test("embeddings: within-replica cosine pairs replicate exactly " +
    "(circular shift preserves cosine)") {
    def pairs(dir: String): Set[(Long, Long, Double)] =
      Similarity.cosineNearDupPairs(
          OpsN.pointsFromEmbeddings(spark.read.parquet(s"$dir/embeddings.parquet"))
            .select(col("pid").as("id"), col("features").as("vec")),
          threshold = 0.45)
        .select(col("d1"), col("d2"), round(col("sim"), 6).as("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = pairs(base)
    val within = pairs(scaled).filter { case (d1, d2, _) =>
      (d1 < off) == (d2 < off)
    }
    // same pairs, same similarities, in both replicas
    assert(within === (b ++ b.map { case (d1, d2, s) => (d1 + off, d2 + off, s) }))
  }
}
