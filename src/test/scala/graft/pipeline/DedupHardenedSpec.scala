package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Graft
import graft.dedup.Dedup
import graft.kmeans.SparkTestSession
import graft.sim.Similarity

/** The degenerate-duplicate-clique hardening of the LSH dedup paths
  * (exact-dup collapse + per-bucket candidate cap — see
  * [[graft.dedup.Dedup.nearDedupHardened]] /
  * [[graft.sim.Similarity.cosineNearDedupHardened]]):
  *
  *  - EQUIVALENCE: on a corpus with no clique past the cap, hardened
  *    output is identical to the plain operator (the collapse is
  *    semantics-preserving, the cap does not bind).
  *  - SCALING: an identical-document clique of size c produces O(c)
  *    work, not O(c²) candidate pairs — the clique collapses to ONE
  *    representative, so it contributes zero LSH pairs; the plain path
  *    on the same corpus pays the full c(c-1)/2.
  *  - CAP: a NEAR-identical (not byte-identical) clique, which the
  *    collapse cannot absorb, has its candidate volume bounded by
  *    head × occupancy per bucket while keep-min-id dedup still drops
  *    the clique against its smallest ids.
  */
class DedupHardenedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def drain[A](a: => A): A = {
    val r = a
    graft.util.OpCaches.releaseAll(spark)
    r
  }

  test("nearDedupHardened == nearDedup on the fixture corpus (cap unbound)") {
    val docs = Graft.table(spark, sf, "documents")
    val plain = drain(
      Dedup.nearDedup(docs, n = 3, numHashes = 12, bands = 4, threshold = 0.5)
        .select($"doc_id").as[Long].collect().sorted.toSeq)
    val hard = drain(
      Dedup.nearDedupHardened(
          docs, n = 3, numHashes = 12, bands = 4, threshold = 0.5,
          maxBucket = 4096)
        .select($"doc_id").as[Long].collect().sorted.toSeq)
    assert(hard === plain)
  }

  test("an identical-doc clique collapses: O(clique) not O(clique^2) pairs") {
    val c = 500
    val clique = (1L to c.toLong).map(i => (i, "the same boilerplate page " +
      "repeated across the crawl again and again"))
    val distinct = (10000L to 10004L).map(i =>
      (i, s"genuinely unique document number $i with its own words"))
    val docs = (clique ++ distinct).toDF("doc_id", "text")
    // plain: every clique pair is a candidate — quadratic
    val plainPairs = drain(
      Dedup.minHashCandidates(docs, n = 3, numHashes = 12, bands = 4).count())
    assert(plainPairs >= c.toLong * (c - 1) / 2)
    // hardened: the clique is ONE representative; candidate volume is
    // whatever the 6 representatives produce (bounded by reps^2), and
    // in particular not a function of clique size
    val hardPairs = drain(
      Dedup.minHashCandidatesHardened(
        docs, n = 3, numHashes = 12, bands = 4).count())
    assert(hardPairs <= 15L, s"$hardPairs pairs from 6 representatives")
    // survivors: exactly the clique minimum plus the distinct docs
    val survivors = drain(
      Dedup.nearDedupHardened(
          docs, n = 3, numHashes = 12, bands = 4, threshold = 0.5)
        .select($"doc_id").as[Long].collect().sorted.toSeq)
    assert(survivors === (1L +: (10000L to 10004L)).sorted)
  }

  test("a NEAR-identical clique is capped: linear candidate volume, " +
      "same survivors as the uncapped plain path") {
    val c = 300
    val cap = 8
    // long shared body + a distinct trailing marker per doc: shingle-key
    // sets differ (the exact collapse cannot absorb the clique) but the
    // marker shingles rarely win a minhash slot, so most docs share all
    // four band buckets — the hot-bucket shape the cap exists for
    val body = (1 to 120).map(w => s"token$w").mkString(" ")
    val docs = (1L to c.toLong).map(i => (i, s"$body marker m$i"))
      .toDF("doc_id", "text")
    val plainPairs = drain(
      Dedup.minHashCandidates(docs, n = 3, numHashes = 12, bands = 4).count())
    val hardPairs = drain(Dedup.minHashCandidatesHardened(
      docs, n = 3, numHashes = 12, bands = 4, maxBucket = cap).count())
    // head × occupancy: <= bands * cap * c pairs — linear in c, far
    // below the plain path's quadratic within-bucket volume
    assert(hardPairs <= 4L * cap * c, s"candidate volume $hardPairs not capped")
    assert(plainPairs > 10L * hardPairs,
      s"plain $plainPairs vs capped $hardPairs: cap saved <10x")
    // the drop DECISIONS survive the cap: every doc's bucket head is a
    // clique member above threshold, so keep-min-id dedups exactly as
    // the uncapped plain operator does (a doc escaping hardened dedup
    // escapes plain dedup too — its signature diverged, not the cap)
    val plainSurv = drain(
      Dedup.nearDedup(docs, n = 3, numHashes = 12, bands = 4, threshold = 0.5)
        .select($"doc_id").as[Long].collect().sorted.toSeq)
    val hardSurv = drain(Dedup.nearDedupHardened(
        docs, n = 3, numHashes = 12, bands = 4, threshold = 0.5,
        maxBucket = cap)
      .select($"doc_id").as[Long].collect().sorted.toSeq)
    assert(hardSurv === plainSurv)
    assert(hardSurv.head === 1L)
    assert(hardSurv.size <= c / 10, s"dedup ineffective: ${hardSurv.size}")
  }

  test("cosineNearDedupHardened == cosineNearDedup on the fixture " +
      "embeddings (cap unbound)") {
    val vecs = graft.kmeans.OpsN.pointsFromEmbeddings(
        spark.read.parquet(s"$sf/embeddings.parquet"))
      .select($"pid".as("id"), $"features".as("vec"))
    val plain = drain(
      Similarity.cosineNearDedup(vecs, threshold = 0.45,
          bands = 4, bitsPerBand = 4, d = 64)
        .select($"id").as[Long].collect().sorted.toSeq)
    val hard = drain(
      Similarity.cosineNearDedupHardened(vecs, threshold = 0.45,
          bands = 4, bitsPerBand = 4, d = 64, maxBucket = 4096)
        .select($"id").as[Long].collect().sorted.toSeq)
    assert(hard === plain)
  }

  test("an identical-vector clique collapses to its minimum id") {
    val d = 8
    val clique = (1L to 400L).map(i => (i, (1 to d).map(_.toDouble)))
    val others = (9000L to 9004L).map(i =>
      (i, (1 to d).map(j => if (j % 2 == 0) i.toDouble else -j.toDouble)))
    val vecs = (clique ++ others).toDF("id", "vec")
    val survivors = drain(
      Similarity.cosineNearDedupHardened(vecs, threshold = 0.9,
          bands = 4, bitsPerBand = 4, d = d, maxBucket = 16)
        .select($"id").as[Long].collect().sorted.toSeq)
    assert(survivors.head === 1L)
    assert(!survivors.exists(i => i > 1L && i <= 400L))
    // zero vectors self-sim is 0, never auto-dropped by the collapse
    val zeros = ((1L to 3L).map(i => (i, Seq.fill(d)(0.0))) ++
      Seq((7L, (1 to d).map(_.toDouble)))).toDF("id", "vec")
    val zsurv = drain(
      Similarity.cosineNearDedupHardened(zeros, threshold = 0.9,
          bands = 4, bitsPerBand = 4, d = d)
        .select($"id").as[Long].collect().sorted.toSeq)
    assert(zsurv === Seq(1L, 2L, 3L, 7L))
  }
}
