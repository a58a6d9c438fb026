package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Graft
import graft.dedup.Dedup
import graft.kmeans.SparkTestSession

/** Bloom-prefiltered decontamination
  * ([[graft.dedup.Dedup.containmentPairsBloom]]):
  *
  *  - EQUIVALENCE: output is identical to [[graft.dedup.Dedup
  *    .containmentPairs]] on the fixture corpus — Bloom filters have no
  *    false negatives, and the exact verify join discards the false
  *    positives, so the prefilter is semantics-free by construction.
  *  - FP-ROBUSTNESS: a deliberately saturated filter (m=64 bits for
  *    thousands of keys ⇒ ~every probe passes) still yields the exact
  *    result — correctness never depends on the filter's sizing, only
  *    the pruning rate does.
  *  - SELECTIVITY: on a corpus disjoint from the benchmark, a
  *    well-sized filter prunes (nearly) every corpus shingle map-side —
  *    the property that bounds the exchange at 100 TB.
  *  - Parameter validation + empty-benchmark degenerate.
  */
class BloomDecontamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def drain[A](a: => A): A = {
    val r = a
    graft.util.OpCaches.releaseAll(spark)
    r
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) = drain(
    df.select($"doc_id", $"bench_id", round($"containment", 6))
      .as[(Long, Long, Double)].collect().sorted.toSeq)

  test("bloom path == plain containmentPairs on the fixture corpus") {
    val docs = Graft.table(spark, sf, "documents")
    val corpus = docs.filter($"source" =!= "src0")
    val bench = docs.filter($"source" === "src0")
    val plain = pairs(Dedup.containmentPairs(corpus, bench, n = 3, tau = 0.5))
    val bloom = pairs(Dedup.containmentPairsBloom(
      corpus, bench, n = 3, tau = 0.5, bloomBits = 1 << 18, numHashes = 5))
    assert(plain.nonEmpty, "fixture must exercise real contamination")
    assert(bloom === plain)
  }

  test("a saturated 64-bit filter still gives the exact result") {
    val docs = Graft.table(spark, sf, "documents")
    val corpus = docs.filter($"source" =!= "src0")
    val bench = docs.filter($"source" === "src0")
    val plain = pairs(Dedup.containmentPairs(corpus, bench, n = 3, tau = 0.5))
    val bloom = pairs(Dedup.containmentPairsBloom(
      corpus, bench, n = 3, tau = 0.5, bloomBits = 64, numHashes = 2))
    assert(bloom === plain)
  }

  test("disjoint corpus: a well-sized filter prunes everything") {
    // benchmark and corpus share no 3-gram — the exact result is empty,
    // and with m >> k·n the FP tail is ~(kn/m)^k ≈ 0, so the bloom probe
    // should pass (almost) nothing into the verify join; assert the
    // RESULT (empty) and that the operator completes without the verify
    // join exploding the disjoint corpus
    val bench = (1L to 50L)
      .map(i => (i, s"benchmark item alpha$i beta$i gamma$i delta$i"))
      .toDF("doc_id", "text")
    val corpus = (1000L to 1500L)
      .map(i => (i, s"crawl page epsilon$i zeta$i eta$i theta$i iota$i"))
      .toDF("doc_id", "text")
    val out = pairs(Dedup.containmentPairsBloom(
      corpus, bench, n = 3, tau = 0.1, bloomBits = 1 << 16, numHashes = 5))
    assert(out.isEmpty)
  }

  test("fully-quoted benchmark item is caught at containment 1.0") {
    val quoted = "the quick brown fox jumps over the lazy dog tonight"
    val bench = Seq((1L, quoted)).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, s"padding before $quoted padding after words"),
      (101L, "entirely unrelated text with different words only here")
    ).toDF("doc_id", "text")
    val out = pairs(Dedup.containmentPairsBloom(
      corpus, bench, n = 3, tau = 0.9, bloomBits = 1 << 16, numHashes = 5))
    assert(out.map(p => (p._1, p._2)) === Seq((100L, 1L)))
    assert(out.head._3 === 1.0)
  }

  test("empty benchmark yields empty output") {
    val corpus = Seq((1L, "some corpus text here")).toDF("doc_id", "text")
    val bench = corpus.filter(lit(false))
    val out = pairs(Dedup.containmentPairsBloom(
      corpus, bench, n = 3, tau = 0.5, bloomBits = 1 << 10, numHashes = 3))
    assert(out.isEmpty)
  }

  test("parameters are validated") {
    val df = Seq((1L, "x y z w")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.containmentPairsBloom(df, df, n = 3, tau = 0.5, bloomBits = 100)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairsBloom(df, df, n = 3, tau = 0.5, numHashes = 0)
    }
  }
}
