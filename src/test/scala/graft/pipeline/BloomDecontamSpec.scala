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
      // < 64 bits would leave the word array empty while masked
      // positions still address word 0 (the r12 advice finding)
      Dedup.containmentPairsBloom(df, df, n = 3, tau = 0.5, bloomBits = 32)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairsBloom(df, df, n = 3, tau = 0.5, numHashes = 0)
    }
  }

  test("bloomSizing: m tracks the key count at the target FP rate, " +
      "rounds to a power of two, and respects the cap") {
    def bitsPerKey(m: Int, n: Long) = m.toDouble / n
    // the textbook optimum for p=0.01 is ~9.59 bits/key — rounding up
    // to a power of two can at most double it
    for (n <- Seq(1000L, 100000L, 10000000L)) {
      val (m, k) = Dedup.bloomSizing(n, 0.01, maxBits = 1 << 28)
      assert((m & (m - 1)) === 0)
      assert(bitsPerKey(m, n) >= 9.5, s"undersized for n=$n: m=$m")
      assert(bitsPerKey(m, n) <= 19.3, s"oversized for n=$n: m=$m")
      assert(k >= 1 && k <= 16)
    }
    // monotone: a 10x benchmark never gets a smaller filter
    val grown = Seq(1000L, 10000L, 100000L, 1000000L)
      .map(n => Dedup.bloomSizing(n, 0.01, 1 << 28)._1)
    assert(grown === grown.sorted)
    // the cap binds (driver memory stays bounded; FP degrades, not
    // correctness)
    assert(Dedup.bloomSizing(1000000000L, 0.01, 1 << 20)._1 === (1 << 20))
    // floors: tiny benchmarks still get a >= 1024-bit filter
    assert(Dedup.bloomSizing(1L, 0.01, 1 << 20)._1 >= 1024)
    intercept[IllegalArgumentException] { Dedup.bloomSizing(10L, 0.0, 1 << 20) }
    intercept[IllegalArgumentException] { Dedup.bloomSizing(10L, 0.01, 1000) }
  }

  test("sized bloom path == plain containmentPairs on the fixture corpus") {
    val docs = Graft.table(spark, sf, "documents")
    val corpus = docs.filter($"source" =!= "src0")
    val bench = docs.filter($"source" === "src0")
    val plain = pairs(Dedup.containmentPairs(corpus, bench, n = 3, tau = 0.5))
    val sized = pairs(Dedup.containmentPairsBloomSized(
      corpus, bench, n = 3, tau = 0.5, fpRate = 0.01))
    assert(plain.nonEmpty)
    assert(sized === plain)
  }

  test("large-m broadcast route == plan-literal route, with the probe " +
      "still below the verify exchange") {
    val docs = Graft.table(spark, sf, "documents")
    val corpus = docs.filter($"source" =!= "src0")
    val bench = docs.filter($"source" === "src0")
    val lit = pairs(Dedup.containmentPairsBloom(
      corpus, bench, n = 3, tau = 0.5, bloomBits = 1 << 16, numHashes = 5))
    // force the broadcast route by setting the literal bound BELOW m:
    // same filter bits, same probe arithmetic, shipped as a one-row
    // broadcast instead of a plan literal
    val bcastDf = Dedup.containmentPairsBloom(
      corpus, bench, n = 3, tau = 0.5, bloomBits = 1 << 16, numHashes = 5,
      maxLiteralBits = 1 << 10)
    val plan = bcastDf.queryExecution.executedPlan.toString
    val bcast = pairs(bcastDf)
    assert(bcast === lit)
    // route check: the word array must ride a single-row broadcast
    // nested-loop join (the no-plan-literal shipping path)
    assert(plan.contains("_bloom_words"),
      s"broadcast route not taken:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"one-row broadcast join missing:\n${plan.take(1200)}")
  }
}
