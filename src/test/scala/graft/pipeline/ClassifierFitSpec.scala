package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** Closed-form classifier training ([[graft.text.TextOps.classifierFit]]):
  *
  *  - HAND-DERIVED WEIGHTS: on a fixture where every token lands in its
  *    own bucket, w(b) = cp/tp − cn/tn is checked against exact
  *    fractions.
  *  - SEPARATION: the trained scorer ranks held-out positive-class text
  *    above negative-class text (the placeholder-weight scorer cannot
  *    promise this — that is the point of fitting).
  *  - STORE ≡ REFIT: [[graft.text.TextOps.classifierScoreFromStore]] is
  *    bit-identical to scoring under inline-fitted weights — the store
  *    persists integer sufficient statistics, never floats.
  *  - Validation: a single-class corpus cannot be fit.
  */
class ClassifierFitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def drain[A](a: => A): A = {
    val r = a
    graft.util.OpCaches.releaseAll(spark)
    r
  }

  // wiki-ish (pos) vs crawl-ish (neg) toy corpus
  private def corpus = Seq(
    (0L, "wiki", "alpha beta alpha"),
    (1L, "wiki", "alpha gamma"),
    (2L, "crawl", "spam spam beta"),
    (3L, "crawl", "spam junk")
  ).toDF("doc_id", "source", "text")

  test("weights equal the exact Rocchio fractions") {
    val w = drain(
      TextOps.classifierFit(corpus, col("source") === "wiki", nBuckets = 4096)
        .as[(Long, Double)].collect().toMap)
    def bucket(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(x => f"$x%02x").mkString, 16) % 4096
    }
    // tp = 5 (alpha x3, beta, gamma); tn = 5 (spam x3, beta, junk)
    assert(w(bucket("alpha")) === 3.0 / 5)
    assert(w(bucket("gamma")) === 1.0 / 5)
    assert(w(bucket("beta")) === 1.0 / 5 - 1.0 / 5)
    assert(w(bucket("spam")) === -3.0 / 5)
    assert(w(bucket("junk")) === -1.0 / 5)
    assert(w.size === 5) // 5 distinct tokens, no bucket collisions at 4096
  }

  test("trained scorer separates the classes on held-out text") {
    val weights = drain(TextOps.classifierFitWeights(
      corpus, col("source") === "wiki", nBuckets = 4096))
    val held = Seq(
      (10L, "alpha gamma beta"), // positive-looking
      (11L, "spam junk beta")    // negative-looking
    ).toDF("doc_id", "text")
    val s = TextOps.classifierScoreWith(held, weights)
      .select("doc_id", "cls_score").as[(Long, Double)].collect().toMap
    assert(s(10L) > 0.5 && s(11L) < 0.5 && s(10L) > s(11L))
  }

  test("store-backed scoring is bit-identical to inline fit + score") {
    val path = "target/graft_stores/classifier_spec"
    TextOps.writeClassifierModel(corpus, col("source") === "wiki", path,
      nBuckets = 1024)
    graft.util.OpCaches.releaseAll(spark)
    val inline = drain(TextOps.classifierScoreWith(
      corpus, TextOps.classifierFitWeights(
        corpus, col("source") === "wiki", nBuckets = 1024))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq)
    val stored = TextOps.classifierScoreFromStore(corpus, path)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(stored === inline)
  }

  test("single-class corpus cannot be fit") {
    intercept[IllegalArgumentException](drain(
      TextOps.classifierFit(corpus, col("source") === "nope").collect()))
  }
}
