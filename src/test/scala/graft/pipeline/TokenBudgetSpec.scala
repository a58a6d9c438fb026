package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** Token-budget corpus selection ([[TextOps.tokenBudgetSelect]]) and
  * token-denominated source mixing ([[TextOps.tokenBudgetMix]]) — the
  * "compose an N-token training mix" operators.
  */
class TokenBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // quality is monotone in stopword share here: more 'the's (up to the
  // caps) => higher q, so the greedy order is t4 > t3 > t2 > t1
  private def graded: DataFrame = Seq(
    1L -> "zz zz zz zz",
    2L -> "the zz zz zz",
    3L -> "the the zz zz",
    4L -> "the the the zz")
    .toDF("doc_id", "text")

  test("tokenBudgetSelect keeps best-quality docs until the budget") {
    // each doc is 4 tokens; budget 10 => cum-before of the 3rd best doc
    // is 8 < 10 (kept, overshooting to 12), 4th is 12 >= 10 (dropped)
    val got = TextOps.tokenBudgetSelect(graded, 10L)
      .select(col("doc_id"), col("cum_tokens"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(2L, 3L, 4L))
    // cum_tokens is the inclusive running total in (q desc, id) order:
    // 4 (doc 4) -> 8 (doc 3) -> 12 (doc 2)
    assert(got.toSeq === Seq((2L, 12L), (3L, 8L), (4L, 4L)))
  }

  test("tokenBudgetSelect: budget >= corpus keeps everything; the last " +
    "kept doc may overshoot") {
    val all = TextOps.tokenBudgetSelect(graded, 16L)
    assert(all.count() === 4)
    // budget 1: the single best doc is kept (prefix-before 0 < 1)
    val one = TextOps.tokenBudgetSelect(graded, 1L)
      .as[(Long, Double, Long, Long)].collect()
    assert(one.map(_._1).toSeq === Seq(4L))
    assert(one.head._4 === 4L)
  }

  test("tokenBudgetSelect ranks by (q desc, doc_id asc) on quality ties") {
    val tied = Seq(
      10L -> "same text here ok",
      11L -> "same text here ok",
      12L -> "same text here ok")
      .toDF("doc_id", "text")
    val got = TextOps.tokenBudgetSelect(tied, 5L)
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
    // 4-token docs, budget 5: doc 10 (cum-before 0), doc 11 (cum-before
    // 4) kept; doc 12 (cum-before 8) dropped
    assert(got.map(_._1).toSeq === Seq(10L, 11L))
  }

  test("tokenBudgetSelect on an empty corpus returns an empty frame " +
    "with the output schema") {
    val empty = TextOps.tokenBudgetSelect(graded.limit(0), 100L)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq ===
      Seq("doc_id", "q", "n_tokens", "cum_tokens"))
  }

  test("tokenBudgetMix fills each source's slice and drops unlisted " +
    "sources") {
    val docs = Seq(
      (1L, "srcA", "the the the zz"),
      (2L, "srcA", "the the zz zz"),
      (3L, "srcA", "the zz zz zz"),
      (4L, "srcB", "the the the zz"),
      (5L, "srcB", "zz zz zz zz"),
      (6L, "srcC", "anything at all here"))
      .toDF("doc_id", "source", "text")
    // budget 20, shares A=0.3 B=0.5 (C unlisted): slices floor(6)=6 and
    // floor(10)=10 tokens; A keeps docs 1,2 (cum-before 0, 4; doc 3 at
    // 8 >= 6 drops), B keeps 4,5 (cum-before 0, 4 < 10), C drops
    val got = TextOps.tokenBudgetMix(
      docs, Map("srcA" -> 0.3, "srcB" -> 0.5), 20L)
      .select(col("doc_id"), col("source"), col("cum_tokens"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "srcA", 4L), (2L, "srcA", 8L),
      (4L, "srcB", 4L), (5L, "srcB", 8L)))
  }

  test("select and mix agree with a brute-force greedy fill on the " +
    "sf0.001 documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = docs.select(
      col("doc_id"),
      (floor(TextOps.qualityScore(col("text")) * 1e6) / 1e6).as("q"),
      TextOps.tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, Double, Long)].collect()
    val budget = 9000L
    var acc = 0L
    val expect = scored.sortBy(r => (-r._2, r._1)).flatMap { r =>
      val keep = acc < budget; acc += r._3
      if (keep) Some(r._1) else None
    }.toSet
    assert(expect.nonEmpty && expect.size < scored.length,
      "fixture budget must select a proper subset")
    val got = TextOps.tokenBudgetSelect(docs, budget)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === expect)
  }

  // ---- epoch-capped upsampling mix ([[TextOps.tokenBudgetMixEpochs]]) --

  private def epochDocs: DataFrame = Seq(
    // srcA: 8 tokens/epoch total; srcB big enough to fill in one pass
    (1L, "srcA", "the the the zz"),
    (2L, "srcA", "zz zz zz zz"),
    (3L, "srcB", "the the zz zz"),
    (4L, "srcB", "the zz zz zz"),
    (5L, "srcB", "zz zz zz zz"))
    .toDF("doc_id", "source", "text")

  test("epochs mix: a source that fills in one pass never repeats") {
    // srcB slice floor(0.5*16)=8 tokens: docs 3,4 keep in epoch 0 (doc 5
    // at cum-before 8 >= 8 drops); no epoch-1 row despite cap 3
    val got = TextOps.tokenBudgetMixEpochs(epochDocs,
      Map("srcB" -> 0.5), Map("srcB" -> 3), 16L)
      .select(col("doc_id"), col("epoch"), col("cum_tokens"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((3L, 0L, 4L), (4L, 0L, 8L)))
  }

  test("epochs mix: a small source repeats in identical greedy order, " +
    "epoch e+1 only after all of epoch e") {
    // srcA slice floor(0.5*40)=20 tokens over an 8-token source: epoch 0
    // (docs 1,2 -> cum 4,8), epoch 1 (cum 12,16), epoch 2 doc 1 at
    // cum-before 16 < 20 keeps (cum 20), doc 2 at 20 >= 20 drops
    val got = TextOps.tokenBudgetMixEpochs(epochDocs,
      Map("srcA" -> 0.5), Map("srcA" -> 4), 40L)
      .select(col("doc_id"), col("epoch"), col("cum_tokens"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
    assert(got === Seq(
      (1L, 0L, 4L), (2L, 0L, 8L),
      (1L, 1L, 12L), (2L, 1L, 16L),
      (1L, 2L, 20L)))
  }

  test("epochs mix: the cap binds — an underfilled slice exhausts AT " +
    "the cap, never past it") {
    // srcA slice 20 tokens, cap 2: epochs 0 and 1 keep everything
    // (cum 16 < 20) and NO epoch-2 row exists
    val got = TextOps.tokenBudgetMixEpochs(epochDocs,
      Map("srcA" -> 0.5), Map("srcA" -> 2), 40L)
      .select(col("epoch"), col("cum_tokens"))
      .as[(Long, Long)].collect().sortBy(_._2).toSeq
    assert(got === Seq((0L, 4L), (0L, 8L), (1L, 12L), (1L, 16L)))
    assert(got.map(_._1).max === 1L)
  }

  test("epochs mix: the sized fan-out is semantics-free (cap far above " +
    "need yields the same rows)") {
    val tight = TextOps.tokenBudgetMixEpochs(epochDocs,
      Map("srcA" -> 0.5), Map("srcA" -> 3), 40L)
      .as[(Long, String, Long, Double, Long, Long)].collect().sorted.toSeq
    val loose = TextOps.tokenBudgetMixEpochs(epochDocs,
      Map("srcA" -> 0.5), Map("srcA" -> 100), 40L)
      .as[(Long, String, Long, Double, Long, Long)].collect().sorted.toSeq
    assert(tight === loose)
  }

  test("epochs mix: validation") {
    intercept[IllegalArgumentException](TextOps.tokenBudgetMixEpochs(
      epochDocs, Map("srcA" -> 0.5), Map("srcA" -> 0), 10L))
    intercept[IllegalArgumentException](TextOps.tokenBudgetMixEpochs(
      epochDocs, Map.empty, Map.empty, 10L))
  }
}
