package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** The ExactSubstr REMOVAL half ([[Dedup.applySubstringCuts]], Lee et
  * al. ACL'22) and DSIR importance RESAMPLING
  * ([[TextOps.dsirSample]], Xie et al. NeurIPS'23) — the round-14
  * completions of the detection/scoring operators added in round 13.
  */
class SubstringCutDsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs(ds: (Long, String)*): DataFrame = ds.toDF("doc_id", "text")

  // a 16-token run shared verbatim by two documents (w = 16 ⇒ exactly
  // one duplicated window per occurrence, since every other window
  // crosses into distinct filler)
  private val common = (1 to 16).map(i => s"c$i").mkString(" ")

  test("applySubstringCuts removes exactly the duplicated spans") {
    val a = s"a1 a2 a3 a4 a5 $common a6 a7 a8 a9 a10"
    val b = s"b1 b2 b3 b4 $common b5 b6"
    val c = "unique tokens only nothing repeats here at all"
    val d = docs(1L -> a, 2L -> b, 3L -> c)
    val spans = Dedup.substringDupSpans(d, w = 16)
    val sp = spans.as[(Long, Long, Long)].collect().toSet
    assert(sp === Set((1L, 5L, 21L), (2L, 4L, 20L)))
    val cut = Dedup.applySubstringCuts(d, spans)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(cut(0) === ((1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10", 16L)))
    assert(cut(1) === ((2L, "b1 b2 b3 b4 b5 b6", 16L)))
    // uncut doc passes through token-rejoined with n_removed = 0
    assert(cut(2) === ((3L, c, 0L)))
  }

  test("applySubstringCuts: self-repetition within one doc is cut once merged") {
    // the same 16-token run twice in ONE doc, adjacent starts ⇒ the
    // duplicated windows merge into one maximal span covering both
    val t = s"$common $common tail1 tail2"
    val d = docs(7L -> t)
    val spans = Dedup.substringDupSpans(d, w = 16)
    val sp = spans.as[(Long, Long, Long)].collect().toSet
    assert(sp === Set((7L, 0L, 32L)))
    val cut = Dedup.applySubstringCuts(d, spans)
      .as[(Long, String, Long)].collect()
    assert(cut.toSeq === Seq((7L, "tail1 tail2", 32L)))
  }

  test("applySubstringCuts: doc cut to nothing yields empty text, all docs survive") {
    val d = docs(1L -> common, 2L -> common, 3L -> "short unique doc")
    val cut = Dedup
      .applySubstringCuts(d, Dedup.substringDupSpans(d, w = 16))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(cut.length === 3)
    assert(cut(0) === ((1L, "", 16L)))
    assert(cut(1) === ((2L, "", 16L)))
    assert(cut(2)._3 === 0L)
  }

  private val rawDocs = docs((1L to 10L).map(i =>
    i -> s"alpha beta gamma delta tok$i tok${i + 1} epsilon zeta"): _*)
  private val tgtDocs = docs(
    100L -> "alpha beta gamma delta epsilon zeta eta theta",
    101L -> "alpha beta gamma delta iota kappa")

  test("dsirSample keeps ceil(f*n) docs — the top-k by truncated Gumbel key") {
    val all = TextOps.dsirSample(rawDocs, tgtDocs, keepFraction = 1.0)
      .as[(Long, Double, Double)].collect()
    assert(all.length === 10, "keepFraction=1 keeps every scored doc")
    val sample = TextOps.dsirSample(rawDocs, tgtDocs, keepFraction = 0.3)
      .as[(Long, Double, Double)].collect()
    assert(sample.length === 3, "ceil(0.3 * 10) = 3")
    // the selected set IS the top-3 of the full keyed set under
    // (g_key desc, doc_id asc) — and repeated runs agree exactly
    val expected = all.sortBy(r => (-r._3, r._1)).take(3).toSeq
    assert(sample.sortBy(r => (-r._3, r._1)).toSeq === expected)
    val again = TextOps.dsirSample(rawDocs, tgtDocs, keepFraction = 0.3)
      .as[(Long, Double, Double)].collect()
    assert(again.sortBy(r => (-r._3, r._1)).toSeq === expected)
  }

  test("dsirSample carries dsirScore's scores unchanged") {
    val scores = TextOps.dsirScore(rawDocs, tgtDocs)
      .select(col("doc_id"), col("dsir_score"))
      .as[(Long, Double)].collect().toMap
    TextOps.dsirSample(rawDocs, tgtDocs, keepFraction = 0.5)
      .as[(Long, Double, Double)].collect()
      .foreach { case (id, s, _) => assert(scores(id) === s) }
  }

  test("dsirSample rejects out-of-range keepFraction") {
    intercept[IllegalArgumentException] {
      TextOps.dsirSample(rawDocs, tgtDocs, keepFraction = 0.0)
    }
    intercept[IllegalArgumentException] {
      TextOps.dsirSample(rawDocs, tgtDocs, keepFraction = 1.5)
    }
  }
}
