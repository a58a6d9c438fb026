package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** BPE vocabulary training ([[graft.text.TextOps.bpeFitWithDict]]):
  *
  *  - HAND-DERIVED MERGES on the classic Sennrich-style fixture
  *    (low×5, lower×2, newest×6, widest×3): four merges computed by
  *    hand, including both tie-break cases — (e,s) beats (s,t) at
  *    count 9 and (l,o) beats (o,w) at count 7, lexicographically.
  *  - GREEDY LEFTMOST overlap: "aaaa" under (a,a) merges positions
  *    1 and 3, never 2 — the fold can only produce [aa, aa].
  *  - EARLY STOP: once every word fuses to a single token the merge
  *    loop ends, emitting fewer rows than requested.
  *  - APPLY = DICTIONARY JOIN: per-doc counts equal Σ over word
  *    occurrences of the fitted dict's size(syms); wordless docs are
  *    absent.
  */
class BpeFitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def drain[A](a: => A): A = {
    val r = a
    graft.util.OpCaches.releaseAll(spark)
    r
  }

  private def sennrich = Seq(
    (0L, Seq.fill(5)("low").mkString(" ")),
    (1L, Seq.fill(2)("lower").mkString(" ")),
    (2L, Seq.fill(6)("newest").mkString(" ")),
    (3L, Seq.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("hand-derived merge table on the Sennrich fixture") {
    val got = drain(
      TextOps.bpeFit(sennrich, merges = 4)
        .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq)
    assert(got === Seq(
      (1L, "e", "s", 9L),   // tie with (s,t) at 9 — lexicographic
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),   // tie with (o,w) at 7 — lexicographic
      (4L, "lo", "w", 7L)))
  }

  test("greedy leftmost non-overlapping merge application") {
    val docs = Seq((0L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val (merges, dict) = TextOps.bpeFitWithDict(docs, merges = 5)
    val syms = dict.select("syms").as[Seq[String]].collect()
    graft.util.OpCaches.releaseAll(spark)
    // step 1: (a,a) at 9 weighted positions -> [aa, aa]; step 2:
    // (aa,aa) at 3 -> [aaaa]; then no pairs remain -> early stop
    assert(merges === Seq((1L, "a", "a", 9L), (2L, "aa", "aa", 3L)))
    assert(syms.toSeq === Seq(Seq("aaaa")))
  }

  test("apply counts = dictionary-join sums; wordless docs absent") {
    val docs = sennrich.union(Seq((4L, "   ")).toDF("doc_id", "text"))
    val got = drain(
      TextOps.bpeApplyCounts(docs, merges = 4)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq)
    // fitted dict: low->1 token, lower->[low,e,r]=3, newest->[n,e,w,est]=4,
    // widest->[w,i,d,est]=4
    assert(got === Seq((0L, 5L), (1L, 6L), (2L, 24L), (3L, 12L)))
  }

  test("merge step leaves non-matching and reversed-order words untouched") {
    import org.apache.spark.sql.functions._
    val syms = Seq(
      Seq("x", "y", "x"),       // no (x,x) adjacency
      Seq("b", "a"),            // reversed pair must NOT merge
      Seq("a"), Seq.empty[String])
      .toDF("syms")
    val got = syms
      .select(TextOps.bpeMergeStep(col("syms"), "a", "b").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(
      Seq("x", "y", "x"), Seq("b", "a"), Seq("a"), Seq.empty[String]))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException](TextOps.bpeFit(sennrich, merges = 0))
  }

  test("bpeStats: hand-derived fertility and compression per source") {
    // sennrich fixture + a source column: all four docs in one source
    val docs = sennrich.withColumn("source",
      org.apache.spark.sql.functions.lit("srcX"))
    val got = drain(TextOps.bpeStats(docs, merges = 4)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq)
    // dict after 4 merges: low->1 token/3 chars, lower->3/5,
    // newest->4/6, widest->4/6; occurrences 5/2/6/3:
    // n_words = 16, n_bpe = 5*1+2*3+6*4+3*4 = 47,
    // n_chars = 5*3+2*5+6*6+3*6 = 79
    assert(got === Seq(
      ("srcX", 16L, 47L, 79L, 47.0 / 16, 79.0 / 47)))
  }
}
