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

  test("eow marker separates word-final from word-internal pairs: the " +
      "first merge flips on a boundary-sensitive fixture") {
    // "ab ab cb": bare split counts (a,b)=2 > (c,b)=1 -> merge (a,b).
    // With </w> appended, the word-FINAL pair (b,</w>) counts 3 —
    // every b is word-final — and wins step 1; step 2 then merges
    // (a, b</w>), a token the bare split cannot express
    val docs = Seq((0L, "ab ab cb")).toDF("doc_id", "text")
    val bare = drain(TextOps.bpeFit(docs, merges = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq)
    assert(bare.head === ((1L, "a", "b", 2L)))
    val eow = drain(TextOps.bpeFit(docs, merges = 2, eow = true)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq)
    assert(eow === Seq(
      (1L, "b", "</w>", 3L),
      (2L, "a", "b</w>", 2L)))
  }

  test("bpeFitStore persists the fit; bpeModelOrFit reads a fresh store " +
      "without refitting and refits on any meta mismatch") {
    val path = "target/graft_stores/bpe_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path))
    val stored = drain(TextOps.bpeFitStore(sennrich, merges = 4, path)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq)
    val inline = drain(TextOps.bpeFit(sennrich, merges = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq)
    assert(stored === inline)
    // fresh store: the read-back model matches the inline fit, and the
    // merges parquet's mtime proves no rewrite happened on the re-read
    def mtime() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/merges")).map(_.lastModified).max
    }
    val t0 = mtime()
    val (ms, dict) = TextOps.bpeModelOrFit(sennrich, merges = 4, path)
    val viaStore = drain(ms.as[(Long, String, String, Long)]
      .collect().sortBy(_._1).toSeq)
    assert(viaStore === inline && mtime() === t0)
    assert(drain(dict.count()) === 4) // low, lower, newest, widest
    // different merge count -> meta mismatch -> refit + rewrite
    val (ms3, _) = TextOps.bpeModelOrFit(sennrich, merges = 3, path)
    assert(drain(ms3.count()) === 3 && mtime() > t0)
    // corpus change (fingerprint mismatch) -> refit
    val grown = sennrich.union(Seq((9L, "zz zz")).toDF("doc_id", "text"))
    val (_, dictG) = TextOps.bpeModelOrFit(grown, merges = 3, path)
    assert(drain(dictG.count()) === 5)
  }

  test("packSequencesBpe bins by fitted-vocab counts and keeps wordless " +
      "docs as 0-token rows") {
    // the vocab is fitted on the sennrich fixture (merges hand-derived
    // above: low->1 token, lower->3, newest->4, widest->4) and applied
    // to a DIFFERENT batch — fit-once/featurize-many
    val docs = Seq(
      (0L, "low low low low low"),   // 5 words x 1 token = 5
      (1L, "lower lower"),           // 2 words x 3 tokens = 6
      (2L, "   "),                   // wordless -> 0 tokens
      (3L, "newest widest")          // 4 + 4 = 8
    ).toDF("doc_id", "text")
    val (_, dict) = TextOps.bpeFitWithDict(sennrich, merges = 4)
    val got = TextOps.packSequencesBpe(docs, dict, budget = 6L, shards = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    graft.util.OpCaches.releaseAll(spark)
    // one shard, doc_id order; cum before each doc: 0, 5, 11, 11 ->
    // bins 0//6=0, 5//6=0, 11//6=1, 11//6=1
    assert(got === Seq(
      (0L, 0L, 0L, 5L), (1L, 0L, 0L, 6L),
      (2L, 0L, 1L, 0L), (3L, 0L, 1L, 8L)))
  }
}
