package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** Positional phrase search ([[TextOps.phraseSearch]]), the fastText-shaped
  * linear classifier ([[TextOps.classifierScore]]), and CCNet perplexity
  * terciles ([[TextOps.pplBuckets]]).
  */
class PhraseClassifierPplSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- phrase

  private def hits(docs: Seq[(Long, String)], phrase: Seq[String], k: Int = 10) =
    TextOps.phraseSearch(docs.toDF("doc_id", "text"), phrase, k)
      .as[(Long, Long)].collect().toSeq

  test("phraseSearch counts overlapping occurrences at every start") {
    // "a a a" contains "a a" at starts 0 and 1 — overlapping matches count
    assert(hits(Seq((1L, "a a a")), Seq("a", "a")) === Seq((1L, 2L)))
  }

  test("phraseSearch requires exact adjacency, not co-occurrence") {
    val docs = Seq(
      (1L, "new york city"),   // phrase present
      (2L, "york new city"),   // both terms, wrong order
      (3L, "new haven york"))  // both terms, not adjacent
    assert(hits(docs, Seq("new", "york")) === Seq((1L, 1L)))
  }

  test("phraseSearch orders by hit count desc, doc_id tiebreak, limit k") {
    val docs = Seq(
      (5L, "x y x y x y"), // 3 hits
      (2L, "x y q x y"),   // 2 hits
      (9L, "q x y q"),     // 1 hit
      (1L, "x y z"))       // 1 hit
    assert(hits(docs, Seq("x", "y")) ===
      Seq((5L, 3L), (2L, 2L), (1L, 1L), (9L, 1L)))
    assert(hits(docs, Seq("x", "y"), k = 2) === Seq((5L, 3L), (2L, 2L)))
  }

  test("phraseSearch: docs shorter than the phrase yield no row") {
    assert(hits(Seq((1L, "a b"), (2L, "a")), Seq("a", "b", "c")) === Seq())
  }

  test("phraseSearch with a 1-term phrase degenerates to term frequency") {
    assert(hits(Seq((1L, "t q t t"), (2L, "q q")), Seq("t")) ===
      Seq((1L, 3L)))
  }

  test("phraseSearch rejects empty phrase and non-positive k") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextOps.phraseSearch(df, Seq(), 1))
    intercept[IllegalArgumentException](TextOps.phraseSearch(df, Seq("a"), 0))
  }

  // ------------------------------------------------------------ classifier

  /** The operator's hash-derived weight, recomputed independently. */
  private def refWeight(tok: String, nBuckets: Int = 1024): Double = {
    def h(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map(x => f"$x%02x").mkString,
      16)
    val b = h(tok) % nBuckets
    (h(s"w:$b") % 2001 - 1000).toDouble / 1000.0
  }

  test("classifierScore equals the sigmoid of the mean hash-derived weight") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha"))
    val got = TextOps.classifierScore(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    def expect(toks: Seq[String]): Double = {
      val mean = toks.foldLeft(0.0)(_ + refWeight(_)) / toks.length
      math.floor(1.0 / (1.0 + math.exp(-mean)) * 1e6) / 1e6
    }
    assert(got === Seq(
      (1L, 3L, expect(Seq("alpha", "beta", "gamma"))),
      (2L, 1L, expect(Seq("alpha")))))
  }

  test("classifierScore is bounded in (0, 1) and partitioning-invariant") {
    val docs = (0L until 40L).map(i => (i, s"tok$i common words here"))
    val df = docs.toDF("doc_id", "text")
    val a = TextOps.classifierScore(df)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = TextOps.classifierScore(df.repartition(7))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a === b)
    assert(a.forall { case (_, _, s) => s > 0.0 && s < 1.0 })
  }

  // ------------------------------------------------------------------- ppl

  test("pplBuckets replicates NTILE(3) remainder semantics and orders by score") {
    // 7 docs => ntile sizes 3, 2, 2 (first bucket takes the remainder)
    val docs = (0L until 7L)
      .map(i => (i, ("w " * (3 + i.toInt)).trim + s" unique$i"))
    val got = TextOps.pplBuckets(docs.toDF("doc_id", "text"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("head", "middle", "tail"))
    assert(got("head")._2 === 3L)
    assert(got("middle")._2 === 2L)
    assert(got("tail")._2 === 2L)
    // tercile boundaries are ordered: head holds the LOWEST lm scores
    assert(got("head")._5 <= got("middle")._4)
    assert(got("middle")._5 <= got("tail")._4)
  }

  test("pplBuckets conserves doc and token totals") {
    val docs = (0L until 30L)
      .map(i => (i, (0 to (i % 5).toInt).map(j => s"w${(i + j) % 7}").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.pplBuckets(df)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2).sum === 30L)
    val totalTokens = df.select(sum(size(split(trim(col("text")), "\\s+"))))
      .as[Long].collect()(0)
    assert(got.map(_._3).sum === totalTokens)
  }

  test("pplBuckets agrees with a direct ntile over the collected lm scores") {
    val docs = (0L until 23L)
      .map(i => (i, (0 to (i % 6).toInt).map(j => s"t${(i * 3 + j) % 11}").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val scored = TextOps.lmScore(df)
      .select(col("doc_id"), col("lm_score"))
      .as[(Long, Double)].collect().sortBy(r => (r._2, r._1)).toSeq
    graft.util.OpCaches.releaseAll(spark)
    val n = scored.length
    val (q, rem) = (n / 3, n % 3)
    val sizes = (0 until 3).map(b => if (b < rem) q + 1 else q)
    val expected = sizes.zip(Seq("head", "middle", "tail"))
      .foldLeft((Map.empty[String, Long], 0)) {
        case ((m, off), (sz, lbl)) => (m + (lbl -> sz.toLong), off + sz)
      }._1.filter(_._2 > 0)
    val got = TextOps.pplBuckets(df)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got === expected)
  }

  // ----------------------------------------------------------- calibration

  /** Driver-side NTILE reference over a (q, doc_id)-sorted source slice. */
  private def refNtile(n: Int, ranked: Seq[Long]): Map[Long, Long] = {
    val total = ranked.length
    val (qs, rem) = (total / n, total % n)
    ranked.zipWithIndex.map { case (id, i) =>
      val b = if (i < rem * (qs + 1)) i / (qs + 1)
              else rem + (i - rem * (qs + 1)) / math.max(qs, 1)
      id -> (b + 1L)
    }.toMap
  }

  test("qualityCalibration ranks within each source independently and " +
      "replicates NTILE remainder semantics") {
    // 2 sources × uneven sizes (7 and 13) against nBuckets = 5:
    // source a has rem 2, source b rem 3 — both remainder paths hit
    val docs = (0L until 20L).map { i =>
      val src = if (i < 7) "a" else "b"
      (i, src, (0 to (i % 6).toInt).map(j => s"w${(i * 7 + j) % 13}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "source", "text")
    val got = TextOps.qualityCalibration(df, nBuckets = 5)
      .as[(Long, String, Double, Long)].collect().toSeq
    graft.util.OpCaches.releaseAll(spark)
    assert(got.length === 20)
    val bySrc = got.groupBy(_._2)
    bySrc.foreach { case (_, rows) =>
      val ranked = rows.sortBy(r => (r._3, r._1)).map(_._1)
      val expect = refNtile(5, ranked)
      rows.foreach(r => assert(r._4 === expect(r._1),
        s"doc ${r._1} decile ${r._4} != ${expect(r._1)}"))
    }
    // per-source independence: each source's deciles span 1..5 on its own
    assert(bySrc("a").map(_._4).min === 1L && bySrc("a").map(_._4).max === 5L)
    assert(bySrc("b").map(_._4).min === 1L && bySrc("b").map(_._4).max === 5L)
  }

  test("qualityCalibration: a source smaller than nBuckets degenerates to " +
      "one row per decile (NTILE semantics)") {
    val df = Seq(
      (1L, "tiny", "a b c"), (2L, "tiny", "d e f g h"),
      (3L, "tiny", "i j")).toDF("doc_id", "source", "text")
    val got = TextOps.qualityCalibration(df, nBuckets = 10)
      .as[(Long, String, Double, Long)].collect().toSeq
    graft.util.OpCaches.releaseAll(spark)
    assert(got.map(_._4).sorted === Seq(1L, 2L, 3L))
  }

  test("qualityCalibration on an empty corpus returns the empty shape") {
    val df = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(TextOps.qualityCalibration(df).count() === 0L)
  }

  // ------------------------------------------------------------ source cap

  test("sourceCap keeps exactly the per-source top-cap by quality with " +
      "doc_id tiebreak (ranks included)") {
    // 3 sources × 10 docs with varied shapes; cap 4 forces both the kept
    // and dropped branches, and with 4 shuffle partitions some
    // (partition, source) slices start past the cap — the prune path
    val docs = (0L until 30L).map { i =>
      val src = s"s${i % 3}"
      (i, src, (0 to (i % 7).toInt).map(j => s"w${(i * 5 + j) % 11}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "source", "text")
    val got = TextOps.sourceCap(df, cap = 4)
      .as[(Long, String, Double, Long)].collect().toSeq
    graft.util.OpCaches.releaseAll(spark)
    // reference: naive per-source sort of the SAME truncated scores
    val scored = df.select($"doc_id", $"source",
      (floor(TextOps.qualityScore($"text") * 1e6) / 1e6).as("q"))
      .as[(Long, String, Double)].collect().toSeq
    val expect = scored.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(4).zipWithIndex
        .map { case ((id, s, q), i) => (id, s, q, (i + 1).toLong) }
    }.toSet
    assert(got.toSet === expect)
    assert(got.groupBy(_._2).forall(_._2.length === 4))
  }

  test("sourceCap with cap >= group size keeps everything and is " +
      "partitioning-invariant") {
    val docs = (0L until 12L).map(i => (i, s"s${i % 2}", s"w$i a b"))
    val df = docs.toDF("doc_id", "source", "text")
    val a = TextOps.sourceCap(df, cap = 100)
      .as[(Long, String, Double, Long)].collect().toSet
    graft.util.OpCaches.releaseAll(spark)
    val b = TextOps.sourceCap(df.repartition(7), cap = 100)
      .as[(Long, String, Double, Long)].collect().toSet
    graft.util.OpCaches.releaseAll(spark)
    assert(a === b)
    assert(a.size === 12)
  }

  test("sourceCap on an empty corpus returns the empty shape; rejects " +
      "non-positive cap") {
    val df = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(TextOps.sourceCap(df, 3).count() === 0L)
    intercept[IllegalArgumentException](TextOps.sourceCap(df, 0))
  }

  // ----------------------------------------------------- stratified sample

  test("stratifiedSample keeps exactly k docs per source, the k smallest " +
      "hash draws, reproducibly") {
    val docs = (0L until 40L).map(i => (i, s"s${i % 4}", s"text $i"))
    val df = docs.toDF("doc_id", "source", "text")
    val got = TextOps.stratifiedSample(df, k = 3)
      .as[(Long, String, Double, Long)].collect().toSeq
    graft.util.OpCaches.releaseAll(spark)
    assert(got.groupBy(_._2).forall(_._2.length === 3))
    // reference: the same hashUniform draw, smallest-3 per source
    val draws = df.select($"doc_id", $"source",
      TextOps.hashUniform($"doc_id", "strat").as("u"))
      .as[(Long, String, Double)].collect().toSeq
    val expect = draws.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(3).zipWithIndex
        .map { case ((id, s, u), i) => (id, s, u, (i + 1).toLong) }
    }.toSet
    assert(got.toSet === expect)
    // reproducible: a different partitioning keeps the same sample
    val again = TextOps.stratifiedSample(df.repartition(9), k = 3)
      .as[(Long, String, Double, Long)].collect().toSet
    graft.util.OpCaches.releaseAll(spark)
    assert(again === got.toSet)
  }

  test("corpusReport: exact per-source volumes, dup rate, lang agreement, " +
      "and a quality p50 bracketed by min/max") {
    val df = Seq(
      (1L, "s1", "en", "the cat and the dog in a house"),
      (2L, "s1", "es", "the cat and the dog in a house"), // dup; pred en != es
      (3L, "s1", "en", "unique wording entirely different okay"),
      (4L, "s2", "en", "the only doc of source two"))
      .toDF("doc_id", "source", "lang", "text")
    val got = TextOps.corpusReport(df)
      .as[(String, Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val s1 = got("s1")
    assert((s1._2, s1._3, s1._4) === ((3L, 21L, 2L)))
    assert(s1._5 === 0.333333) // 1 duplicate of 3 docs
    assert(s1._6 === 0.666667) // doc 2's declared es never matches pred en
    // p50 is the median of the three per-doc truncated scores
    val qs = TextOps.analyze(df.filter($"source" === "s1"))
      .select($"quality").as[Double].collect().sorted
    assert(s1._7 === qs(1) && s1._8 === qs(0) && s1._9 === qs(2))
    val s2 = got("s2")
    assert((s2._2, s2._4, s2._5, s2._6) === ((1L, 1L, 0.0, 1.0)))
    assert(s2._7 === s2._8 && s2._8 === s2._9) // single doc: p50=min=max
  }

  test("stratifiedSample draw is independent of the split assignment " +
      "(distinct salts) and rejects non-positive k") {
    val df = (0L until 200L).map(i => (i, "s", s"t$i"))
      .toDF("doc_id", "source", "text")
    val kept = TextOps.stratifiedSample(df, k = 50)
      .as[(Long, String, Double, Long)].collect().map(_._1).toSet
    graft.util.OpCaches.releaseAll(spark)
    // if the draw correlated with splitBucket, the 25% sample would
    // systematically over/under-represent the 80% train bucket
    val trainKept = df.filter(TextOps.assignSplit($"doc_id") === "train")
      .as[(Long, String, String)].collect().map(_._1).toSet & kept
    assert(trainKept.size > 25 && trainKept.size < 55,
      s"sample correlates with split: ${trainKept.size}/50 train")
    intercept[IllegalArgumentException](TextOps.stratifiedSample(df, 0))
  }
}
