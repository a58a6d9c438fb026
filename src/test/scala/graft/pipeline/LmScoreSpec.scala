package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** Bigram LM perplexity scoring (CCNet-style quality filter). The
  * first test re-derives the whole model in plain Scala from the same
  * tokenization and asserts bit-equal scores — an in-process oracle
  * independent of the DataFrame plan; the rest pin the invariants the
  * score's downstream users (quality sampling) rely on.
  */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs(ds: (Long, String)*): DataFrame = ds.toDF("doc_id", "text")

  val corpus: Seq[(Long, String)] = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran to the mat"),
    (3L, "the dog sat on the rug"),
    (4L, "a dog ran to the rug"),
    (5L, "the cat sat on the mat"),
    (6L, "zq xv qj zz pw"),
    (7L, "the dog ran to the mat"),
    (8L, "a cat sat on a rug"),
    (9L, "the mat the cat the dog"),
    (10L, "on the mat sat the cat"),
    (11L, "to the rug ran the dog"),
    (12L, "a a a a a a"),
    // 16 -> val, 19 -> test (md5 buckets 8 / 9): scored by the model
    // without ever contributing to it
    (16L, "the cat sat on the rug"),
    (19L, "qq ww ee rr tt yy"))

  private def splits: Map[Long, String] =
    docs(corpus: _*)
      .select($"doc_id", TextOps.assignSplit($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap

  test("lmScore matches a hand-rolled add-one bigram model bit-exactly") {
    val d = docs(corpus: _*)
    // identical tokenization via the engine's own column function
    val toks: Map[Long, Seq[String]] = d
      .select($"doc_id", TextOps.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    val train = splits.filter(_._2 == "train").keySet
    assert(train.nonEmpty && train.size < corpus.size)

    def bigrams(t: Seq[String]): Seq[(String, String)] =
      t.zipWithIndex.map { case (cur, i) =>
        (if (i == 0) "<s>" else t(i - 1), cur)
      }
    val trainBg = corpus.map(_._1).filter(train).flatMap(id => bigrams(toks(id)))
    val c2 = trainBg.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val c1 = trainBg.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val v = trainBg.map(_._2).distinct.size.toDouble

    val expected = corpus.map { case (id, _) =>
      val bg = bigrams(toks(id))
      // left fold in position order — the engine's determinism contract
      val raw = bg.foldLeft(0.0) { case (acc, (p, c)) =>
        acc + -math.log(
          (c2.getOrElse((p, c), 0.0) + 1.0) / (c1.getOrElse(p, 0.0) + v))
      }
      id -> (toks(id).size.toLong,
        math.floor(raw / toks(id).size * 1e6) / 1e6)
    }.toMap

    val got = TextOps.lmScore(d)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap
    assert(got === expected)
  }

  test("lmScore is invariant to input partitioning") {
    val d = docs(corpus: _*)
    val a = TextOps.lmScore(d).as[(Long, Long, Double)].collect().sortBy(_._1)
    val b = TextOps.lmScore(d.repartition(7))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("lmScoreFromStore == lmScore bit-exactly (fit-once/score-many)") {
    val d = docs(corpus: _*)
    // per-run temp dir: a fixed path would let a stale store from a
    // previous run mask staleness bugs (overwrite mode hides leftovers)
    // and collide under concurrent test runs
    val storeDir =
      java.nio.file.Files.createTempDirectory("lm_spec_").toFile
    storeDir.deleteOnExit()
    val store = storeDir.getAbsolutePath + "/model"
    TextOps.writeLmModel(d, store)
    val inline = TextOps.lmScore(d)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val stored = TextOps.lmScoreFromStore(d, store)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(inline.toSeq === stored.toSeq)
    // scoring a DIFFERENT batch against the stored model works (the
    // daily-gate shape: the model never refits per batch)
    val batch = docs((100L, "the cat sat on the rug"), (101L, "zz qq ww"))
    val got = TextOps.lmScoreFromStore(batch, store)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got.keySet === Set(100L, 101L))
    assert(got(100L) < got(101L))
    org.apache.commons.io.FileUtils.deleteQuietly(storeDir)
  }

  test("hot-head broadcast cap: a cap of 0 degrades to the plain " +
      "shuffle join with bit-identical scores") {
    import org.apache.spark.sql.execution.UnionExec
    val d = docs(corpus: _*)
    val normalDf = TextOps.lmScore(d)
    // the split path is recognizable by its hot/tail UNION (the plain
    // join has none — BHJ presence alone is ambiguous on a fixture this
    // small, where the planner may auto-broadcast the aggregates)
    assert(normalDf.queryExecution.sparkPlan
        .collect { case u: UnionExec => u }.nonEmpty,
      "under-cap path must take the hot/tail split")
    val normal = normalDf
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    graft.util.OpCaches.releaseAll(spark)
    // cap 0 = the web-scale regime where the hot successor lists exceed
    // the broadcast bound: the operator must fall back to the plain
    // (unsplit) join and score identically
    val cappedDf = TextOps.lmScoreCapped(d, hotBroadcastMaxRows = 0L)
    val capped = cappedDf
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(capped === normal)
    val unions = cappedDf.queryExecution.sparkPlan
      .collect { case u: UnionExec => u }
    graft.util.OpCaches.releaseAll(spark)
    assert(unions.isEmpty,
      "hot/tail split still present despite an exceeded cap")
  }

  test("in-distribution text scores lower than gibberish") {
    val got = TextOps.lmScore(docs(corpus: _*))
      .as[(Long, Long, Double)].collect()
      .map { case (id, _, s) => id -> s }.toMap
    // 16 (val) and 19 (test) are both held out of the model: 16's
    // bigrams recur across the train corpus, 19's are unseen noise
    assert(got(16L) < got(19L))
  }
}
