package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** The Misra–Gries heavy-hitters summary ([[graft.text.MisraGries]] /
  * [[TextOps.heavyHitters]] / [[TextOps.heavyHittersChecked]]):
  *
  *  - BOUNDS: on a Zipf-ish corpus, every surviving counter
  *    undercounts by at most N/(m+1) and every token with true count >
  *    N/(m+1) survives — the two guarantees the driver-gated verdicts
  *    assert.
  *  - MERGE INVARIANCE: the bounds hold at 1 partition and at many
  *    (different merge trees), and the CHECKED head's output is
  *    bit-identical across partitionings — the determinism the oracle
  *    gate depends on.
  *  - EXACT HEAD: the checked head's (token, cnt) rows are exactly the
  *    exact top-k.
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Zipf-ish synthetic corpus: token t_r appears ~1200/r times for
  // r = 1..40, shuffled deterministically across 300 docs
  private lazy val docs = {
    val toks = (1 to 40).flatMap(r => Seq.fill(1200 / r)(s"t$r"))
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(toks)
    shuffled.grouped(math.max(1, shuffled.size / 300)).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  private def exactCounts: Map[String, Long] =
    docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("summary bounds: undercount <= N/(m+1), coverage above N/(m+1), " +
    "at most m counters — across partitionings") {
    val m = 16
    val exact = exactCounts
    val n = exact.values.sum
    val bound = n / (m + 1L)
    for (parts <- Seq(1, 7)) {
      val est = TextOps.heavyHitters(docs.repartition(parts), m)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.size <= m)
      est.foreach { case (t, e) =>
        val c = exact(t)
        assert(e <= c, s"$t overcounted: est $e > true $c")
        assert(c - e <= bound, s"$t undercount ${c - e} > bound $bound")
      }
      exact.foreach { case (t, c) =>
        if (c > bound)
          assert(est.contains(t), s"heavy token $t (count $c) missing")
      }
    }
  }

  test("checked head: exact top-k rows, all verdicts 1, bit-identical " +
    "across partitionings") {
    val k = 10
    val expected = exactCounts.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(k)
    for (parts <- Seq(1, 7)) {
      val got = TextOps.heavyHittersChecked(docs.repartition(parts), m = 16, k = k)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
      graft.util.OpCaches.releaseAll(spark)
      assert(got.map(r => (r._1, r._2)) == expected)
      assert(got.forall(r => r._3 == 1 && r._4 == 1))
    }
  }

  test("a tiny summary (m=2) on a skewed stream still keeps the one " +
    "dominant token") {
    val skew = (Seq.fill(500)("big") ++ (1 to 100).map(i => s"rare$i"))
    val d = new scala.util.Random(3).shuffle(skew)
      .grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val est = TextOps.heavyHitters(d, m = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = 600, bound = 200; "big" has 500 > 200 so it must survive
    assert(est.contains("big"))
    assert(est("big") <= 500L && 500L - est("big") <= 200L)
  }
}
