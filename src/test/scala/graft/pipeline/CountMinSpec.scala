package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** Count–Min sketch ([[TextOps.cmSketch]]/[[cmEstimate]]/[[cmChecked]])
  * — the mergeable point-frequency-estimate sketch completing the
  * production sketch family (MG top-k, HLL cardinality, GK quantiles).
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(ds: (Long, String)*): DataFrame =
    ds.toDF("doc_id", "text")

  test("estimates are exact when the sketch is collision-free") {
    val d = docs(
      1L -> "apple apple banana",
      2L -> "apple cherry")
    // 3 distinct tokens into 4x1024 cells: collisions are possible but
    // astronomically unlikely to hit ALL 4 rows; exact equality expected
    val got = TextOps.cmChecked(d,
        Seq("apple", "banana", "cherry", "durian"), depth = 4, width = 1024)
      .as[(String, Long, Long, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("apple")._2 === 3L && got("apple")._3 === 3L)
    assert(got("banana")._2 === 1L && got("banana")._3 === 1L)
    assert(got("cherry")._2 === 1L && got("cherry")._3 === 1L)
    // absent token: exact 0; estimate is collision mass only
    assert(got("durian")._2 === 0L)
    assert(got.values.forall(r => r._4 === 1 && r._5 === 1),
      "ok_over and ok_bound must hold for every probe")
  }

  test("never undercounts, and bounds hold, under heavy collisions") {
    // 200 distinct tokens into a 2x16 sketch: collisions everywhere
    val d = docs((0 until 200).map(i =>
      (i.toLong, s"w$i w$i w${i % 7}")): _*)
    val probes = Seq("w0", "w3", "w6", "w42", "w199", "absent")
    val got = TextOps.cmChecked(d, probes, depth = 2, width = 16)
      .as[(String, Long, Long, Int, Int)].collect()
    assert(got.length === probes.length)
    got.foreach { r =>
      assert(r._3 >= r._2, s"${r._1}: est ${r._3} < exact ${r._2}")
      assert(r._4 === 1)
    }
  }

  test("sketches merge by cell-wise sum (the CM merge property)") {
    val a = docs(1L -> "x x y", 2L -> "z q r s t")
    val b = docs(3L -> "x y y w", 4L -> "q q v")
    val whole = TextOps.cmSketch(
        a.unionByName(b), depth = 3, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    val merged = TextOps.cmSketch(a, 3, 64)
      .unionByName(TextOps.cmSketch(b, 3, 64))
      .groupBy(col("row"), col("cell")).agg(sum(col("c")).as("c"))
      .as[(Int, Long, Long)].collect().toSet
    assert(whole === merged)
  }

  test("sketch size is bounded by depth * width regardless of corpus") {
    val d = docs((0 until 300).map(i => (i.toLong, s"t$i u$i v$i")): _*)
    val n = TextOps.cmSketch(d, depth = 2, width = 16).count()
    assert(n <= 2L * 16L)
  }
}
