package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession

/** Driver-contract smoke: entry() returns rows; every query key has a
  * runnable DataFrame builder; every oracleSql key exists in queries.
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry() returns a non-empty model on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq === Seq("cid", "x", "y"))
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query builds a DataFrame on sf0.001 without throwing") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, name)
    }
  }

  test("a5_percentiles_approx tracks the exact percentiles within the " +
      "GK rank-error bound") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    def byLine(name: String): Map[Int, (Double, Double)] =
      SparkEntry.queries(name)(spark, sf)
        .select($"l_linenumber", $"p50".cast("double"), $"p90".cast("double"))
        .as[(Int, Double, Double)].collect()
        .map { case (l, a, b) => l -> (a, b) }.toMap
    val exact = byLine("a5_percentiles")
    val approx = byLine("a5_percentiles_approx")
    assert(approx.keySet === exact.keySet)
    // accuracy=1000 -> rank error <= 0.1% of each group; on this data a
    // 0.1% rank slip moves the value by far less than 5% — a loose
    // envelope that still fails on a broken sketch or a swapped column
    for ((l, (e50, e90)) <- exact; (a50, a90) = approx(l)) {
      assert(math.abs(a50 - e50) / e50 < 0.05, s"line $l p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.05, s"line $l p90: $a90 vs $e90")
    }
  }
}
