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
}
