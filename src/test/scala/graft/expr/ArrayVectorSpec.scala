package graft.expr

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession

class ArrayVectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def vecsDf = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))
  ).toDF("id", "a", "b")

  test("ArrayDot computes the left-fold dot product") {
    val got = vecsDf.select($"id", ArrayVector.dot($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 4.0 + 10.0 + 18.0)
    assert(got(2L) === 0.0)
  }

  test("ArraySqDist computes squared Euclidean distance") {
    val got = vecsDf.select($"id", ArrayVector.sqDist($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 27.0) // 9+9+9
    assert(got(2L) === 3.0)
  }

  test("null array yields null, not a crash") {
    val df = Seq((1L, Some(Array(1.0)), None: Option[Array[Double]]))
      .toDF("id", "a", "b")
    val got = df.select(ArrayVector.dot($"a", $"b")).collect()
    assert(got.head.isNullAt(0))
  }

  test("expressions agree with the interpreted higher-order formulation") {
    import org.apache.spark.sql.functions._
    val pts = Seq.tabulate(50)(i => (i.toLong, Array.tabulate(16)(j => (i * 31 + j * 7 % 13) / 3.0)))
      .toDF("id", "a")
      .crossJoin(Seq(Tuple1(Array.tabulate(16)(j => j / 2.0))).toDF("b"))
    val hof = pts.select(
      aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))
      .as[Double].collect()
    val native = pts.select(ArrayVector.sqDist($"a", $"b")).as[Double].collect()
    assert(hof.toSeq === native.toSeq) // bit-identical: same fold order
  }

  test("GraftExtensions registers SQL functions array_dot / array_sqdist") {
    // getOrCreate would return the shared test session (extensions apply
    // only at session construction) — build a fresh session on the same
    // SparkContext, then restore the shared one.
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions (programmatic): the spark.sql.extensions config is a
      // STATIC conf read from the SparkContext at its creation, so setting
      // it on a builder over an already-running context is a no-op
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
          "array_sqdist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS s")
        .collect().head
      assert(r.getDouble(0) === 11.0)
      assert(r.getDouble(1) === 25.0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("pqEncode: argmin codes with lowest-id tiebreak; empty subspace " +
      "emits -128; pqLut leaves missing slots 0") {
    import org.apache.spark.sql.functions.col
    // two subspaces of 2 dims; sub 0 has two EQUIDISTANT entries (ids
    // 3, 7) from the probe vector, sub 1 has one entry (id 1)
    val books: IndexedSeq[Seq[(Int, Array[Double])]] = IndexedSeq(
      Seq(3 -> Array(1.0, 0.0), 7 -> Array(-1.0, 0.0)),
      Seq(1 -> Array(5.0, 5.0)))
    val df = Seq((1L, Seq(0.0, 0.0, 5.0, 5.0))).toDF("id", "vec")
    val code = df.select(
      ArrayVector.pqEncode(col("vec"), books, 2).as("c"))
      .as[Seq[Byte]].head()
    assert(code === Seq((3 - 128).toByte, (1 - 128).toByte)) // lowest id wins
    // empty subspace: no entries -> -128
    val books2: IndexedSeq[Seq[(Int, Array[Double])]] =
      IndexedSeq(Seq(0 -> Array(0.0, 0.0)), Seq.empty)
    val code2 = df.select(
      ArrayVector.pqEncode(col("vec"), books2, 2).as("c"))
      .as[Seq[Byte]].head()
    assert(code2 === Seq((-128).toByte, (-128).toByte))
    // LUT: ksub=8, sub-0 slots 3 and 7 filled, everything else 0;
    // sub-1 slot 1 = dot((5,5),(5,5)) = 50
    val lut = df.select(
      ArrayVector.pqLut(col("vec"), books, 2, 8).as("l"))
      .as[Seq[Double]].head()
    assert(lut.length === 16)
    assert(lut(3) === 0.0 && lut(7) === 0.0) // dot with (0,0) probe
    assert(lut(8 + 1) === 50.0)
    assert(lut.zipWithIndex.collect {
      case (v, i) if i != 9 => v }.forall(_ === 0.0))
    // encode + ADC round trip: adc of own code = lut slots picked
    val adc = df.select(
      ArrayVector.pqAdc(
        ArrayVector.pqEncode(col("vec"), books, 2),
        ArrayVector.pqLut(col("vec"), books, 2, 8), 8).as("a"))
      .as[Double].head()
    assert(adc === lut(3) + lut(9))
  }

  test("whole-stage codegen covers the expression (no interpreted fallback)") {
    // needs a non-local source: literal local relations constant-fold to a
    // LocalTableScan with no codegen stage at all
    val pts = graft.kmeans.OpsN.pointsFromEmbeddings(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val q = pts.select(
      ArrayVector.dot($"features", $"features").as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // WholeStageCodegen renders as "*(n)" prefixes in executedPlan.toString
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
    assert(q.count() === 500)
  }
}
