package graft.kmeans

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests reproducing the reference's logged end states
  * (BASELINE.md, FIXTURES.md §A): first-K init, comparison set-based by
  * nearest match with tolerance 1e-4 (the reference's own 4-decimal output
  * precision, `master.py:266`; its centroid order is nondeterministic,
  * SURVEY §4.3).
  */
class ReferenceParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val inputDir = "/root/reference/Input"

  private def assertCentroidSetsMatch(
      got: Seq[Centroid2],
      want: Seq[(Double, Double)],
      tol: Double = 1e-4): Unit = {
    assert(got.size === want.size, s"cluster count: got $got want $want")
    want.foreach { case (wx, wy) =>
      val nearest = got.map(c => math.sqrt(c.dist2To(wx, wy))).min
      assert(
        nearest <= tol,
        s"no centroid within $tol of ($wx,$wy); got ${got.map(c => (c.x, c.y))}")
    }
  }

  test("points1.txt K=3 reproduces dump_master.txt final centroids") {
    assume(new java.io.File(s"$inputDir/points1.txt").exists())
    val pts = Ops.readPointsCsv(spark, s"$inputDir/points1.txt")
    val r = Lloyd.fit(pts, KMeansConfig(k = 3, maxIter = 20))
    // dump_master.txt logs (0.825, 9.7) — but 9.7 is the reference's lossy
    // re-parse artifact (`master.py:181` chops the last char: "9.75]" → 9.7,
    // SURVEY §4.3 defect 2, never replicated per §7.5). The true mean of the
    // cluster is 9.75.
    assertCentroidSetsMatch(
      r.centroids,
      Seq((0.825, 9.75), (-0.675, 7.3375), (9.5474, 1.0474)))
  }

  test("points2.txt K=4 reproduces centroids.txt (stable from iteration 4)") {
    assume(new java.io.File(s"$inputDir/points2.txt").exists())
    val pts = Ops.readPointsCsv(spark, s"$inputDir/points2.txt")
    val r = Lloyd.fit(pts, KMeansConfig(k = 4, maxIter = 7))
    assertCentroidSetsMatch(
      r.centroids,
      Seq(
        (68.7944, 50.4526),
        (86.8043, 25.4590),
        (15.0706, 33.6109),
        (23.8604, 74.2431)))
  }

  test("points3.txt K=3: assignment of every point is its brute-force nearest") {
    assume(new java.io.File(s"$inputDir/points3.txt").exists())
    val pts = Ops.readPointsCsv(spark, s"$inputDir/points3.txt")
    val r = Lloyd.fit(pts, KMeansConfig(k = 3, maxIter = 10))
    val assigned = Ops.assign(pts, r.centroids).collect()
    assigned.foreach { row =>
      val (x, y, cid) = (row.getDouble(1), row.getDouble(2), row.getInt(3))
      val brute = r.centroids.minBy(c => (c.dist2To(x, y), c.cid)).cid
      assert(cid === brute, s"point ($x,$y)")
    }
  }
}
