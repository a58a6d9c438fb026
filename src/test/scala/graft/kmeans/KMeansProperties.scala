package graft.kmeans

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties from SURVEY.md §5(b): assignment matches brute
  * force with lowest-cid ties, the mean update stays inside its members'
  * bounding box, assignment is idempotent at a fixed point, and the
  * k-means objective is non-increasing. Kept to 10 cases per property —
  * each case runs real Spark jobs.
  */
object KMeansProperties extends Properties("kmeans") {
  lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val coord = Gen.chooseNum(-100.0, 100.0)
  private val pointGen = Gen.zip(coord, coord)
  private val pointsGen = Gen.nonEmptyListOf(pointGen).map(_.take(30))

  private def df(ps: List[(Double, Double)]) = {
    import spark.implicits._
    ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("pid", "x", "y")
  }

  property("assign == brute-force nearest with lowest-cid tiebreak") =
    forAll(pointsGen, Gen.chooseNum(1, 5)) { (ps, k0) =>
      val k = math.min(k0, ps.size)
      val pts = df(ps)
      val cs = Ops.collectCentroids(Ops.initFirstK(pts, k))
      val got = Ops.assign(pts, cs)
        .select("pid", "cid")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      Prop.all(ps.zipWithIndex.map { case ((x, y), i) =>
        val brute = cs.minBy(c => (c.dist2To(x, y), c.cid)).cid
        Prop(got(i.toLong) == brute) :| s"point $i ($x,$y)"
      }: _*)
    }

  property("updated centroid lies inside its members' bounding box") =
    forAll(pointsGen, Gen.chooseNum(1, 4)) { (ps, k0) =>
      val k = math.min(k0, ps.size)
      val pts = df(ps)
      val cs = Ops.collectCentroids(Ops.initFirstK(pts, k))
      val assigned = Ops.assign(pts, cs).collect()
        .map(r => (r.getInt(3), r.getDouble(1), r.getDouble(2)))
      val updated = Ops.collectCentroids(Ops.update(Ops.assign(pts, cs)))
      Prop.all(updated.map { c =>
        val members = assigned.filter(_._1 == c.cid)
        val eps = 1e-9
        Prop(
          c.x >= members.map(_._2).min - eps && c.x <= members.map(_._2).max + eps &&
            c.y >= members.map(_._3).min - eps && c.y <= members.map(_._3).max + eps
        ) :| s"centroid ${c.cid}"
      }: _*)
    }

  property("assignment is a fixed point after convergence") =
    forAll(pointsGen) { ps =>
      val pts = df(ps)
      val k = math.min(3, ps.size)
      val r = Lloyd.fit(pts, KMeansConfig(k = k, maxIter = 25))
      // one more update step moves nothing beyond tolerance
      val next = Ops.collectCentroids(Ops.update(Ops.assign(pts, r.centroids)))
      Prop(!r.converged || Ops.maxMovement(r.centroids, next) <= r.centroids.size * 1e-9 + 0.001)
    }

  property("k-means objective is non-increasing across Lloyd steps") =
    forAll(pointsGen) { ps =>
      val pts = df(ps)
      val k = math.min(3, ps.size)
      var cs = Ops.collectCentroids(Ops.initFirstK(pts, k))
      var prev = Double.MaxValue
      val ok = (1 to 3).forall { _ =>
        val assigned = Ops.assign(pts, cs)
        val obj = assigned
          .agg(org.apache.spark.sql.functions.sum("dist2"))
          .collect()(0).getDouble(0)
        val mono = obj <= prev + 1e-6
        prev = obj
        cs = Ops.collectCentroids(Ops.update(assigned))
        mono
      }
      Prop(ok)
    }
}
