package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.{Ops, SparkTestSession}

/** Physical-plan shape assertions — the properties that keep the engine
  * viable at 100 TB (SURVEY.md §4.2): scans prune columns and push filters,
  * the centroid side of the assignment join broadcasts, aggregations are
  * partial+final hash aggregates, and the hot paths stay inside
  * whole-stage codegen.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  test("parquet scan prunes to the projected columns (ReadSchema)") {
    val df = Ops.pointsFromLineitem(Graft.table(spark, sf, "lineitem"))
    val scan = executed(df).toString
    assert(scan.contains("l_orderkey") && scan.contains("l_extendedprice"))
    // a pruned scan must NOT read unrelated wide columns
    assert(!scan.contains("l_comment"), "scan reads l_comment — no pruning")
  }

  test("filters push down to the parquet scan (PushedFilters)") {
    val df = Graft.table(spark, sf, "lineitem").filter(col("l_orderkey") > 100)
      .select("l_orderkey")
    val plan = executed(df).toString
    assert(
      plan.contains("PushedFilters: [") && plan.contains("GreaterThan(l_orderkey"),
      s"filter not pushed:\n${plan.take(800)}")
  }

  test("assignCrossJoin broadcasts the centroid side") {
    val p = Ops.pointsFromLineitem(Graft.table(spark, sf, "lineitem"))
    val plan = executed(Ops.assignCrossJoin(p, Ops.initFirstK(p, 4))).toString
    assert(plan.contains("Broadcast"), s"no broadcast in:\n${plan.take(800)}")
  }

  test("shuffle-free assign: no exchange, fully codegen'd projection") {
    val p = Ops.pointsFromLineitem(Graft.table(spark, sf, "lineitem"))
    val centroids = Ops.collectCentroids(Ops.initFirstK(p, 4))
    val plan = executed(Ops.assign(p, centroids)).toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n${plan.take(800)}")
    // the scalar least/when argmin keeps every Project inside whole-stage
    // codegen ("*(n)" prefixes); an un-starred Project would mean an
    // interpreted fallback in the hot path
    assert(plan.contains("*("), s"no codegen span in:\n${plan.take(800)}")
    assert(
      plan.linesIterator.count(_.contains("Project")) ===
        plan.linesIterator.count(l => l.contains("*(") && l.contains("Project")),
      s"interpreted Project present:\n${plan.take(1200)}")
  }

  test("mean update is a partial+final hash aggregate (map-side combine)") {
    val p = Ops.pointsFromLineitem(Graft.table(spark, sf, "lineitem"))
    val centroids = Ops.collectCentroids(Ops.initFirstK(p, 4))
    val plan = executed(Ops.update(Ops.assign(p, centroids))).toString
    assert(plan.contains("HashAggregate"))
    // partial then final: two HashAggregate nodes around one exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }
}
