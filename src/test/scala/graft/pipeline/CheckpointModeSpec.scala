package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps
import graft.util.Checkpoints

/** The `spark.graft.checkpoint` knob (round-20, r19 verdict #3): the
  * three plan-truncation barriers (bpeFitWithDict, pipelineSurvivors,
  * dupGroups) must compute IDENTICAL results under reliable checkpoints
  * as under the default local ones — the knob moves storage, never
  * values — and the mode selection itself must fail loudly rather than
  * silently degrade.
  *
  * Each reliable-mode test runs in a `newSession()` (own SQLConf over
  * the shared context), so the knob never leaks into parallel suites.
  */
class CheckpointModeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def reliableSession(): SparkSession = {
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft_ckpt_mode").toString)
    val s2 = spark.newSession()
    s2.conf.set(Checkpoints.ModeKey, "reliable")
    s2
  }

  test("mode selection: local by default; unknown modes rejected loudly") {
    assert(!Checkpoints.reliableEnabled(spark.newSession()))
    val bogus = spark.newSession()
    bogus.conf.set(Checkpoints.ModeKey, "experimental")
    val e = intercept[IllegalArgumentException] {
      Checkpoints.reliableEnabled(bogus)
    }
    assert(e.getMessage.contains(Checkpoints.ModeKey))
  }

  private val tinyDocs = Seq(
    (1L, "low low lower lowest", "web"),
    (2L, "newer new news low", "web"),
    (3L, "low lower newest news", "ref"))

  private def bpeFitOn(s: SparkSession): (Seq[(Long, String, String, Long)], Seq[String]) = {
    import s.implicits._
    val docs = tinyDocs.toDF("doc_id", "text", "source")
    val (m, d) = TextOps.bpeFitWithDict(docs, merges = 6)
    val dict = d.collect().map(_.toString).sorted.toSeq
    graft.util.OpCaches.releaseAll(s)
    (m, dict)
  }

  test("bpeFitWithDict: reliable mode fits the identical merge table " +
      "and dictionary") {
    val (mLocal, dictLocal) = bpeFitOn(spark)
    val (mRel, dictRel) = bpeFitOn(reliableSession())
    assert(mRel === mLocal)
    assert(dictRel === dictLocal)
    assert(mLocal.nonEmpty) // the fixture must actually exercise the loop
  }

  private def dupGroupsOn(s: SparkSession): (Map[Long, Long], Int) = {
    import s.implicits._
    val edges = ((1L until 20L).map(i => (i, i + 1)) ++
      Seq((40L, 41L), (41L, 42L))).toDF("d1", "d2")
    val (g, rounds) = graft.dedup.Dedup.dupGroupsWithRounds(edges)
    val out = g.as[(Long, Long)].collect().toMap
    graft.util.OpCaches.releaseAll(s)
    (out, rounds)
  }

  test("dupGroups: the session knob alone (no explicit param) selects " +
      "reliable rounds and yields the same groups") {
    val (local, rLocal) = dupGroupsOn(spark)
    val (rel, rRel) = dupGroupsOn(reliableSession())
    assert(rel === local)
    assert(rRel === rLocal)
  }

  test("pipelineSurvivors: reliable mode keeps the identical survivor " +
      "set on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val local = graft.SparkEntry.pipelineSurvivors(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    graft.util.OpCaches.releaseAll(spark)

    val s2 = reliableSession()
    val rel = graft.SparkEntry.pipelineSurvivors(s2, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    graft.util.OpCaches.releaseAll(s2)

    assert(rel === local)
    assert(local.nonEmpty)
  }
}
