package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.sim.Similarity
import graft.util.GenStore

/** The product-quantized IVF tier ([[graft.sim.Similarity.writeIvfIndexPq]]
  * / [[Similarity.ivfTopKFromStorePq]]): m one-byte codes per vector for
  * the probe scans (vs SQ8's one byte per dimension), per-query LUT +
  * codegen'd ADC scoring, exact re-rank for the results.
  *
  *  - RESULTS: the PQ path returns exactly what the exact-store path
  *    returns on the fixture embeddings at the default re-rank depth 8k.
  *  - SIZE: the PQ tier is smaller on disk than the SQ tier, which is
  *    smaller than the exact tier — the compression ladder.
  *  - ADC: pq_adc_dot computes Σ_j lut[j·ksub + code_j + 128] exactly
  *    (checked against a hand-built LUT), identically under codegen and
  *    interpreted eval.
  *  - APPEND/COMPACTION: batches encode with the STORED codebooks into
  *    all tiers; compaction folds all tiers; results track the exact
  *    path throughout.
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rm)
    f.delete(); ()
  }

  private def bytes(dir: String): Long = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(_.length).sum
  }

  private def rows(df: DataFrame): Seq[String] = {
    val r = df.collect().map(_.toString).sorted.toSeq
    graft.util.OpCaches.releaseAll(spark)
    r
  }

  private lazy val corpus = graft.kmeans.OpsN.pointsFromEmbeddings(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    .select($"pid".as("id"), $"features".as("vec"))

  test("PQ store answers identically to the exact store at the default " +
      "re-rank depth; the PQ tier out-compresses SQ8") {
    val exact = "target/graft_stores/ivfpq_spec_exact"
    val pq = "target/graft_stores/ivfpq_spec_pq"
    val sq = "target/graft_stores/ivfpq_spec_sq"
    Seq(exact, pq, sq).foreach(p => rm(new java.io.File(p)))
    Similarity.writeIvfIndex(corpus, nlist = 8, path = exact)
    Similarity.writeIvfIndexPq(corpus, nlist = 8, path = pq, m = 8)
    Similarity.writeIvfIndexSq(corpus, nlist = 8, path = sq)
    val q = corpus.filter($"id" < 10)
    val want = rows(Similarity.ivfTopKFromStore(q, exact, k = 5, nprobe = 2))
    val got = rows(Similarity.ivfTopKFromStorePq(q, pq, k = 5, nprobe = 2))
    assert(got === want)
    // the GUARANTEED form: a re-rank depth covering the whole probed
    // set makes equality hold by construction (the gate-key contract;
    // at serving depths equality is a recall property that larger
    // corpora measurably break — observed at sf0.1)
    val covered = rows(Similarity.ivfTopKFromStorePq(
      q, pq, k = 5, nprobe = 2, rerank = 100000))
    assert(covered === want)
    // the compression ladder: pq < sq < exact on disk (8 bytes/vec vs
    // 64 vs 512 raw at d=64; parquet encoding narrows but preserves it)
    val exactBytes = bytes(s"$pq/cells")
    val pqBytes = bytes(s"$pq/cells_pq")
    val sqBytes = bytes(s"$sq/cells_sq")
    assert(pqBytes > 0 && sqBytes > 0 && exactBytes > 0)
    assert(pqBytes < sqBytes,
      s"cells_pq $pqBytes B not smaller than cells_sq $sqBytes B")
    assert(pqBytes * 3 < exactBytes,
      s"cells_pq $pqBytes B not <3x smaller than cells $exactBytes B")
  }

  test("pq_adc_dot: exact LUT accumulate, codegen == interpreted, " +
      "out-of-range codes contribute 0") {
    val ksub = 4
    // codes stored -128-offset: raw codes (0, 2, 3) -> lut slots 0, 6, 11
    val codes = Seq((-128).toByte, (-126).toByte, (-125).toByte)
    val lut = (0 until 12).map(_.toDouble * 1.5)
    val expected = lut(0) + lut(6) + lut(11)
    val df = Seq((codes, lut)).toDF("codes", "lut")
    val got = df.select(
      graft.expr.ArrayVector.pqAdc($"codes", $"lut", ksub).as("adc"))
      .as[Double].head()
    assert(got === expected)
    // interpreted path (nullSafeEval over raw ArrayData): same value
    val interp = graft.expr.PqAdcDot(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      ksub).nullSafeEval(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(codes.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(lut.toArray))
    assert(interp === expected)
    // a corrupt code past the LUT is skipped, not thrown
    val bad = Seq(((Seq(127.toByte)), lut)).toDF("codes", "lut")
    assert(bad.select(
      graft.expr.ArrayVector.pqAdc($"codes", $"lut", ksub).as("adc"))
      .as[Double].head() === 0.0)
  }

  test("the stored codes reference their subspace codebooks: ADC with the " +
      "query's own LUT equals the sum of sub-dots against coded centroids") {
    val pq = "target/graft_stores/ivfpq_spec_pq"
    val meta = spark.read.parquet(s"$pq/pq_meta").collect()(0)
    val (m, ksub, dsub) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    assert(m === 8 && ksub === 256 && dsub === 8)
    val books = spark.read.parquet(s"$pq/pq_codebooks")
      .select($"sub", $"cell", $"cv").as[(Int, Int, Seq[Double])]
      .collect().groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val coded = spark.read.parquet(s"$pq/cells_pq")
      .select($"cid_id", $"pqcode").as[(Long, Seq[Byte])].collect().toMap
    val qvec = corpus.filter($"id" === 0L).select($"vec")
      .as[Seq[Double]].head()
    // hand-build the LUT sum for a few corpus rows and compare with the
    // decomposition the search path relies on
    for (id <- coded.keys.take(5)) {
      val code = coded(id)
      assert(code.length === m)
      val handAdc = (0 until m).map { j =>
        val cent = books(j)(code(j).toInt + 128)
        val qSub = qvec.slice(j * dsub, j * dsub + dsub)
        qSub.lazyZip(cent).map(_ * _).sum
      }.sum
      // reconstruction dot: ADC == dot(q, reconstruction(code))
      val recon = (0 until m).flatMap(j => books(j)(code(j).toInt + 128))
      val reconDot = qvec.lazyZip(recon).map(_ * _).sum
      assert(math.abs(handAdc - reconDot) < 1e-9)
    }
  }

  test("appends encode with stored codebooks into all tiers; compaction " +
      "compacts all; results track the exact store throughout") {
    val pq = "target/graft_stores/ivfpq_spec_append"
    val exact = "target/graft_stores/ivfpq_spec_append_exact"
    Seq(pq, exact).foreach(p => rm(new java.io.File(p)))
    val base = corpus.filter($"id" < 400)
    // the batch stays IN-distribution (unlike IvfSqSpec's x1.5, which
    // exercises SQ's per-dimension clamp): PQ codebooks reconstruct only
    // within their prototype region, so an out-of-distribution batch
    // legitimately under-scores in ADC until a refit — exactly the drift
    // appendToIvfIndex's growth/refit discipline exists to catch
    val batch = corpus.filter($"id" >= 400)
      .select(($"id" + 100000L).as("id"), $"vec")
    Similarity.writeIvfIndexPq(base, nlist = 4, path = pq, m = 8)
    Similarity.appendToIvfIndex(batch, pq)
    Similarity.writeIvfIndex(base, nlist = 4, path = exact)
    Similarity.appendToIvfIndex(batch, exact)
    // the PQ tier grew with the exact tier
    assert(spark.read.parquet(GenStore.resolve(spark, s"$pq/cells")).count() ===
      spark.read.parquet(GenStore.resolve(spark, s"$pq/cells_pq")).count())
    val q = corpus.filter($"id" < 10)
    val want = rows(Similarity.ivfTopKFromStore(q, exact, k = 5, nprobe = 2))
    assert(rows(Similarity.ivfTopKFromStorePq(q, pq, k = 5, nprobe = 2)) === want)
    // compaction folds the exact and PQ tiers and changes nothing
    Similarity.compactIvfCells(spark, pq)
    assert(GenStore.currentGen(spark, s"$pq/cells").nonEmpty)
    assert(GenStore.currentGen(spark, s"$pq/cells_pq").nonEmpty)
    assert(rows(Similarity.ivfTopKFromStorePq(q, pq, k = 5, nprobe = 2)) === want)
  }

  test("CoverProbed derives a probed-set-covering re-rank depth from live " +
      "cell populations — structural equality at a size where the old " +
      "hand-pinned 512 would under-cover, and it tracks deletes") {
    // 1300 vectors in nlist=2 cells, nprobe=2 probes BOTH cells: every
    // query's probed set is the whole live corpus (1300 > 512, the SF
    // the r13-r15 literal was measured against could not promise this)
    val pq = "target/graft_stores/ivfpq_spec_cover"
    val exact = "target/graft_stores/ivfpq_spec_cover_exact"
    Seq(pq, exact).foreach(p => rm(new java.io.File(p)))
    val synth = spark.range(1300).select(
      $"id",
      array((0 until 8).map(j =>
        sin($"id" * lit(0.37) + lit(j * 1.13)) * lit(j + 1.0)): _*).as("vec"))
    Similarity.writeIvfIndexPq(synth, nlist = 2, path = pq, m = 4, ksub = 16)
    Similarity.writeIvfIndex(synth, nlist = 2, path = exact)
    val depth = Similarity.coveredRerankDepth(spark, pq, nprobe = 2, k = 5)
    assert(depth === 1300, s"covered depth $depth should equal the live corpus")
    val q = synth.filter($"id" < 6)
    val want = rows(Similarity.ivfTopKFromStore(q, exact, k = 5, nprobe = 2))
    val got = rows(Similarity.ivfTopKFromStorePq(
      q, pq, k = 5, nprobe = 2, rerank = Similarity.CoverProbed))
    assert(got === want)
    // deletes shrink the LIVE populations the bound is derived from
    Similarity.deleteFromIvfIndex(
      spark, pq, synth.filter($"id" % 13 === 0).select($"id"))
    val after = Similarity.coveredRerankDepth(spark, pq, nprobe = 2, k = 5)
    assert(after === 1200, s"post-delete covered depth $after should be 1200")
    // nprobe=1 covers only the largest single cell — strictly less than
    // the whole corpus when both cells are populated
    val one = Similarity.coveredRerankDepth(spark, pq, nprobe = 1, k = 5)
    assert(one < after && one >= after / 2)
  }
}
