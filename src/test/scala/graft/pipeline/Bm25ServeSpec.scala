package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, SparkEntry}
import graft.kmeans.SparkTestSession
import graft.util.StoreFixture

/** The serve-shaped BM25 store keys (`tx_bm25_append_serve` /
  * `tx_bm25_delete_serve`) and the [[graft.util.StoreFixture]] they
  * stand on. The gate keys rebuild their store per call; the serve keys
  * must (a) answer bit-identically to them, (b) answer identically on
  * REPEATED calls — the pristine restore must actually undo the
  * previous call's append/delete segments, or the second call
  * double-counts — and (c) rebuild when the input fingerprint changes.
  */
class Bm25ServeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String): Seq[(Long, Double)] = {
    val r = SparkEntry.queries(name)(spark, sf)
      .as[(Long, Double)].collect().toSeq
    graft.util.OpCaches.releaseAll(spark)
    r
  }

  test("append_serve == append gate, stable across repeated calls") {
    val gate = run("tx_bm25_append")
    val first = run("tx_bm25_append_serve")
    // second call exercises the pristine restore: without it the
    // serve batch (doc_id % 50 == 1) would be appended twice and its
    // docs' df/tf/stats double
    val second = run("tx_bm25_append_serve")
    assert(gate.nonEmpty)
    assert(first === gate)
    assert(second === gate)
  }

  test("delete_serve == delete gate, stable across repeated calls") {
    val gate = run("tx_bm25_delete")
    val first = run("tx_bm25_delete_serve")
    // the restore must also remove the tombstone segment, or deletes
    // accumulate and the _tombstones dir read breaks when emptied
    val second = run("tx_bm25_delete_serve")
    assert(gate.nonEmpty)
    assert(first === gate)
    assert(second === gate)
  }

  test("StoreFixture rebuilds on fingerprint change, restores on match") {
    val dir = Files.createTempDirectory("fixture_spec_").toFile
    dir.deleteOnExit()
    val store = dir.getAbsolutePath + "/store"
    var builds = 0
    def build(): Unit = {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$store/data")
    }
    StoreFixture.ensurePristine(spark, store, "fp1")(build())
    assert(builds === 1)
    // same fingerprint: no rebuild, and a mutation is rolled back
    Seq((3L, "c")).toDF("id", "v")
      .write.mode("append").parquet(s"$store/data")
    assert(spark.read.parquet(s"$store/data").count() === 3)
    StoreFixture.ensurePristine(spark, store, "fp1")(build())
    assert(builds === 1)
    assert(spark.read.parquet(s"$store/data").count() === 2,
      "restore must delete files added after the pristine listing")
    // a whole directory added post-build is pruned once emptied
    Seq(9L).toDF("_ts_id").write.parquet(s"$store/extra")
    StoreFixture.ensurePristine(spark, store, "fp1")(build())
    assert(!new java.io.File(s"$store/extra").exists(),
      "emptied post-build directory must be pruned")
    // changed fingerprint: full rebuild
    StoreFixture.ensurePristine(spark, store, "fp2")(build())
    assert(builds === 2)
    assert(spark.read.parquet(s"$store/data").count() === 2)
  }

  test("relative store path: marker survives and build runs exactly once") {
    // Regression: with an unqualified root, listFiles' absolute paths
    // never stripPrefix against the relative root URI, so the restore
    // pass saw every file (marker included) as foreign and deleted it —
    // every call after the first silently paid a full rebuild. The serve
    // keys pass relative paths (`target/graft_stores/...`), so this is
    // the production shape.
    val store = "target/fixture_spec_rel_" + System.nanoTime() + "/store"
    var builds = 0
    def build(): Unit = {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$store/data")
    }
    try {
      StoreFixture.ensurePristine(spark, store, "fp1")(build())
      StoreFixture.ensurePristine(spark, store, "fp1")(build())
      Seq((3L, "c")).toDF("id", "v")
        .write.mode("append").parquet(s"$store/data")
      StoreFixture.ensurePristine(spark, store, "fp1")(build())
      assert(builds === 1,
        "pristine marker must survive restores under a relative root")
      assert(new java.io.File(s"$store/_graft_pristine").exists())
      assert(spark.read.parquet(s"$store/data").count() === 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(store).getParentFile)
    }
  }

  test("pre-v2 marker (no version header) forces a full rebuild") {
    // r13-era markers may record unstripped absolute listings (the
    // relative-root bug); trusting one for a restore would delete every
    // pristine file, so an unversioned marker must read as a mismatch
    val dir = Files.createTempDirectory("fixture_v1_").toFile
    dir.deleteOnExit()
    val store = dir.getAbsolutePath + "/store"
    var builds = 0
    def build(): Unit = {
      builds += 1
      Seq((1L, "a")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$store/data")
    }
    StoreFixture.ensurePristine(spark, store, "fp1")(build())
    assert(builds === 1)
    // rewrite the marker in the v1 layout: fingerprint first, no header
    val marker = new java.io.File(s"$store/_graft_pristine")
    val v2 = Files.readAllLines(marker.toPath)
    assert(v2.get(0) === "graft-pristine-v2")
    Files.write(marker.toPath,
      String.join("\n", v2.subList(1, v2.size())).getBytes)
    // drop the local-FS checksum sidecar the out-of-band rewrite broke
    new java.io.File(s"$store/._graft_pristine.crc").delete()
    StoreFixture.ensurePristine(spark, store, "fp1")(build())
    assert(builds === 2, "unversioned marker must trigger a rebuild")
    assert(spark.read.parquet(s"$store/data").count() === 1)
  }

  test("fingerprint tracks file length and mtime") {
    val dir = Files.createTempDirectory("fixture_fp_").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    val f = new java.io.File(d, "x.bin")
    Files.write(f.toPath, Array[Byte](1, 2, 3))
    val fp1 = StoreFixture.fingerprint(spark, d)
    Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
    val fp2 = StoreFixture.fingerprint(spark, d)
    assert(fp1 !== fp2)
    assert(StoreFixture.fingerprint(spark, d) === fp2)
    assert(StoreFixture.fingerprint(spark, d + "_absent")
      .startsWith("absent:"))
  }
}
