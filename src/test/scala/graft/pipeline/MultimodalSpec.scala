package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.multimodal.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def media(ds: (Long, String)*) =
    MultimodalOps.mediaFromDocuments(ds.toDF("doc_id", "text"))

  test("mediaFromDocuments: payload bytes equal UTF-8 text, metadata typed") {
    val m = media((1L, "abc"))
    val row = m.select($"media", $"n_bytes").as[(Array[Byte], Long)].head()
    assert(row._1.toSeq === "abc".getBytes("UTF-8").toSeq)
    assert(row._2 === 3L)
  }

  test("fakeDecodeFeatures: deterministic L1-normalized 16-bin histogram") {
    val f = MultimodalOps.fakeDecodeFeatures("aaaa".getBytes("UTF-8"))
    assert(f.length === 16)
    // 'a' = 0x61 -> bin 6
    assert(f(6) === 1.0f)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(MultimodalOps.fakeDecodeFeatures(Array.emptyByteArray).forall(_ == 0f))
  }

  test("extractFeatures: mapPartitions plumbing produces fixed-width features") {
    val got = MultimodalOps.extractFeatures(media((1L, "abc"), (2L, "  !!")))
      .select($"media_id", $"features").as[(Long, Array[Float])]
      .collect().toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L).length === 16)
    // "  !!": all four bytes are 0x20-0x2f -> bin 2 gets everything
    assert(got(2L)(2) === 1.0f)
  }

  test("frameSample: empty payload yields zero frames (no phantom row)") {
    val m = media((1L, ""))
    assert(MultimodalOps.frameSample(m, frameSize = 32, stride = 1).count() === 0L)
  }

  test("frameSample: fixed-size frames, stride skip, short tail") {
    val m = media((1L, "a" * 70)) // 70 bytes, frameSize 32 -> 3 frames (32,32,6)
    val frames = MultimodalOps.frameSample(m, frameSize = 32, stride = 2)
      .select($"frame_idx", $"frame").as[(Int, Array[Byte])]
      .collect().sortBy(_._1)
    // stride 2 keeps frames 0 and 2 -> lengths 32 and 6
    assert(frames.map(_._2.length).toSeq === Seq(32, 6))
  }
}
