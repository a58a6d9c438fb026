package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.multimodal.{AviCodec, MultimodalOps}

/** Real AVI video decode: container round trip, palette resolution,
  * malformed-payload degradation, and the table-level frame-sampling
  * decode path.
  */
class VideoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bytes(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)

  test("build -> parse round trip recovers dimensions and exact pixels") {
    val frames = Seq(bytes(12 * 4), bytes(12 * 4).map(b => (b ^ 0x5a).toByte))
    val avi = AviCodec.build(frames, width = 12, height = 4)
    val v = AviCodec.parse(avi)
    assert(v != null)
    assert(v.width === 12 && v.height === 4)
    assert(v.frames.length === 2)
    assert(v.frames(0).toSeq === frames(0).toSeq)
    assert(v.frames(1).toSeq === frames(1).toSeq)
    // grayscale palette: luminance of index i is i
    assert(v.lum.toSeq === (0 until 256))
  }

  test("row padding: non-multiple-of-4 width survives the stride round trip") {
    val frames = Seq(bytes(10 * 3))
    val v = AviCodec.parse(AviCodec.build(frames, width = 10, height = 3))
    assert(v != null)
    assert(v.width === 10 && v.height === 3)
    assert(v.frames(0).toSeq === frames(0).toSeq)
  }

  test("luminance resolves through the PALETTE, not the raw index") {
    val frame = bytes(16 * 2)
    val avi = AviCodec.build(Seq(frame), width = 16, height = 2)
    // patch the palette in place: entry i -> gray 255-i (palette starts
    // 48 bytes after the 'strf' tag: 8-byte chunk header + 40-byte
    // BITMAPINFOHEADER)
    val strfAt = avi.indexOfSlice("strf".getBytes("US-ASCII"))
    assert(strfAt > 0)
    val pal = strfAt + 48
    for (i <- 0 until 256; c <- 0 until 3)
      avi(pal + 4 * i + c) = (255 - i).toByte
    val v = AviCodec.parse(avi)
    assert(v != null)
    assert(v.lum.toSeq === (0 until 256).map(255 - _))
    // decoded histogram is the REVERSED-bin histogram of the raw bytes
    val flipped = MultimodalOps.decodeVideoFeatures(avi)
    val plain = MultimodalOps.fakeDecodeFeatures(frame)
    assert(flipped.toSeq === plain.reverse.toSeq)
  }

  test("malformed payloads parse to null / degrade per contract") {
    assert(AviCodec.parse(null) === null)
    assert(AviCodec.parse(Array.emptyByteArray) === null)
    assert(AviCodec.parse(bytes(64)) === null)
    // a genuine RIFF that is not an AVI (the audio path's WAV)
    val wav = MultimodalOps.wrapPcmWav(bytes(100))
    assert(AviCodec.parse(wav) === null)
    // truncated mid-movi
    val avi = AviCodec.build(Seq(bytes(16 * 8)), 16, 8)
    assert(AviCodec.parse(avi.take(avi.length / 2)) === null)
    // permissive dispatch degrades to the byte-histogram stub; strict nulls
    assert(MultimodalOps.decodeFeatures("video/avi", bytes(64)).toSeq ===
      MultimodalOps.fakeDecodeFeatures(bytes(64)).toSeq)
    assert(MultimodalOps.decodeFeaturesStrict("video/avi", bytes(64)) === null)
  }

  test("wrapDibAvi + whole-payload decode == byte histogram of padded input") {
    val data = bytes(300) // 3 frames of 128 at 16x8, last padded with 26 zeros
    val avi = MultimodalOps.wrapDibAvi(data)
    val padded = data ++ new Array[Byte](384 - 300)
    assert(MultimodalOps.decodeVideoFeatures(avi).toSeq ===
      MultimodalOps.fakeDecodeFeatures(padded).toSeq)
    assert(MultimodalOps.decodeFeaturesStrict("video/avi", avi).toSeq ===
      MultimodalOps.fakeDecodeFeatures(padded).toSeq)
  }

  test("decodeVideoFrameFeatures samples every stride-th DECODED frame") {
    val docs = Seq(
      (1L, new String(Array.fill(300)('a'))), // 3 frames -> idx 0, 2
      (2L, "short"), // 1 frame
      (3L, "")) // 0 frames -> no rows
      .toDF("doc_id", "text")
    val media = MultimodalOps.videoMediaFromDocuments(docs)
    val got = MultimodalOps.decodeVideoFrameFeatures(media, stride = 2)
      .select($"media_id", $"frame_idx")
      .as[(Long, Int)].collect().toSet
    assert(got === Set((1L, 0), (1L, 2), (2L, 0)))
    // per-frame features match the padded-slice byte histogram
    val f = MultimodalOps.decodeVideoFrameFeatures(media, stride = 2)
      .where($"media_id" === 1L && $"frame_idx" === 2)
      .select($"features").as[Seq[Float]].head()
    val slice = new String(Array.fill(300)('a')).getBytes("UTF-8")
      .slice(256, 300) ++ new Array[Byte](84)
    assert(f === MultimodalOps.fakeDecodeFeatures(slice).toSeq)
  }

  test("unparseable media rows contribute no frame rows") {
    val media = Seq((9L, bytes(50), "video/avi", 50L))
      .toDF("media_id", "media", "format", "n_bytes")
    assert(MultimodalOps.decodeVideoFrameFeatures(media, 1).count() === 0L)
  }
}
