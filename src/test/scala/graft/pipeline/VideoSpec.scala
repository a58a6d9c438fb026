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

  test("MJPEG build -> parse: geometry + frame count exact, pixels " +
      "near-lossless on a smooth gradient, identity palette") {
    val w = 16; val h = 8
    // a smooth gradient — the content JPEG compresses near-losslessly,
    // so the round-trip error bound is tight and stable
    def grad(base: Int): Array[Byte] =
      Array.tabulate(w * h)(i => (base + (i % w) * 4 + (i / w) * 8).toByte)
    val frames = Seq(grad(40), grad(90))
    val v = AviCodec.parse(AviCodec.buildMjpeg(frames, w, h))
    assert(v != null)
    assert(v.width === w && v.height === h)
    assert(v.frames.length === 2)
    assert(v.lum.toSeq === (0 until 256))
    for ((f, i) <- v.frames.zipWithIndex) {
      val err = f.zip(frames(i)).map { case (a, b) =>
        math.abs((a & 0xff) - (b & 0xff))
      }
      assert(err.sum.toDouble / err.length <= 4.0,
        s"frame $i mean abs JPEG round-trip error ${err.sum.toDouble / err.length}")
    }
  }

  test("MJPEG: a corrupted frame chunk degrades the payload to null") {
    val w = 16; val h = 8
    val avi = AviCodec.buildMjpeg(Seq(bytes(w * h)), w, h)
    val at = avi.indexOfSlice("00dc".getBytes("US-ASCII"))
    assert(at > 0)
    avi(at + 8) = 0 // kill the JPEG SOI marker inside the frame body
    assert(AviCodec.parse(avi) === null)
    // strict dispatch surfaces the failure as null, permissive degrades
    assert(MultimodalOps
      .decodeFeaturesStrict("video/x-motion-jpeg", avi) === null)
    assert(MultimodalOps.decodeFeatures("video/x-motion-jpeg", avi).toSeq ===
      MultimodalOps.fakeDecodeFeatures(avi).toSeq)
  }

  test("MJPEG wrap dispatches to the REAL decode path") {
    val avi = MultimodalOps.wrapMjpegAvi(bytes(300))
    val f = MultimodalOps.decodeFeaturesStrict("video/x-motion-jpeg", avi)
    assert(f != null, "strict decode must succeed on a valid MJPEG AVI")
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 0.01f)
    // ...and the capability table carries the format as real
    val caps = MultimodalOps.formatCapabilities(spark)
      .as[(String, String)].collect().toMap
    assert(caps("video/x-motion-jpeg") === "real")
  }

  test("multi-stream AVI: frames decode only from the FIRST vids " +
      "stream's chunk prefix, not a size-coincident foreign chunk") {
    import java.io.ByteArrayOutputStream
    def le32(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
    def le16(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    def cc(o: ByteArrayOutputStream, s: String): Unit =
      o.write(s.getBytes("US-ASCII"))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      cc(o, id); le32(o, body.length); o.write(body)
      if (body.length % 2 == 1) o.write(0)
      o.toByteArray
    }
    def lst(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      cc(o, "LIST"); le32(o, body.length + 4); cc(o, kind); o.write(body)
      o.toByteArray
    }
    val w = 4; val h = 2
    val frame = Array.tabulate(w * h)(i => (i * 10).toByte)
    def strh(t: String): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      cc(o, t); cc(o, if (t == "vids") "DIB " else "PCM ")
      (0 until 12).foreach(_ => le32(o, 0))
      o.toByteArray
    }
    val strfV = {
      val o = new ByteArrayOutputStream()
      le32(o, 40); le32(o, w); le32(o, h); le16(o, 1); le16(o, 8)
      le32(o, 0); le32(o, w * h); le32(o, 0); le32(o, 0)
      le32(o, 256); le32(o, 0)
      for (i <- 0 until 256) { o.write(i); o.write(i); o.write(i); o.write(0) }
      o.toByteArray
    }
    // stream 00 = audio (16-byte WAVEFORMATEX strf), stream 01 = video
    val strlA = lst("strl",
      chunk("strh", strh("auds")) ++ chunk("strf", new Array[Byte](16)))
    val strlV = lst("strl",
      chunk("strh", strh("vids")) ++ chunk("strf", strfV))
    val hdrl = lst("hdrl",
      chunk("avih", new Array[Byte](56)) ++ strlA ++ strlV)
    // bottom-up DIB rows for the real frame (stride == w here)
    val dib = new Array[Byte](w * h)
    for (r <- 0 until h)
      System.arraycopy(frame, (h - 1 - r) * w, dib, r * w, w)
    // the AUDIO stream's chunk is named '00db' and sized EXACTLY like a
    // video frame — the silent-misdecode case: it must be skipped
    val movi = lst("movi",
      chunk("00db", Array.fill[Byte](w * h)(99)) ++ chunk("01db", dib))
    val body = hdrl ++ movi
    val out = new ByteArrayOutputStream()
    cc(out, "RIFF"); le32(out, body.length + 4); cc(out, "AVI ")
    out.write(body)
    val v = AviCodec.parse(out.toByteArray)
    assert(v != null)
    assert(v.frames.length === 1,
      "the size-coincident stream-00 chunk must not decode as a frame")
    assert(v.frames(0).toSeq === frame.toSeq)

    // same container, but stream 00's strh is MALFORMED (2-byte body,
    // no readable fccType): the ordinal must still count it, so the
    // vids stream keeps prefix 01 — an ordinal desync would look up
    // frames under 00 and decode the foreign chunk (or nothing)
    val strlBad = lst("strl",
      chunk("strh", Array[Byte](0, 0)) ++ chunk("strf", new Array[Byte](16)))
    val hdrl2 = lst("hdrl",
      chunk("avih", new Array[Byte](56)) ++ strlBad ++ strlV)
    val body2 = hdrl2 ++ movi
    val out2 = new ByteArrayOutputStream()
    cc(out2, "RIFF"); le32(out2, body2.length + 4); cc(out2, "AVI ")
    out2.write(body2)
    val v2 = AviCodec.parse(out2.toByteArray)
    assert(v2 != null)
    assert(v2.frames.length === 1,
      "malformed strh desynced the stream ordinal")
    assert(v2.frames(0).toSeq === frame.toSeq)
  }
}
