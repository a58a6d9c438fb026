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

  test("decodeImageFeatures: real PNG decodes through javax.imageio") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    // left half black (lum 0 -> bin 0), right half white (lum 255 -> bin 15)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val f = MultimodalOps.decodeImageFeatures(png)
    assert(f(0) === 0.5f && f(15) === 0.5f)
    assert(f.sum === 1.0f)
    // end-to-end: extractFeatures dispatches on the format column
    val df = Seq((1L, png, "image/png", png.length.toLong))
      .toDF("media_id", "media", "format", "n_bytes")
    val got = MultimodalOps.extractFeatures(df)
      .select($"features").as[Array[Float]].head()
    assert(got(0) === 0.5f && got(15) === 0.5f)
  }

  test("decodeFeatures: JPEG decodes real pixels, not the byte-histogram stub") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos),
      "JDK ImageIO JPEG writer missing")
    val jpg = baos.toByteArray
    val f = MultimodalOps.decodeFeatures("image/jpeg", jpg)
    // uniform gray (lum 128) survives lossy JPEG as (near-)uniform gray:
    // real-pixel luminance concentrates in bin 8 — the stub's histogram of
    // compressed JFIF bytes cannot produce this
    assert(math.abs(f.sum - 1.0f) < 1e-3)
    assert(f(8) > 0.9f, s"expected real-pixel luminance in bin 8: ${f.toSeq}")
    assert(f.toSeq !== MultimodalOps.fakeDecodeFeatures(jpg).toSeq)
    // end-to-end dispatch through extractFeatures
    val df = Seq((1L, jpg, "image/jpeg", jpg.length.toLong))
      .toDF("media_id", "media", "format", "n_bytes")
    val got = MultimodalOps.extractFeatures(df)
      .select($"features").as[Array[Float]].head()
    assert(got(8) > 0.9f)
  }

  test("decodeFeatures: non-image formats keep the stub histogram") {
    val payload = "aaaa".getBytes("UTF-8")
    assert(
      MultimodalOps.decodeFeatures("application/octet-stream", payload).toSeq
        === MultimodalOps.fakeDecodeFeatures(payload).toSeq)
    // undecodable bytes under an image format degrade to the stub, not a crash
    assert(
      MultimodalOps.decodeFeatures("image/png", payload).toSeq
        === MultimodalOps.fakeDecodeFeatures(payload).toSeq)
  }

  test("formatCapabilities: the dispatch table is queryable and matches " +
      "decodeFeatures routing") {
    val caps = MultimodalOps.formatCapabilities(spark)
      .as[(String, String)].collect().toMap
    assert(caps("*") === "stub")
    assert(caps.filter(_._2 == "real").keySet ===
      (MultimodalOps.realFormats ++ MultimodalOps.realAudioFormats ++
        MultimodalOps.realVideoFormats).toSet)
    // routing agrees with the table: a real format decodes, a stub
    // format (compressed video — no JVM codec) gets the byte histogram
    val payload = "aaaa".getBytes("UTF-8")
    for (f <- MultimodalOps.realFormats ++ MultimodalOps.realAudioFormats ++
        MultimodalOps.realVideoFormats)
      assert(caps(f) === "real", s"$f missing from the capability table")
    assert(MultimodalOps.decodeFeatures("video/mp4", payload).toSeq ===
      MultimodalOps.fakeDecodeFeatures(payload).toSeq)
  }

  test("strict mode: stub formats and undecodable payloads yield NULL, " +
      "decodable images still decode") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val truncated = "not a png".getBytes("UTF-8")
    val df = Seq(
      (1L, png, "image/png", png.length.toLong),          // decodes
      (2L, truncated, "image/png", truncated.length.toLong), // fails decode
      (3L, png, "video/mp4", png.length.toLong))          // stub-only format
      .toDF("media_id", "media", "format", "n_bytes")
    val strict = MultimodalOps.extractFeatures(df, strict = true)
      .select($"media_id", $"features").as[(Long, Array[Float])]
      .collect().toMap
    assert(strict(1L)(0) === 0.5f && strict(1L)(15) === 0.5f)
    assert(strict(2L) === null) // no silent histogram stand-in
    assert(strict(3L) === null)
    // permissive mode on the same rows degrades instead of nulling
    val loose = MultimodalOps.extractFeatures(df)
      .select($"media_id", $"features").as[(Long, Array[Float])]
      .collect().toMap
    assert(loose(2L).toSeq === MultimodalOps.fakeDecodeFeatures(truncated).toSeq)
    assert(loose(3L).toSeq === MultimodalOps.fakeDecodeFeatures(png).toSeq)
  }

  test("decodeAudioFeatures: real WAV round trip — 8-bit PCM samples ARE " +
      "the wrapped bytes, histogram matches the stub of the raw bytes") {
    val bytes = "The quick brown fox! 0123".getBytes("UTF-8")
    val wav = MultimodalOps.wrapPcmWav(bytes)
    // it's a genuine RIFF container, not the raw bytes
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val f = MultimodalOps.decodeAudioFeatures(wav)
    assert(f.toSeq === MultimodalOps.fakeDecodeFeatures(bytes).toSeq)
    // and it differs from the stub histogram OF THE CONTAINER (header
    // bytes included) — proof the real parse ran
    assert(f.toSeq !== MultimodalOps.fakeDecodeFeatures(wav).toSeq)
    // end-to-end dispatch through extractFeatures
    val df = Seq((1L, wav, "audio/wav", wav.length.toLong))
      .toDF("media_id", "media", "format", "n_bytes")
    val got = MultimodalOps.extractFeatures(df)
      .select($"features").as[Array[Float]].head()
    assert(got.toSeq === f.toSeq)
  }

  test("decodeAudioFeatures: 16-bit signed WAV and big-endian AIFF decode " +
      "through the PCM canonicalization") {
    import javax.sound.sampled._
    def container(tpe: AudioFileFormat.Type, bigEndian: Boolean): Array[Byte] = {
      // 128 samples: 96 at mid-scale 0 -> amplitude byte 128 -> bin 8,
      // 32 near full scale 0x7000 -> byte 240 -> bin 15
      val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
      val pcm = new Array[Byte](256)
      for (i <- 0 until 64) {
        val v = if (i < 32) 0 else 0x7000
        val (hi, lo) = (((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        val off = 2 * i
        if (bigEndian) { pcm(off) = hi; pcm(off + 1) = lo }
        else { pcm(off) = lo; pcm(off + 1) = hi }
      }
      // second half stays zeros -> also bin 8
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 128)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, baos)
      baos.toByteArray
    }
    for ((tpe, be, name) <- Seq(
        (AudioFileFormat.Type.WAVE, false, "wav16le"),
        (AudioFileFormat.Type.AIFF, true, "aiff16be"))) {
      val f = MultimodalOps.decodeAudioFeatures(container(tpe, be))
      // 96 of 128 samples are 0 (bin 8), 32 are 0x7000 (bin 15)
      assert(f(8) === 0.75f, s"$name: ${f.toSeq}")
      assert(f(15) === 0.25f, s"$name: ${f.toSeq}")
    }
  }

  test("strict audio: valid WAV decodes, garbage under an audio format " +
      "nulls, degradation stays in permissive mode") {
    val bytes = "abcabc".getBytes("UTF-8")
    val wav = MultimodalOps.wrapPcmWav(bytes)
    val garbage = "RIFFnope".getBytes("UTF-8")
    assert(MultimodalOps.decodeFeaturesStrict("audio/wav", wav) !== null)
    assert(MultimodalOps.decodeFeaturesStrict("audio/wav", garbage) === null)
    // permissive degrades to the stub of the garbage bytes
    assert(MultimodalOps.decodeFeatures("audio/wav", garbage).toSeq ===
      MultimodalOps.fakeDecodeFeatures(garbage).toSeq)
  }

  test("audioMediaFromDocuments: WAV-wrapped docs decode back to the text " +
      "byte histogram (the mm_audio_features oracle contract)") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "  !!"))
      .toDF("doc_id", "text")
    val m = MultimodalOps.audioMediaFromDocuments(docs)
    // payloads are RIFF containers with typed metadata
    val meta = m.select($"media_id", $"format", $"n_bytes",
        org.apache.spark.sql.functions.octet_length($"media"))
      .as[(Long, String, Long, Int)].collect()
    assert(meta.forall(_._2 == "audio/wav"))
    assert(meta.forall(r => r._3 == r._4.toLong))
    val got = MultimodalOps.extractFeatures(m)
      .select($"media_id", $"features").as[(Long, Array[Float])]
      .collect().toMap
    assert(got(1L).toSeq ===
      MultimodalOps.fakeDecodeFeatures("hello world".getBytes("UTF-8")).toSeq)
    assert(got(2L).forall(_ == 0f)) // zero-sample WAV -> all-zero histogram
    assert(got(3L)(2) === 1.0f)     // all four bytes in 0x20-0x2f
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

  // ------------------------------------------------------- perceptual hash

  test("THE LEMMA: the 37 fixed pattern BMPs decode and have pairwise " +
      "distinct phashes (grounds the mm_phash_groups oracle at every SF)") {
    val hashes = MultimodalOps.patternBmps(37).map(MultimodalOps.perceptualHash)
    assert(hashes.distinct.length === 37,
      s"pattern phashes collide: ${hashes.mkString(",")}")
    // and they all decoded (a fallback byte-pool hash of a VALID bmp
    // would still be deterministic, but decode failure must be loud here)
    MultimodalOps.patternBmps(37).foreach { b =>
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b)) != null, "pattern BMP undecodable")
    }
  }

  test("perceptualHash is invariant to a UNIFORM brightness shift and " +
      "sensitive to structural change") {
    def img(shift: Int, flip: Boolean) = MultimodalOps.bmp24Gray(16, 16,
      (x, y) => {
        val base = ((x * 31 + y * 17) % 180) + 10 // headroom for +40
        (if (flip && x < 8 && y < 8) 255 - base else base) + shift
      })
    val h0 = MultimodalOps.perceptualHash(img(0, flip = false))
    assert(MultimodalOps.perceptualHash(img(40, flip = false)) === h0,
      "uniform +40 brightness changed the aHash")
    assert(MultimodalOps.perceptualHash(img(0, flip = true)) !== h0,
      "inverting a quadrant left the aHash unchanged")
  }

  test("perceptualHash degrades deterministically on undecodable payloads") {
    val junk = Array.tabulate[Byte](500)(i => (i * 7).toByte)
    val h1 = MultimodalOps.perceptualHash(junk)
    assert(h1 === MultimodalOps.perceptualHash(junk.clone()))
    assert(MultimodalOps.perceptualHash(Array.emptyByteArray) === 0L)
    assert(MultimodalOps.perceptualHash(null) === 0L)
  }

  test("phashDupGroups groups identical images under the lowest media_id") {
    val pats = MultimodalOps.patternBmps(3)
    val rows = Seq(
      (10L, pats(0)), (11L, pats(1)), (12L, pats(0)),
      (13L, pats(2)), (14L, pats(1)), (15L, pats(0)))
    val m = rows.toDF("media_id", "media")
    val got = MultimodalOps.phashDupGroups(m)
      .as[(Long, Long, Long)].collect().toSet
    graft.util.OpCaches.releaseAll(spark)
    assert(got === Set(
      (10L, 10L, 3L), (12L, 10L, 3L), (15L, 10L, 3L),
      (11L, 11L, 2L), (14L, 11L, 2L),
      (13L, 13L, 1L)))
  }

  test("resizeImage: box means are exact integer floors, including " +
      "UNEVEN target boxes (16 -> 3 splits 5/5/6), and undecodable " +
      "payloads yield an empty array") {
    // a gradient image whose pixel (x, y) = x makes every box mean a
    // hand-derivable column average: box [x0, x1) has mean
    // floor(sum(x0..x1-1) / (x1 - x0)) regardless of y
    val img = MultimodalOps.bmp24Gray(16, 16, (x, _) => x)
    def colMean(x0: Int, x1: Int): Long = {
      val s = (x0 until x1).map(_.toLong).sum
      s / (x1 - x0)
    }
    val even = MultimodalOps.resizeImage(img, 4, 4)
    assert(even.length === 16)
    // 4x4 boxes over the x-gradient: every row of cells is identical
    for (iy <- 0 until 4; ix <- 0 until 4)
      assert(even(iy * 4 + ix) === colMean(ix * 4, ix * 4 + 4),
        s"cell ($ix, $iy)")
    // 16 -> 3: floor boundaries 0/5/10/16 — the uneven-box path
    val odd = MultimodalOps.resizeImage(img, 3, 1)
    assert(odd.toSeq === Seq(colMean(0, 5), colMean(5, 10), colMean(10, 16)))
    assert(MultimodalOps.resizeImage(Array[Byte](1, 2, 3), 4, 4).isEmpty)
    assert(MultimodalOps.resizeImage(Array.emptyByteArray, 4, 4).isEmpty)
  }
}
