package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, batch-oriented decode/feature
  * extraction, and frame sampling.
  *
  * Image formats (PNG, JPEG, BMP, GIF) decode REAL pixels via the JDK's
  * `javax.imageio`; container audio formats (WAV, AIFF, AU) decode REAL
  * PCM samples via the JDK's `javax.sound.sampled`; uncompressed
  * palettized AVI video decodes REAL frames via the in-repo RIFF walk
  * ([[AviCodec]]) — no native libraries in any path. Compressed audio
  * (MP3/OGG) and compressed video codecs have no JVM decoder in this
  * environment, so they route to a clearly-marked STUB:
  * `fakeDecodeFeatures` derives a deterministic 16-bin byte histogram with
  * the same fixed-width contract, and a real decoder (ffmpeg-backed)
  * drops in by replacing ONE function.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * round-trip); decode runs via `mapPartitions` so a real implementation
  * amortizes codec init per partition, the same execution shape as a
  * Python `mapInPandas` batch UDF; metadata-only queries never touch the
  * payload bytes thanks to parquet column pruning.
  */
object MultimodalOps {

  /** Media-table schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)
  ))

  /** Spread a CPU-heavy encode/decode input across the cluster when the
    * SCAN under it is narrower than the available slots. The media
    * fixtures are small-byte / heavy-CPU: a sub-128 MB parquet file is
    * ONE scan partition under `spark.sql.files.maxPartitionBytes`, so
    * every codec byte of the mjpeg/BMP keys ran in a single task
    * regardless of core count (r19 scaling rows ≈ 1 at 8-vs-32 cores —
    * guide §2.5 "input skew: partitioning by bytes underestimates
    * per-row CPU"). Round-robin repartition to `defaultParallelism`
    * fixes the local/bench case and is a NO-OP at scale (a 100 TB scan
    * already carries more partitions than slots, so no exchange is
    * added); values are per-row and every consumer aggregates
    * order-independently, so results are partition-invariant.
    */
  private def decodeSpread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Build a media table from the documents fixture: the UTF-8 bytes of
    * `text` stand in for an opaque payload (deterministic, so metadata
    * queries remain oracle-checkable via `octet_length`).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("format"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Metadata-only stats per format — reads no payload bytes. */
  def mediaStats(media: DataFrame): DataFrame =
    media
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * Used for formats with no JVM codec (audio/video — no codecs in this
    * container); images route through [[decodeImageFeatures]] instead.
    * The signature — bytes in, fixed-width Float features out — is the
    * contract either way.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload == null || payload.isEmpty) return bins
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) >> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { bins(j) /= payload.length.toFloat; j += 1 }
    bins
  }

  /** REAL decoder for image formats with a pure-JVM codec (PNG, BMP, GIF
    * via `javax.imageio` — no native libraries): decode pixels, compute a
    * 16-bin LUMINANCE histogram (mean of R,G,B, bucketed by high nibble),
    * L1-normalized — same fixed-width contract as the stub. Returns the
    * byte-histogram fallback when the payload doesn't decode (truncated /
    * mislabeled), so a bad record degrades instead of failing the task.
    */
  def decodeImageFeatures(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return new Array[Float](16)
    val img = readImage(payload)
    if (img == null) fakeDecodeFeatures(payload) else luminanceHistogram(img)
  }

  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    try {
      AviCodec.imageIoInMemory // memory-cached streams (see AviCodec)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    } catch { case _: java.io.IOException => null }

  private def luminanceHistogram(
      img: java.awt.image.BufferedImage): Array[Float] = {
    val bins = new Array[Float](16)
    val (w, h) = (img.getWidth, img.getHeight)
    val n = w * h
    if (n == 0) return bins
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        bins(lum >> 4) += 1f
        x += 1
      }
      y += 1
    }
    var j = 0
    while (j < 16) { bins(j) /= n.toFloat; j += 1 }
    bins
  }

  /** The format-support matrix — the ONE source of truth for dispatch,
    * surfaced to callers via [[formatCapabilities]]: `real` formats
    * decode in-JVM (every standard JDK ships ImageIO readers for the
    * image rows and javax.sound.sampled readers for the audio rows);
    * every other format is `stub` (deterministic byte histogram — no
    * JVM codec for compressed audio/video in this environment; a real
    * ffmpeg-backed decoder drops in by replacing [[fakeDecodeFeatures]]).
    */
  val realFormats: Seq[String] = Seq(
    "image/png", "image/jpeg", "image/jpg", "image/bmp", "image/gif",
    "image/wbmp")

  /** Container audio formats the JDK decodes natively (RIFF/WAVE, AIFF,
    * Sun AU — `javax.sound.sampled.AudioSystem` file readers). Compressed
    * codecs (MP3, OGG, AAC) are NOT in this list: no JVM decoder ships
    * with the JDK, so they stay on the stub and are visible as such in
    * [[formatCapabilities]].
    */
  val realAudioFormats: Seq[String] = Seq(
    "audio/wav", "audio/x-wav", "audio/wave", "audio/aiff", "audio/x-aiff",
    "audio/basic")

  /** Video container formats with a real in-repo decode path: AVI with
    * uncompressed 8-bit palettized DIB frames, and AVI with MOTION-JPEG
    * frames — the one genuinely COMPRESSED video codec the bare JDK
    * decodes, because each `00dc` chunk is an independent JPEG for
    * `javax.imageio` ([[AviCodec]] — a genuine RIFF chunk walk, no
    * native libraries; `video/x-motion-jpeg` labels MJPEG-in-AVI
    * payloads). Inter-frame codecs (H.264/MP4 etc.) inside any
    * container fail [[AviCodec.parse]] and degrade to the stub/null
    * like any undecodable real-format payload — still visible as stub
    * rows in [[formatCapabilities]].
    */
  val realVideoFormats: Seq[String] =
    Seq("video/avi", "video/x-msvideo", "video/x-motion-jpeg")

  /** REAL decoder for container audio (WAV/AIFF/AU via
    * `javax.sound.sampled` — no native libraries): decode to PCM,
    * convert to signed 16-bit, and compute a 16-bin AMPLITUDE histogram
    * over samples (bucketed by the high nibble of the unsigned-8-bit
    * view), L1-normalized — the same fixed-width contract as the image
    * and stub paths. For 8-bit unsigned PCM the decoded amplitudes ARE
    * the payload's data bytes, which is what lets the end-to-end audio
    * query be oracle-checked bit-exactly against a SQL byte histogram.
    * Returns the byte-histogram fallback when the payload doesn't parse
    * (truncated / mislabeled), so a bad record degrades instead of
    * failing the task.
    */
  def decodeAudioFeatures(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return new Array[Float](16)
    val samples = readPcmSamples(payload)
    if (samples == null) fakeDecodeFeatures(payload)
    else amplitudeHistogram(samples)
  }

  /** Decode any JDK-supported audio container to signed 16-bit PCM
    * samples (all channels interleaved — channel structure doesn't
    * matter for an amplitude histogram). Null when the payload isn't a
    * parseable audio file or the PCM conversion is unsupported.
    */
  private def readPcmSamples(payload: Array[Byte]): Array[Int] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val base = in.getFormat
        // canonicalize: the JDK's PCM codec widens/sign-flips any PCM
        // depth to signed 16-bit little-endian without resampling
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          base.getChannels * 2, base.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = ((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)
          i += 1
        }
        out
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => null
      case _: java.io.IOException => null
      case _: IllegalArgumentException => null // PCM conversion unsupported
    }

  private def amplitudeHistogram(samples: Array[Int]): Array[Float] = {
    val bins = new Array[Float](16)
    if (samples.isEmpty) return bins
    var i = 0
    while (i < samples.length) {
      // signed 16-bit -> unsigned 8-bit amplitude -> high nibble;
      // inverts the codec's 8-bit widening ((b-128)<<8) exactly
      bins(((samples(i) >> 8) + 128) >> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { bins(j) /= samples.length.toFloat; j += 1 }
    bins
  }

  /** Wrap raw bytes as a REAL RIFF/WAVE file (8-bit unsigned mono PCM)
    * via `AudioSystem.write` — each input byte becomes one sample, so
    * [[decodeAudioFeatures]] on the result reproduces
    * [[fakeDecodeFeatures]] of the input bit-exactly. Deterministic
    * (fixed header for a fixed sample rate), which makes synthesized
    * audio payloads oracle-checkable.
    */
  def wrapPcmWav(samples: Array[Byte], sampleRate: Float = 8000f): Array[Byte] = {
    val data = if (samples == null) Array.emptyByteArray else samples
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, data.length.toLong)
    val baos = new java.io.ByteArrayOutputStream(data.length + 64)
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Build an audio media table from the documents fixture: each doc's
    * UTF-8 text bytes wrapped as a real 8-bit PCM WAV payload
    * ([[wrapPcmWav]]). Runs per partition like the decode path; the
    * payload is a genuine RIFF file, so the downstream decode exercises
    * the REAL `javax.sound.sampled` parse, while the sample values stay
    * deterministic and SQL-predictable for the oracle.
    */
  def audioMediaFromDocuments(docs: DataFrame): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = wrapPcmWav(r.getString(1).getBytes("UTF-8"))
          Row(r.getLong(0), payload, "audio/wav", payload.length.toLong)
        }
      }(enc)
  }

  /** REAL decoder for uncompressed palettized AVI ([[AviCodec]]):
    * 16-bin LUMINANCE histogram over ALL frames' pixels, resolved
    * through the palette, L1-normalized — the whole-payload form of the
    * per-frame [[decodeVideoFrameFeatures]], under the same fixed-width
    * contract as the image/audio/stub paths. Byte-histogram fallback
    * when the payload isn't a parseable uncompressed AVI.
    */
  def decodeVideoFeatures(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return new Array[Float](16)
    val video = AviCodec.parse(payload)
    if (video == null) fakeDecodeFeatures(payload)
    else videoLuminanceHistogram(video, video.frames)
  }

  private def videoLuminanceHistogram(
      video: AviCodec.Video,
      frames: Seq[Array[Byte]]): Array[Float] = {
    val bins = new Array[Float](16)
    var n = 0L
    frames.foreach { f =>
      var i = 0
      while (i < f.length) {
        bins(video.lum(f(i) & 0xff) >> 4) += 1f
        i += 1
      }
      n += f.length
    }
    if (n == 0L) return bins
    var j = 0
    while (j < 16) { bins(j) /= n.toFloat; j += 1 }
    bins
  }

  /** Wrap raw bytes as a REAL uncompressed 8-bit AVI: the bytes become
    * grayscale pixel values, chunked into width x height frames (last
    * frame zero-padded). With the grayscale palette, a pixel's decoded
    * luminance IS its byte value — so, like [[wrapPcmWav]], synthesized
    * video payloads stay SQL-predictable while the downstream decode
    * exercises the full container parse. Deterministic bytes.
    */
  def wrapDibAvi(
      bytes: Array[Byte], width: Int = 16, height: Int = 8): Array[Byte] = {
    val data = if (bytes == null) Array.emptyByteArray else bytes
    val per = width * height
    val nFrames = (data.length + per - 1) / per
    val frames = (0 until nFrames).map { i =>
      val f = new Array[Byte](per)
      val len = math.min(per, data.length - i * per)
      System.arraycopy(data, i * per, f, 0, len)
      f
    }
    AviCodec.build(frames, width, height)
  }

  /** Build a video media table from the documents fixture: each doc's
    * UTF-8 text bytes wrapped as a real uncompressed AVI
    * ([[wrapDibAvi]]) — the video analogue of
    * [[audioMediaFromDocuments]].
    */
  def videoMediaFromDocuments(docs: DataFrame): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = wrapDibAvi(r.getString(1).getBytes("UTF-8"))
          Row(r.getLong(0), payload, "video/avi", payload.length.toLong)
        }
      }(enc)
  }

  /** Wrap raw bytes as a real MOTION-JPEG AVI: the bytes become
    * grayscale pixels chunked into width x height frames (last frame
    * zero-padded), each JPEG-encoded into a `00dc` chunk
    * ([[AviCodec.buildMjpeg]]). Unlike [[wrapDibAvi]] the pixel round
    * trip is LOSSY (JPEG), so synthesized payloads exercise the real
    * compressed-codec decode path rather than staying SQL-predictable
    * per pixel; frame COUNT and geometry stay exact.
    */
  def wrapMjpegAvi(
      bytes: Array[Byte], width: Int = 16, height: Int = 8): Array[Byte] = {
    val data = if (bytes == null) Array.emptyByteArray else bytes
    val per = width * height
    val nFrames = (data.length + per - 1) / per
    val frames = (0 until nFrames).map { i =>
      val f = new Array[Byte](per)
      val len = math.min(per, data.length - i * per)
      System.arraycopy(data, i * per, f, 0, len)
      f
    }
    AviCodec.buildMjpeg(frames, width, height)
  }

  /** The MJPEG analogue of [[videoMediaFromDocuments]]: each doc's
    * UTF-8 text bytes wrapped as a real compressed (Motion-JPEG) AVI.
    */
  def mjpegMediaFromDocuments(docs: DataFrame): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    decodeSpread(docs.select(col("doc_id"), col("text")))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = wrapMjpegAvi(r.getString(1).getBytes("UTF-8"))
          Row(r.getLong(0), payload, "video/x-motion-jpeg",
            payload.length.toLong)
        }
      }(enc)
  }

  /** Per-frame feature extraction with frame sampling: parse each AVI
    * payload, keep every `stride`-th frame (keyframe-ish sampling — but
    * on DECODED frames, unlike [[frameSample]]'s opaque byte slices),
    * and emit a 16-bin palette-resolved luminance histogram per kept
    * frame. Unparseable payloads contribute no rows (use the strict
    * whole-payload path when failures must be visible). Runs per
    * partition like every decode path, so a real compressed codec
    * amortizes init across the batch.
    *
    * Output: (media_id, frame_idx, features ARRAY<FLOAT>).
    */
  def decodeVideoFrameFeatures(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = Encoders.row(outSchema)
    media
      .select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val video = AviCodec.parse(r.getAs[Array[Byte]](1))
          if (video == null) Iterator.empty
          else video.frames.iterator.zipWithIndex
            .filter(_._2 % stride == 0)
            .map { case (f, i) =>
              Row(id, i, videoLuminanceHistogram(video, Seq(f)))
            }
        }
      }(enc)
  }

  /** The queryable capability table: (format, decoder) with one `real`
    * row per in-JVM-decodable format plus the `*` default row naming
    * the stub — so a pipeline can JOIN its media formats against this
    * and route/alert on stub coverage instead of discovering it in the
    * output. Deterministic (no runtime codec probing), hence
    * oracle-checkable.
    */
  def formatCapabilities(
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    ((realFormats ++ realAudioFormats ++ realVideoFormats)
      .map((_, "real")) :+ ("*" -> "stub"))
      .toDF("format", "decoder")
  }

  /** Format-dispatched decode: `real` image formats get the pixel path,
    * `real` audio formats the PCM path, everything else the
    * deterministic stub histogram (see [[realFormats]] /
    * [[realAudioFormats]]). A real-format payload that fails to decode
    * degrades to the stub histogram; use `strict` in
    * [[extractFeatures]] when degradation must be visible.
    */
  def decodeFeatures(format: String, payload: Array[Byte]): Array[Float] =
    if (realFormats.contains(format)) decodeImageFeatures(payload)
    else if (realAudioFormats.contains(format)) decodeAudioFeatures(payload)
    else if (realVideoFormats.contains(format)) decodeVideoFeatures(payload)
    else fakeDecodeFeatures(payload)

  /** STRICT decode: real formats yield pixel/PCM features or NULL when
    * the payload fails to decode (truncated/mislabeled); stub-only
    * formats yield NULL always — no silent histogram stand-ins. The
    * mode for pipelines that must KNOW which rows carry real features
    * (training on stub histograms because a codec was missing is the
    * exact failure this surfaces).
    */
  def decodeFeaturesStrict(format: String, payload: Array[Byte]): Array[Float] =
    if (payload == null || payload.isEmpty) null
    else if (realFormats.contains(format)) {
      val img = readImage(payload)
      if (img == null) null else luminanceHistogram(img)
    } else if (realAudioFormats.contains(format)) {
      val samples = readPcmSamples(payload)
      if (samples == null) null else amplitudeHistogram(samples)
    } else if (realVideoFormats.contains(format)) {
      val video = AviCodec.parse(payload)
      if (video == null) null
      else videoLuminanceHistogram(video, video.frames)
    } else null

  /** Batched feature extraction over the media table. Runs the decoder
    * per partition (codec init amortized across the batch, mirroring a
    * `mapInPandas` batch UDF); dispatch is per-row on the `format`
    * column. Output: (media_id, features ARRAY<FLOAT>).
    */
  def extractFeatures(media: DataFrame, strict: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = strict)))
    val enc = Encoders.row(outSchema)
    media
      .select(col("media_id"), col("media"), col("format"))
      .mapPartitions { rows =>
        // per-partition init point for stateful codecs goes here
        // (ImageIO readers are static; nothing to initialize for images)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val format = r.getString(2)
          Row(id,
            if (strict) decodeFeaturesStrict(format, payload)
            else decodeFeatures(format, payload))
        }
      }(enc)
  }

  /** Frame sampling: cut the payload into fixed-size frames taking every
    * `stride`-th frame (video keyframe-ish sampling on opaque bytes).
    * Pure column expressions — `substring` on BINARY stays codegen'd.
    * Output: (media_id, frame_idx, frame BINARY).
    */
  def frameSample(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0, "frameSize and stride must be positive")
    val nFrames = floor((octet_length(col("media")) + frameSize - 1) / frameSize)
    // empty payload -> no frames (sequence(0, -1) is not expressible, so
    // guard explicitly rather than clamping to a phantom zero-length frame)
    val frameIdxs = when(nFrames > 0,
      filter(
        sequence(lit(0), greatest(nFrames - 1, lit(0)).cast("int")),
        i => i % stride === 0))
      .otherwise(array().cast("array<int>"))
    media
      .select(
        col("media_id"),
        posexplode(
          transform(
            frameIdxs,
            i => col("media").substr((i * frameSize + 1).cast("int"), lit(frameSize))))
          .as(Seq("frame_idx", "frame")))
  }

  // -------------------------------------------------------------------
  // Perceptual-hash image dedup
  // -------------------------------------------------------------------

  /** Minimal 24-bit bottom-up BMP (gray: B=G=R per pixel). Row stride
    * `w*3` must be 4-byte aligned (true for w % 4 == 0) — kept simple
    * on purpose; this is the deterministic image-fixture builder for
    * the phash family's tests and the patterned media table.
    */
  def bmp24Gray(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && (w * 3) % 4 == 0,
      s"need positive dims with 4-aligned stride, got ${w}x$h")
    val rowBytes = w * 3
    val size = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
    b.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
    b.putInt(0).putInt(0)
    var y = h - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = (pix(x, y) & 0xff).toByte
        b.put(v).put(v).put(v)
        x += 1
      }
      y -= 1
    }
    b.array()
  }

  /** The `n` fixed 16x16 pattern BMPs (md5-derived pixels — the same
    * image constants every run and every scale factor). Their phashes
    * being pairwise DISTINCT is the lemma MultimodalSpec verifies once;
    * because the patterns never change with the corpus, that single
    * check makes the `mm_phash_groups` oracle (`doc_id % n` grouping)
    * exact at every SF.
    */
  def patternBmps(n: Int): Seq[Array[Byte]] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { p =>
      bmp24Gray(16, 16, (x, y) =>
        d.digest(s"$p:$x:$y".getBytes("UTF-8"))(0) & 0xff)
    }
  }

  /** An image-media table over the documents fixture: media_id i carries
    * pattern BMP `i % nPatterns`. The 37 ~830-byte images ride the plan
    * as an array-of-binary literal (~30 KB) — no second input, no join.
    */
  def patternedBmpMedia(docs: DataFrame, nPatterns: Int = 37): DataFrame = {
    require(nPatterns >= 1 && nPatterns <= 256,
      s"nPatterns must be in [1,256], got $nPatterns")
    val arr = array(patternBmps(nPatterns).map(lit(_)).toIndexedSeq: _*)
    docs.select(
      col("doc_id").as("media_id"),
      element_at(arr, (col("doc_id") % nPatterns).cast("int") + 1).as("media"),
      lit("image/bmp").as("format"))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))
  }

  /** Box-resample (average-pool) RESIZE of one image to w×h gray pixels:
    * REAL decode (javax.imageio), then target cell (ix, iy) averages the
    * source box [⌊ix·W/w⌋, ⌊(ix+1)·W/w⌋) × [⌊iy·H/h⌋, ⌊(iy+1)·H/h⌋) —
    * the thumbnail/downsample step a multimodal training pipeline runs
    * before feature extraction. The cell value is the INTEGER floor of
    * the summed R+G+B over the box divided by 3·pixels (exact integer
    * arithmetic end to end, so both engines land the identical value;
    * on the gray fixtures this is exactly the floor-mean of the channel
    * value). Undecodable or empty payloads yield an empty array —
    * missing codecs stay visible, the [[extractFeatures]] strict-mode
    * discipline.
    */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Long] = {
    require(w >= 1 && h >= 1, s"target dims must be positive, got ${w}x$h")
    if (payload == null || payload.isEmpty) return Array.empty
    val img = readImage(payload)
    if (img == null || img.getWidth < 1 || img.getHeight < 1)
      return Array.empty
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new Array[Long](w * h)
    var iy = 0
    while (iy < h) {
      val y0 = iy * sh / h
      val y1 = math.max((iy + 1) * sh / h, y0 + 1) min sh
      var ix = 0
      while (ix < w) {
        val x0 = ix * sw / w
        val x1 = math.max((ix + 1) * sw / w, x0 + 1) min sw
        var sum = 0L
        var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            cnt += 3
            x += 1
          }
          y += 1
        }
        out(iy * w + ix) = if (cnt == 0) 0L else sum / cnt
        ix += 1
      }
      iy += 1
    }
    out
  }

  /** [[resizeImage]] over a media table — decode + pool per row in a
    * per-partition batch (the one mapPartitions the repo reserves for
    * binary media), then a linear posexplode to one row per target cell.
    * Output: (media_id, iy, ix, v), w·h rows per decodable image.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("px", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val enc = Encoders.row(outSchema)
    decodeSpread(media.select(col("media_id"), col("media")))
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0),
          resizeImage(r.getAs[Array[Byte]](1), w, h).toSeq))
      }(enc)
      .select(col("media_id"), posexplode(col("px")).as(Seq("i", "v")))
      .select(
        col("media_id"),
        (col("i") / lit(w)).cast("long").as("iy"),
        (col("i") % lit(w)).cast("long").as("ix"),
        col("v"))
  }

  /** 64-bit average-hash (aHash) of an image: decode, 8x8 average-pool
    * the luminance, threshold each block at the global block mean —
    * bit i set iff block i >= mean. Identical images hash identically;
    * a UNIFORM brightness shift preserves every bit (blocks and mean
    * shift together), which is what makes aHash a perceptual rather
    * than byte-level fingerprint. Undecodable payloads fall back to the
    * same pooling over the RAW bytes (deterministic degrade, mirroring
    * [[decodeImageFeatures]]).
    */
  def perceptualHash(payload: Array[Byte]): Long = {
    if (payload == null || payload.isEmpty) return 0L
    val img = readImage(payload)
    if (img == null || img.getWidth < 1 || img.getHeight < 1)
      return poolHash(payload.length,
        i => payload(i) & 0xff, (i, n) => (i * 64L / n).toInt)
    val (w, h) = (img.getWidth, img.getHeight)
    val block = new Array[Double](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        val idx = by * 8 + x * 8 / w
        block(idx) += lum
        cnt(idx) += 1
        x += 1
      }
      y += 1
    }
    packBits(block, cnt)
  }

  private def poolHash(n: Int, at: Int => Int, idx: (Int, Int) => Int): Long = {
    val block = new Array[Double](64)
    val cnt = new Array[Long](64)
    var i = 0
    while (i < n) {
      val b = math.min(idx(i, n), 63)
      block(b) += at(i)
      cnt(b) += 1
      i += 1
    }
    packBits(block, cnt)
  }

  private def packBits(block: Array[Double], cnt: Array[Long]): Long = {
    var mean = 0.0
    var i = 0
    while (i < 64) {
      block(i) = if (cnt(i) == 0) 0.0 else block(i) / cnt(i)
      mean += block(i)
      i += 1
    }
    mean /= 64.0
    var hash = 0L
    i = 0
    while (i < 64) {
      if (block(i) >= mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Perceptual-hash dedup groups: every media row mapped to the keeper
    * (lowest media_id) of its aHash-equality group — the image
    * counterpart of exact text dedup ([[graft.dedup.Dedup.exactGroups]]),
    * robust to re-encodes that preserve pixels and to uniform brightness
    * shifts. Decode runs once per row in a per-partition batch
    * (cached — it feeds both the group aggregate and the join-back);
    * groups are one hash aggregation, and the join back to rows reuses
    * the phash hash partitioning on the aggregated side.
    *
    * Output: (media_id, keeper, group_n).
    */
  def phashDupGroups(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    val hashes = graft.util.OpCaches.cache(
      decodeSpread(media.select(col("media_id"), col("media")))
        .mapPartitions { rows =>
          rows.map(r => Row(r.getLong(0), perceptualHash(r.getAs[Array[Byte]](1))))
        }(enc))
    val groups = hashes.groupBy(col("phash"))
      .agg(min(col("media_id")).as("keeper"), count(lit(1)).as("group_n"))
    hashes.join(groups, Seq("phash"))
      .select(col("media_id"), col("keeper"), col("group_n"))
  }
}
