package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JDK RIFF/AVI container codec for two frame encodings:
  * UNCOMPRESSED 8-bit palettized video (`BI_RGB` DIB `00db` frames) and
  * MOTION-JPEG (`MJPG` `00dc` frames, each an independent JPEG image
  * `javax.imageio` decodes) — the video sibling of the audio path's
  * `javax.sound.sampled` round trip. The AVI *container* is plain RIFF
  * structure (the same chunk grammar as WAVE), so frame extraction is
  * implementable exactly with no native libraries; MJPEG is the one
  * genuinely COMPRESSED video codec the bare JDK can decode, because
  * its frames are just JPEGs. An ffmpeg-backed decoder for the
  * inter-frame codecs (H.264 etc.) composes on top by replacing only
  * the per-frame pixel step: the container walk, stream-header
  * dispatch, and palette handling here are what such a decoder needs
  * anyway.
  *
  * Layout written by [[build]] / [[buildMjpeg]] (standard AVI 1.0):
  * {{{
  * RIFF 'AVI '
  *   LIST 'hdrl'
  *     'avih' MainAVIHeader (56 bytes)
  *     LIST 'strl'  'strh' ('vids'/'DIB ' or 'vids'/'MJPG', 56 bytes)
  *                  'strf' BITMAPINFOHEADER (40) [+ 256 RGBQUAD palette]
  *   LIST 'movi'    '00db' DIB frames (bottom-up rows) or '00dc' JPEGs
  *   'idx1'         one 16-byte entry per frame
  * }}}
  *
  * [[parse]] is a genuine chunk walk: it validates the RIFF/'AVI '
  * envelope, locates the FIRST `vids` stream in `hdrl` (tracking the
  * stream ordinal, so a multi-stream file's audio chunks are never
  * mistaken for frames), reads width/height/bit-depth/compression/
  * palette from THAT stream's `strf`, collects only the movi chunks
  * carrying that stream's two-digit prefix, and decodes per the
  * declared compression: `BI_RGB` frames re-order bottom-up, 4-byte-
  * aligned rows into top-down row-major palette indices with luminance
  * resolved through the PALETTE (mean of the entry's R,G,B — a
  * non-gray palette decodes correctly); `MJPG` frames decode through
  * `javax.imageio` into top-down luminance bytes under an identity
  * palette. Any other compression returns null (visible as stub in the
  * capability matrix).
  */
object AviCodec {

  /** `ImageIO`'s default stream cache is a DISK temp file: every
    * `ImageIO.read`/`write` over an in-memory byte array otherwise
    * creates, fills, and deletes a file under `java.io.tmpdir` — a
    * per-frame syscall tax on the MJPEG paths (~thousands of frames per
    * query) that also serializes under concurrency (32 decode tasks
    * contending on tmpfs metadata measured SLOWER than one, round 20).
    * Memory-cached streams change only where the codec buffers, never
    * the bytes it produces. JVM-global, applied once on first use of
    * any graft codec path ([[imageIoInMemory]] is referenced by this
    * object's encode/decode and by MultimodalOps.readImage).
    */
  private[multimodal] lazy val imageIoInMemory: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** 'MJPG' as the little-endian `biCompression` fourCC. */
  val MJPG: Int = 0x47504a4d

  /** Decoded video: top-down row-major palette indices per frame plus
    * the palette's per-entry luminance ((r+g+b)/3, integer mean).
    */
  final case class Video(
      width: Int,
      height: Int,
      lum: Array[Int],
      frames: Seq[Array[Byte]])

  private val FrameRate = 30

  // ---- builder ----------------------------------------------------------

  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def fourcc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  private def rowStride(width: Int): Int = (width + 3) & ~3

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream(body.length + 8)
    fourcc(o, id); le32(o, body.length); o.write(body)
    if (body.length % 2 == 1) o.write(0) // RIFF word alignment
    o.toByteArray
  }
  private def list(kind: String, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream(body.length + 12)
    fourcc(o, "LIST"); le32(o, body.length + 4); fourcc(o, kind); o.write(body)
    o.toByteArray
  }

  /** Assemble the shared AVI 1.0 container around per-frame chunk
    * bodies (DIB or JPEG — only the headers and chunk id differ).
    */
  private def assemble(
      strh: Array[Byte], strf: Array[Byte], chunkId: String,
      frameBodies: Seq[Array[Byte]], width: Int, height: Int,
      bufBytes: Int): Array[Byte] = {
    val n = frameBodies.length
    val avih = {
      val o = new ByteArrayOutputStream()
      le32(o, 1000000 / FrameRate); le32(o, bufBytes * FrameRate)
      le32(o, 0); le32(o, 0x10) // padding, AVIF_HASINDEX
      le32(o, n); le32(o, 0); le32(o, 1) // totalFrames, initialFrames, streams
      le32(o, bufBytes); le32(o, width); le32(o, height)
      le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0)
      o.toByteArray
    }
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val moviBody = frameBodies.toArray.flatMap(f => chunk(chunkId, f))
    val movi = list("movi", moviBody)
    val idx1 = {
      val o = new ByteArrayOutputStream(16 * n)
      var off = 4 // offsets are relative to the start of 'movi's type tag
      frameBodies.foreach { f =>
        fourcc(o, chunkId); le32(o, 0x10) // AVIIF_KEYFRAME
        le32(o, off); le32(o, f.length)
        off += 8 + f.length + (f.length & 1) // chunk header + word pad
      }
      chunk("idx1", o.toByteArray)
    }
    val body = hdrl ++ movi ++ idx1
    val out = new ByteArrayOutputStream(body.length + 12)
    fourcc(out, "RIFF"); le32(out, body.length + 4); fourcc(out, "AVI ")
    out.write(body)
    out.toByteArray
  }

  private def vidsStrh(
      handler: String, n: Int, bufBytes: Int,
      width: Int, height: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    fourcc(o, "vids"); fourcc(o, handler)
    le32(o, 0); le16(o, 0); le16(o, 0) // flags, priority, language
    le32(o, 0) // initial frames
    le32(o, 1); le32(o, FrameRate) // scale, rate
    le32(o, 0); le32(o, n) // start, length
    le32(o, bufBytes); le32(o, 0); le32(o, 0) // sugBuf, quality, sampleSize
    le16(o, 0); le16(o, 0); le16(o, width); le16(o, height) // rcFrame
    o.toByteArray
  }

  /** Build an AVI whose `00db` frames carry `frames` as 8-bit grayscale
    * palette indices (each frame exactly width*height pixels, caller
    * pads). Deterministic bytes for fixed inputs.
    */
  def build(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "width and height must be positive")
    require(frames.forall(_.length == width * height),
      "each frame must be exactly width*height pixels")
    val stride = rowStride(width)
    val frameBytes = stride * height

    def frameData(f: Array[Byte]): Array[Byte] = {
      // bottom-up rows, each padded to a 4-byte boundary
      val d = new Array[Byte](frameBytes)
      var r = 0
      while (r < height) {
        System.arraycopy(f, (height - 1 - r) * width, d, r * stride, width)
        r += 1
      }
      d
    }

    val strf = {
      val o = new ByteArrayOutputStream()
      le32(o, 40); le32(o, width); le32(o, height)
      le16(o, 1); le16(o, 8) // planes, bpp
      le32(o, 0) // BI_RGB
      le32(o, frameBytes)
      le32(o, 0); le32(o, 0) // ppm x/y
      le32(o, 256); le32(o, 0) // clrUsed, clrImportant
      var i = 0
      while (i < 256) { // grayscale RGBQUAD (b, g, r, reserved)
        o.write(i); o.write(i); o.write(i); o.write(0); i += 1
      }
      o.toByteArray
    }
    assemble(
      vidsStrh("DIB ", frames.length, frameBytes, width, height), strf,
      "00db", frames.map(frameData), width, height, frameBytes)
  }

  /** Build a MOTION-JPEG AVI: each frame (8-bit grayscale pixels,
    * top-down, exactly width*height) is JPEG-encoded via `javax.imageio`
    * into an independent `00dc` chunk — a genuinely COMPRESSED video
    * payload the pure-JDK [[parse]] round-trips (lossily: JPEG).
    * Deterministic bytes for fixed inputs (the JDK encoder is
    * deterministic for a fixed image).
    */
  def buildMjpeg(
      frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "width and height must be positive")
    require(frames.forall(_.length == width * height),
      "each frame must be exactly width*height pixels")
    imageIoInMemory
    def encode(f: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, width, height, f)
      val o = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", o)
      o.toByteArray
    }
    val bodies = frames.map(encode)
    val bufBytes = if (bodies.isEmpty) 0 else bodies.map(_.length).max
    val strf = {
      val o = new ByteArrayOutputStream()
      le32(o, 40); le32(o, width); le32(o, height)
      le16(o, 1); le16(o, 24) // planes, bpp (MJPEG decodes to RGB)
      le32(o, MJPG)
      le32(o, bufBytes)
      le32(o, 0); le32(o, 0) // ppm x/y
      le32(o, 0); le32(o, 0) // clrUsed, clrImportant (no palette)
      o.toByteArray
    }
    assemble(
      vidsStrh("MJPG", frames.length, bufBytes, width, height), strf,
      "00dc", bodies, width, height, bufBytes)
  }

  // ---- parser -----------------------------------------------------------

  /** Parse an 8-bit uncompressed (`BI_RGB`) or Motion-JPEG (`MJPG`)
    * AVI. Null on anything else (wrong envelope, truncated chunks,
    * other compressions, non-8-bit DIB, undecodable or size-mismatched
    * JPEG frames) so table-level decode degrades per row instead of
    * failing a task. Only the FIRST `vids` stream is decoded: movi
    * chunks are accepted solely under that stream's two-digit prefix,
    * so a foreign multi-stream file's audio/subtitle chunks can never
    * be mis-read as frames of the video stream's geometry.
    */
  def parse(payload: Array[Byte]): Video = {
    if (payload == null || payload.length < 12) return null
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    try {
      if (tag(b) != "RIFF") return null
      val riffSize = b.getInt
      if (riffSize < 4 || 8L + riffSize > payload.length) return null
      if (tag(b) != "AVI ") return null

      var width, height, bpp = -1
      var compression = -1
      var lum: Array[Int] = null
      // hdrl stream bookkeeping: strh ordinal of the first 'vids'
      // stream (-1 until seen) and whether the NEXT strf belongs to it
      var strhCount = 0
      var vidsStream = -1
      var strfIsVids = false
      val frames = Seq.newBuilder[Array[Byte]]

      def walk(limit: Int, inMovi: Boolean, inHdrl: Boolean): Unit = {
        while (b.position() + 8 <= limit) {
          val id = tag(b)
          val size = b.getInt
          if (size < 0 || b.position() + size > limit) return
          val next = b.position() + size + (size & 1)
          if (id == "LIST" && size >= 4) {
            val kind = tag(b)
            walk(b.position() + size - 4, inMovi || kind == "movi",
              inHdrl || kind == "hdrl")
          } else if (inHdrl && id == "strh") {
            // ordinal must track the container's stream order even for a
            // malformed entry (size < 4 ⇒ no readable fccType, so it
            // cannot be the vids stream — but it still OWNS a two-digit
            // movi prefix, and skipping it here would desync every later
            // stream's prefix onto the wrong chunks)
            strfIsVids = size >= 4 && {
              val fccType = tag(b)
              fccType == "vids" && vidsStream < 0
            }
            if (strfIsVids) vidsStream = strhCount
            strhCount += 1
          } else if (inHdrl && id == "strf" && strfIsVids && width < 0 &&
              size >= 40) {
            strfIsVids = false
            b.getInt // biSize
            width = b.getInt; height = b.getInt
            b.getShort // planes
            bpp = b.getShort.toInt
            compression = b.getInt
            b.getInt; b.getInt; b.getInt // sizeImage, ppm x/y
            val clrUsed = b.getInt
            b.getInt // clrImportant
            val entries = if (clrUsed == 0) 256 else clrUsed
            if (bpp == 8 && size >= 40 + 4 * entries) {
              lum = new Array[Int](256)
              var i = 0
              while (i < entries) {
                val bl = b.get() & 0xff; val g = b.get() & 0xff
                val r = b.get() & 0xff; b.get()
                lum(i) = (r + g + bl) / 3
                i += 1
              }
            }
          } else if (inMovi && size > 0 && vidsStream >= 0 &&
              id.startsWith(f"$vidsStream%02d") &&
              (id.endsWith("db") || id.endsWith("dc"))) {
            val f = new Array[Byte](size)
            b.get(f)
            frames += f
          }
          b.position(next)
        }
      }
      walk(math.min(payload.length, 8 + riffSize), inMovi = false,
        inHdrl = false)

      if (width <= 0 || height <= 0) return null
      if (compression == MJPG) {
        // MJPEG: every frame is an independent JPEG; decode to top-down
        // luminance bytes under an identity palette so downstream
        // palette resolution is a no-op
        val pixels = frames.result().map { d =>
          val p = jpegLuminance(d, width, height)
          if (p == null) return null
          p
        }
        Video(width, height, Array.tabulate(256)(identity), pixels)
      } else {
        if (bpp != 8 || compression != 0 || lum == null) return null
        val stride = rowStride(width)
        val pixels = frames.result().map { d =>
          if (d.length < stride * height) return null
          val p = new Array[Byte](width * height)
          var r = 0
          while (r < height) { // bottom-up -> top-down
            System.arraycopy(d, (height - 1 - r) * stride, p, r * width, width)
            r += 1
          }
          p
        }
        Video(width, height, lum, pixels)
      }
    } catch {
      case _: java.nio.BufferUnderflowException => null
      case _: IndexOutOfBoundsException => null
    }
  }

  /** Decode one JPEG frame to top-down luminance bytes; null when the
    * bytes aren't a decodable JPEG of exactly the declared geometry.
    */
  private def jpegLuminance(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    try {
      imageIoInMemory
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth != w || img.getHeight != h) null
      else {
        val p = new Array[Byte](w * h)
        val raster = img.getRaster
        val oneBand = raster.getNumBands == 1
        var y = 0; var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            if (oneBand)
              // single-component JPEG: the raster sample IS the
              // luminance byte. getRGB would route the linear-gray
              // color space through sRGB conversion and bend every
              // value nonlinearly — the raster read is the faithful one.
              p(i) = raster.getSample(x, y, 0).toByte
            else {
              val rgb = img.getRGB(x, y)
              p(i) = ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)) / 3).toByte
            }
            i += 1; x += 1
          }
          y += 1
        }
        p
      }
    } catch { case _: java.io.IOException => null }

  private def tag(b: ByteBuffer): String = {
    if (b.remaining() < 4) throw new java.nio.BufferUnderflowException()
    val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
  }
}
