package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JDK RIFF/AVI container codec for UNCOMPRESSED 8-bit palettized
  * video (`BI_RGB` DIB `00db` frames) — the video sibling of the audio
  * path's `javax.sound.sampled` round trip: no JVM codec exists for
  * compressed video, but the AVI *container* plus uncompressed DIB
  * frames is plain RIFF structure (the same chunk grammar as WAVE), so
  * frame extraction and pixel decode are implementable exactly, with no
  * native libraries. A real compressed-codec decoder (ffmpeg-backed)
  * composes on top by replacing only the per-frame pixel step: the
  * container walk, stream-header dispatch, and palette handling here
  * are what such a decoder needs anyway.
  *
  * Layout written by [[build]] (standard AVI 1.0 structure):
  * {{{
  * RIFF 'AVI '
  *   LIST 'hdrl'
  *     'avih' MainAVIHeader (56 bytes)
  *     LIST 'strl'  'strh' ('vids'/'DIB ', 56 bytes)
  *                  'strf' BITMAPINFOHEADER (40) + 256 RGBQUAD palette
  *   LIST 'movi'    '00db' frame chunks (bottom-up DIB rows)
  *   'idx1'         one 16-byte entry per frame
  * }}}
  *
  * [[parse]] is a genuine chunk walk: it validates the RIFF/'AVI '
  * envelope, reads width/height/bit-depth/palette from the first video
  * stream's `strf`, collects `00db`/`00dc` chunks from the 'movi' LIST
  * (rejecting compressed `biCompression != 0` streams), and re-orders
  * each frame's bottom-up, 4-byte-aligned rows into top-down row-major
  * pixel indices. Luminance is resolved through the PALETTE (mean of
  * the entry's R,G,B), not by assuming pixel==gray — a non-gray
  * palette decodes correctly.
  */
object AviCodec {

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
    val n = frames.length

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
    val strh = {
      val o = new ByteArrayOutputStream()
      fourcc(o, "vids"); fourcc(o, "DIB ")
      le32(o, 0); le16(o, 0); le16(o, 0) // flags, priority, language
      le32(o, 0) // initial frames
      le32(o, 1); le32(o, FrameRate) // scale, rate
      le32(o, 0); le32(o, n) // start, length
      le32(o, frameBytes); le32(o, 0); le32(o, 0) // sugBuf, quality, sampleSize
      le16(o, 0); le16(o, 0); le16(o, width); le16(o, height) // rcFrame
      o.toByteArray
    }
    val avih = {
      val o = new ByteArrayOutputStream()
      le32(o, 1000000 / FrameRate); le32(o, frameBytes * FrameRate)
      le32(o, 0); le32(o, 0x10) // padding, AVIF_HASINDEX
      le32(o, n); le32(o, 0); le32(o, 1) // totalFrames, initialFrames, streams
      le32(o, frameBytes); le32(o, width); le32(o, height)
      le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0)
      o.toByteArray
    }

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream(body.length + 8)
      fourcc(o, id); le32(o, body.length); o.write(body)
      if (body.length % 2 == 1) o.write(0) // RIFF word alignment
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream(body.length + 12)
      fourcc(o, "LIST"); le32(o, body.length + 4); fourcc(o, kind); o.write(body)
      o.toByteArray
    }

    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val moviBody = frames.toArray.flatMap(f => chunk("00db", frameData(f)))
    val movi = list("movi", moviBody)
    val idx1 = {
      val o = new ByteArrayOutputStream(16 * n)
      var off = 4 // offsets are relative to the start of 'movi's type tag
      frames.foreach { _ =>
        fourcc(o, "00db"); le32(o, 0x10) // AVIIF_KEYFRAME
        le32(o, off); le32(o, frameBytes)
        off += 8 + frameBytes
      }
      chunk("idx1", o.toByteArray)
    }

    val body = hdrl ++ movi ++ idx1
    val out = new ByteArrayOutputStream(body.length + 12)
    fourcc(out, "RIFF"); le32(out, body.length + 4); fourcc(out, "AVI ")
    out.write(body)
    out.toByteArray
  }

  // ---- parser -----------------------------------------------------------

  /** Parse an uncompressed 8-bit AVI. Null on anything that isn't one
    * (wrong envelope, truncated chunks, compressed or non-8-bit video)
    * so table-level decode degrades per row instead of failing a task.
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
          } else if (inHdrl && id == "strf" && width < 0 && size >= 40) {
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
          } else if (inMovi && size > 0 &&
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

      if (width <= 0 || height <= 0 || bpp != 8 || compression != 0 ||
          lum == null) return null
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
    } catch {
      case _: java.nio.BufferUnderflowException => null
      case _: IndexOutOfBoundsException => null
    }
  }

  private def tag(b: ByteBuffer): String = {
    if (b.remaining() < 4) throw new java.nio.BufferUnderflowException()
    val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
  }
}
