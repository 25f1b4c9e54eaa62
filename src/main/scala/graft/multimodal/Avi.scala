package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal, dependency-free AVI (RIFF) container codec — the piece that
  * makes video frame-sampling REAL in this engine (the JDK ships no video
  * codec, but AVI is a plain RIFF chunk container and uncompressed
  * BI_RGB frames are plain DIB byte layout, both fully documented public
  * formats: Microsoft AVI RIFF File Reference / OpenDML AVI spec).
  *
  * Supported on read:
  *   - uncompressed 24-bit BI_RGB `00db` frames (bottom-up rows, 4-byte
  *     aligned stride) — LOSSLESS, so a SQL oracle can recompute decoded
  *     pixel statistics arithmetically from a generator formula;
  *   - MJPG `00dc` frames (each frame an ordinary JPEG) decoded through
  *     `javax.imageio` — real-world screen/cam captures use this;
  *   - empty frame chunks (the AVI "repeat previous frame" convention);
  *   - frames nested inside `rec ` grouping lists.
  * Anything else (other bit depths, other fourccs) returns None — media
  * pipelines drop undecodable rows and count them, same contract as
  * [[Multimodal.decodeImagesIO]].
  *
  * Frames are exposed as row-major top-down grayscale samples; color
  * sources collapse per-pixel via integer-truncating channel mean, which
  * is exact for the gray (B=G=R) frames the synthetic generator writes.
  */
object Avi {

  /** Decoded video: grayscale frames (row-major, top-down, `width*height`
    * samples each), plus the container's frame-rate fraction.
    */
  final case class Video(
      width: Int,
      height: Int,
      fpsRate: Int,
      fpsScale: Int,
      frames: Vector[Array[Byte]]) {
    def nFrames: Int = frames.length
    def durationMs: Long =
      if (fpsRate <= 0) 0L else nFrames.toLong * 1000L * fpsScale / fpsRate
  }

  private def fourcc(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
  }

  private val RIFF = fourcc("RIFF")
  private val AVI_ = fourcc("AVI ")
  private val LIST = fourcc("LIST")
  private val HDRL = fourcc("hdrl")
  private val STRL = fourcc("strl")
  private val MOVI = fourcc("movi")
  private val REC_ = fourcc("rec ")
  private val AVIH = fourcc("avih")
  private val STRH = fourcc("strh")
  private val STRF = fourcc("strf")
  private val VIDS = fourcc("vids")
  private val MJPG = fourcc("MJPG")

  // =====================================================================
  // Writer
  // =====================================================================

  /** Encode grayscale frames (row-major top-down, `width*height` bytes
    * each) as an AVI at `fps` frames/second — uncompressed 24-bit BI_RGB
    * `00db` frames by default, MJPG `00dc` frames (each a real
    * `ImageIO`-written JPEG) when `mjpeg` is set. Every byte layout
    * detail (bottom-up rows, 4-byte stride padding, even-size chunk
    * padding, idx1 index) follows the published format, so third-party
    * players open the output. BI_RGB is lossless (decode reproduces the
    * input exactly); MJPG is lossy by nature.
    */
  def encode(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]], mjpeg: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(fps > 0, s"bad fps $fps")
    frames.foreach(f => require(f.length == width * height, s"frame length ${f.length} != ${width * height}"))
    val stride = (width * 3 + 3) & ~3
    val frameBytes = stride * height

    def dib(gray: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y // bottom-up storage
        var x = 0
        while (x < width) {
          val v = gray(srcRow * width + x)
          val o = y * stride + x * 3
          out(o) = v; out(o + 1) = v; out(o + 2) = v // B = G = R
          x += 1
        }
        y += 1
      }
      out
    }

    def jpeg(gray: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var i = 0
      while (i < height) {
        var j = 0
        while (j < width) {
          img.getRaster.setSample(j, i, 0, gray(i * width + j) & 0xff)
          j += 1
        }
        i += 1
      }
      val bos = new ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "jpg", bos), "JPEG writer missing")
      bos.toByteArray
    }

    val handler = if (mjpeg) MJPG else fourcc("DIB ")
    val biCompression = if (mjpeg) MJPG else 0 /* BI_RGB */
    val frameCc = if (mjpeg) fourcc("00dc") else fourcc("00db")
    val encoded = frames.map(f => if (mjpeg) jpeg(f) else dib(f))
    val maxFrame = if (encoded.isEmpty) frameBytes else encoded.map(_.length).max

    val bb = new LeBuilder
    // strl list: strh + strf
    val strh = new LeBuilder
    strh.i32(VIDS).i32(handler).i32(0).i32(0).i32(0)
    strh.i32(1).i32(fps) // dwScale=1, dwRate=fps
    strh.i32(0).i32(frames.length).i32(maxFrame).i32(-1).i32(0)
    strh.i16(0).i16(0).i16(width.toShort).i16(height.toShort) // rcFrame
    val strf = new LeBuilder // BITMAPINFOHEADER
    strf.i32(40).i32(width).i32(height).i16(1).i16(24)
    strf.i32(biCompression).i32(frameBytes).i32(0).i32(0).i32(0).i32(0)
    val strl = list(STRL, chunk(STRH, strh.bytes) ++ chunk(STRF, strf.bytes))

    val avih = new LeBuilder
    avih.i32(if (fps > 0) 1000000 / fps else 0).i32(maxFrame * fps).i32(0)
    avih.i32(0x10 /* AVIF_HASINDEX */).i32(frames.length).i32(0).i32(1).i32(maxFrame)
    avih.i32(width).i32(height).i32(0).i32(0).i32(0).i32(0)
    val hdrl = list(HDRL, chunk(AVIH, avih.bytes) ++ strl)

    val moviPayload = new ByteArrayOutputStream()
    val idx = new LeBuilder
    var off = 4 // idx1 offsets are measured from the 'movi' fourcc
    encoded.foreach { f =>
      val c = chunk(frameCc, f)
      moviPayload.write(c)
      idx.i32(frameCc).i32(0x10 /* AVIIF_KEYFRAME */).i32(off).i32(f.length)
      off += c.length
    }
    val movi = list(MOVI, moviPayload.toByteArray)
    val idx1 = chunk(fourcc("idx1"), idx.bytes)

    val payload = hdrl ++ movi ++ idx1
    bb.i32(RIFF).i32(payload.length + 4).i32(AVI_)
    bb.bytes ++ payload
  }

  private final class LeBuilder {
    private val bos = new ByteArrayOutputStream()
    def i32(v: Int): this.type = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff); this
    }
    def i16(v: Int): this.type = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff); this }
    def bytes: Array[Byte] = bos.toByteArray
  }

  private def chunk(id: Int, data: Array[Byte]): Array[Byte] = {
    val b = new LeBuilder
    b.i32(id).i32(data.length)
    val head = b.bytes
    if (data.length % 2 == 0) head ++ data
    else head ++ data ++ Array[Byte](0) // chunks pad to even size
  }

  private def list(listType: Int, payload: Array[Byte]): Array[Byte] = {
    val b = new LeBuilder
    b.i32(LIST).i32(payload.length + 4).i32(listType)
    b.bytes ++ payload
  }

  // =====================================================================
  // Reader
  // =====================================================================

  /** Decode an AVI payload; None when the bytes are not an AVI this
    * reader supports (wrong magic, truncated, unsupported codec/depth).
    * Walks chunks in file order — frame order is the `movi` chunk order,
    * per the format.
    */
  def decode(bytes: Array[Byte]): Option[Video] =
    if (bytes == null || bytes.length < 12) None
    else try doDecode(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def doDecode(bytes: Array[Byte]): Option[Video] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.getInt(0) != RIFF || buf.getInt(8) != AVI_) return None
    val end = math.min(bytes.length.toLong, 8L + buf.getInt(4)).toInt

    var width = 0
    var height = 0
    var bitCount = 0
    var compression = 0
    var fpsRate = 0
    var fpsScale = 1
    var sawVids = false
    // streams are numbered by strl order in hdrl; frame chunks carry the
    // stream number in their fourcc ('00db' = stream 0) — only the FIRST
    // video stream's frames decode (a second video track would otherwise
    // interleave frames of foreign geometry)
    var strlOrdinal = -1
    var videoStream = -1
    var inVideoStrl = false
    val frames = Vector.newBuilder[Array[Byte]]
    var lastFrame: Array[Byte] = null
    var nFrames = 0

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = buf.getInt(pos)
        val size = buf.getInt(pos + 4)
        if (size < 0 || pos + 8 + size > to) return // truncated: stop at valid prefix
        if (id == LIST) {
          val listType = buf.getInt(pos + 8)
          val bodyFrom = pos + 12
          val bodyTo = pos + 8 + size
          if (listType == MOVI) walk(bodyFrom, bodyTo, inMovi = true)
          else if (listType == REC_ && inMovi) walk(bodyFrom, bodyTo, inMovi = true)
          else if (listType == HDRL) walk(bodyFrom, bodyTo, inMovi = false)
          else if (listType == STRL) {
            strlOrdinal += 1
            inVideoStrl = false
            walk(bodyFrom, bodyTo, inMovi = false)
          }
          // other lists (INFO, odml…) are metadata: skip
        } else if (id == STRH && size >= 56) {
          if (buf.getInt(pos + 8) == VIDS && videoStream < 0) {
            sawVids = true
            inVideoStrl = true
            videoStream = math.max(strlOrdinal, 0)
            fpsScale = math.max(1, buf.getInt(pos + 28))
            fpsRate = buf.getInt(pos + 32)
          }
        } else if (id == STRF && size >= 40 && inVideoStrl && width == 0) {
          width = buf.getInt(pos + 12)
          height = buf.getInt(pos + 16)
          bitCount = buf.getShort(pos + 22) & 0xffff
          compression = buf.getInt(pos + 24)
        } else if (inMovi && isFrameChunkOfStream(id, videoStream)) {
          val data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
          val gray =
            if (size == 0) {
              // empty chunk = repeat previous frame (dropped-frame convention)
              if (lastFrame == null) new Array[Byte](math.max(0, width * math.abs(height)))
              else lastFrame
            } else decodeFrame(data)
          lastFrame = gray
          frames += gray
          nFrames += 1
        }
        pos += 8 + size + (size & 1) // chunks pad to even
      }
    }

    def decodeFrame(data: Array[Byte]): Array[Byte] =
      if (compression == 0 && bitCount == 24) decodeDib24(data)
      else if (compression == MJPG) decodeMjpg(data)
      else throw new IllegalArgumentException(
        s"unsupported AVI codec: compression=0x${compression.toHexString} bitCount=$bitCount")

    def decodeDib24(data: Array[Byte]): Array[Byte] = {
      val h = math.abs(height)
      val topDown = height < 0
      val stride = (width * 3 + 3) & ~3
      require(data.length >= stride * h, s"short DIB frame: ${data.length} < ${stride * h}")
      val gray = new Array[Byte](width * h)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        var x = 0
        while (x < width) {
          val o = srcRow * stride + x * 3
          val v = ((data(o) & 0xff) + (data(o + 1) & 0xff) + (data(o + 2) & 0xff)) / 3
          gray(y * width + x) = v.toByte
          x += 1
        }
        y += 1
      }
      gray
    }

    def decodeMjpg(data: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      require(img != null, "MJPG frame did not decode as JPEG")
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      if (width == 0) { width = w; height = h } // tolerate header-less strf
      // a frame whose geometry disagrees with the stream header would make
      // frames.length != width*height — consumers index by the container
      // dims, so drop the file (throw → decode() → None) instead of
      // corrupting downstream math
      require(w == width && h == math.abs(height),
        s"MJPG frame ${w}x$h disagrees with stream header ${width}x${math.abs(height)}")
      val bands = raster.getNumBands
      val gray = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var s = 0
          var b = 0
          while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
          gray(y * w + x) = (s / bands).toByte
          x += 1
        }
        y += 1
      }
      gray
    }

    walk(12, end, inMovi = false)
    val h = math.abs(height)
    if (!sawVids || width <= 0 || h <= 0 || nFrames == 0) None
    else Some(Video(width, h, fpsRate, fpsScale, frames.result()))
  }

  private def isFrameChunkOfStream(id: Int, stream: Int): Boolean = {
    // two-digit stream number + 'db' (uncompressed DIB) or 'dc' (compressed)
    if (stream < 0) return false
    val c0 = id & 0xff
    val c1 = (id >> 8) & 0xff
    val c2 = (id >> 16) & 0xff
    val c3 = (id >> 24) & 0xff
    c0 >= '0' && c0 <= '9' && c1 >= '0' && c1 <= '9' &&
    c2 == 'd' && (c3 == 'b' || c3 == 'c') &&
    (c0 - '0') * 10 + (c1 - '0') == stream
  }
}
