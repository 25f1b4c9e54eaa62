package graft

import java.io.ByteArrayOutputStream

import graft.multimodal.Avi
import org.scalatest.funsuite.AnyFunSuite

/** Pure-codec tests for the dependency-free AVI reader/writer — no Spark.
  * The Spark-side plumbing (decodeVideoIO / sampleFramesIO) is covered in
  * MultimodalSpec; here we pin the byte-level container contract,
  * including a hand-built file that cross-checks the reader against the
  * published RIFF layout independently of our own writer.
  */
class AviSpec extends AnyFunSuite {

  private def formulaFrames(id: Long, w: Int, h: Int, n: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      Array.tabulate(w * h)(k => ((id * 31 + f * 101 + (k / w) * 7 + (k % w) * 13) % 256).toByte)
    }

  test("BI_RGB round trip is lossless: frames, dims, fps exact") {
    val frames = formulaFrames(7L, 5, 3, 4)
    val bytes = Avi.encode(5, 3, 12, frames)
    val v = Avi.decode(bytes).get
    assert(v.width == 5 && v.height == 3)
    assert(v.fpsRate == 12 && v.fpsScale == 1)
    assert(v.nFrames == 4)
    assert(v.durationMs == 4 * 1000L / 12)
    frames.zip(v.frames).foreach { case (in, out) => assert(in.toSeq == out.toSeq) }
  }

  test("stride padding: width not a multiple of 4 still round-trips exactly") {
    // w=3 → row stride 12 with 3 pad bytes; w=1 → stride 4
    for (w <- Seq(1, 2, 3, 6, 7)) {
      val frames = formulaFrames(w.toLong, w, 2, 2)
      val v = Avi.decode(Avi.encode(w, 2, 10, frames)).get
      assert(v.width == w && v.height == 2)
      frames.zip(v.frames).foreach { case (in, out) => assert(in.toSeq == out.toSeq) }
    }
  }

  test("MJPG frames decode through ImageIO: dims and frame count, means close") {
    // JPEG is lossy: check structure exactly, pixel content approximately
    val frames = formulaFrames(3L, 16, 8, 3)
    val bytes = Avi.encode(16, 8, 25, frames, mjpeg = true)
    val v = Avi.decode(bytes).get
    assert(v.width == 16 && v.height == 8 && v.nFrames == 3)
    frames.zip(v.frames).foreach { case (in, out) =>
      assert(out.length == 16 * 8)
      val mIn = in.map(_ & 0xff).sum.toDouble / in.length
      val mOut = out.map(_ & 0xff).sum.toDouble / out.length
      assert(math.abs(mIn - mOut) < 16.0, s"JPEG mean drift too large: $mIn vs $mOut")
    }
  }

  test("garbage, truncated, and non-AVI RIFF inputs decode to None") {
    assert(Avi.decode(null).isEmpty)
    assert(Avi.decode(Array.emptyByteArray).isEmpty)
    assert(Avi.decode("not an avi at all".getBytes("UTF-8")).isEmpty)
    val good = Avi.encode(4, 4, 10, formulaFrames(1L, 4, 4, 2))
    // truncating inside the movi list loses all frame data → None or fewer frames, never a throw
    val cut = java.util.Arrays.copyOf(good, good.length / 4)
    assert(Avi.decode(cut).forall(_.nFrames <= 2))
    // valid RIFF magic, wrong form type
    val wave = good.clone()
    wave(8) = 'W'; wave(9) = 'A'; wave(10) = 'V'; wave(11) = 'E'
    assert(Avi.decode(wave).isEmpty)
  }

  test("unsupported codec fourcc yields None, not a crash") {
    val good = Avi.encode(4, 2, 10, formulaFrames(2L, 4, 2, 1))
    // patch biCompression in strf (offset of the field inside the file):
    // find the 'strf' chunk and overwrite its biCompression dword
    val idx = indexOfFourcc(good, "strf")
    assert(idx > 0)
    val patched = good.clone()
    // strf header(8) + biSize(4) + biWidth(4) + biHeight(4) + biPlanes(2) + biBitCount(2)
    val compOff = idx + 8 + 16
    patched(compOff) = 'X'; patched(compOff + 1) = 'V'; patched(compOff + 2) = 'I'; patched(compOff + 3) = 'D'
    assert(Avi.decode(patched).isEmpty)
  }

  // hand-build helpers: published RIFF layout, independent of Avi.encode
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val padded = if (body.length % 2 == 0) body else body :+ 0.toByte
    cc(id) ++ le32(body.length) ++ padded
  }
  private def list(tpe: String, body: Array[Byte]): Array[Byte] =
    cc("LIST") ++ le32(body.length + 4) ++ cc(tpe) ++ body
  private def vidsStrl(w: Int, h: Int, fps: Int, nFrames: Int): Array[Byte] = {
    val strh = le32Concat(cc("vids"), cc("DIB "), le32(0), le32(0), le32(0),
      le32(1), le32(fps), le32(0), le32(nFrames), le32(8), le32(-1), le32(0),
      Array[Byte](0, 0, 0, 0), Array[Byte](w.toByte, 0, h.toByte, 0))
    val strf = le32Concat(le32(40), le32(w), le32(h), Array[Byte](1, 0, 24, 0),
      le32(0), le32(8), le32(0), le32(0), le32(0), le32(0))
    list("strl", chunk("strh", strh) ++ chunk("strf", strf))
  }

  test("hand-built AVI with rec-list nesting and empty repeat-frame chunk reads per spec") {
    // 2×1 BI_RGB, fps 10/1, frames: [10,20], empty chunk (= repeat), both
    // wrapped in a 'rec ' grouping list inside 'movi'
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)) ++ vidsStrl(2, 1, 10, 2))
    // one DIB frame: 2×1 px gray values 10,20 → BGR bytes + 2 stride-pad bytes (stride 8)
    val dib = Array[Byte](10, 10, 10, 20, 20, 20, 0, 0)
    val movi = list("movi",
      list("rec ", chunk("00db", dib)) ++ chunk("00db", Array.emptyByteArray))
    val payload = hdrl ++ movi
    val file = cc("RIFF") ++ le32(payload.length + 4) ++ cc("AVI ") ++ payload

    val v = Avi.decode(file).get
    assert(v.width == 2 && v.height == 1)
    assert(v.fpsRate == 10 && v.fpsScale == 1)
    assert(v.nFrames == 2)
    assert(v.frames(0).toSeq == Seq(10.toByte, 20.toByte))
    assert(v.frames(1).toSeq == v.frames(0).toSeq) // empty chunk repeats previous
  }

  test("second video stream's frames are NOT interleaved into stream 0") {
    // two video strls: stream 0 is 2×1, stream 1 is 1×1; movi carries a
    // 00db frame, a 01db frame (foreign geometry), then another 00db —
    // only the stream-0 frames may decode
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)) ++
      vidsStrl(2, 1, 10, 2) ++ vidsStrl(1, 1, 10, 1))
    val dib0a = Array[Byte](10, 10, 10, 20, 20, 20, 0, 0) // 2×1, stride 8
    val dib0b = Array[Byte](30, 30, 30, 40, 40, 40, 0, 0)
    val dib1 = Array[Byte](99, 99, 99, 0) // 1×1, stride 4
    val movi = list("movi",
      chunk("00db", dib0a) ++ chunk("01db", dib1) ++ chunk("00db", dib0b))
    val payload = hdrl ++ movi
    val file = cc("RIFF") ++ le32(payload.length + 4) ++ cc("AVI ") ++ payload
    val v = Avi.decode(file).get
    assert(v.width == 2 && v.height == 1)
    assert(v.nFrames == 2, s"stream-1 frame leaked in: ${v.nFrames} frames")
    assert(v.frames(0).toSeq == Seq(10.toByte, 20.toByte))
    assert(v.frames(1).toSeq == Seq(30.toByte, 40.toByte))
  }

  test("MJPG frame whose dims disagree with the stream header drops the file") {
    val frames = formulaFrames(5L, 16, 8, 2)
    val good = Avi.encode(16, 8, 10, frames, mjpeg = true)
    assert(Avi.decode(good).isDefined)
    // patch strf biWidth 16 → 8: the embedded JPEGs are still 16×8
    val idx = indexOfFourcc(good, "strf")
    val patched = good.clone()
    java.lang.System.arraycopy(le32(8), 0, patched, idx + 8 + 4, 4)
    assert(Avi.decode(patched).isEmpty,
      "mismatched MJPG geometry must drop the file, not emit corrupt frames")
  }

  test("bottom-up vs top-down (negative height) DIB orientation") {
    // encode writes bottom-up (positive height); a top-down file stores
    // rows in display order with negative biHeight — patch one and check
    // the reader flips correctly
    val frames = Seq(Array.tabulate(4 * 2)(k => (k * 10).toByte))
    val good = Avi.encode(4, 2, 10, frames)
    val v0 = Avi.decode(good).get
    assert(v0.frames(0).toSeq == frames(0).toSeq)
    // patch biHeight → -2 AND re-order the stored rows to display order
    val idx = indexOfFourcc(good, "strf")
    val patched = good.clone()
    val hOff = idx + 8 + 8
    java.lang.System.arraycopy(Array[Byte](-2, -1, -1, -1), 0, patched, hOff, 4) // -2 LE
    val frameIdx = indexOfFourcc(patched, "00db")
    val stride = (4 * 3 + 3) & ~3
    val row0 = java.util.Arrays.copyOfRange(patched, frameIdx + 8, frameIdx + 8 + stride)
    val row1 = java.util.Arrays.copyOfRange(patched, frameIdx + 8 + stride, frameIdx + 8 + 2 * stride)
    java.lang.System.arraycopy(row1, 0, patched, frameIdx + 8, stride)
    java.lang.System.arraycopy(row0, 0, patched, frameIdx + 8 + stride, stride)
    val v1 = Avi.decode(patched).get
    assert(v1.height == 2)
    assert(v1.frames(0).toSeq == frames(0).toSeq)
  }

  private def le32Concat(parts: Array[Byte]*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    parts.foreach(bos.write)
    bos.toByteArray
  }

  private def indexOfFourcc(bytes: Array[Byte], cc: String): Int = {
    val pat = cc.getBytes("US-ASCII")
    var i = 0
    while (i + 4 <= bytes.length) {
      if (bytes(i) == pat(0) && bytes(i + 1) == pat(1) && bytes(i + 2) == pat(2) && bytes(i + 3) == pat(3))
        return i
      i += 1
    }
    -1
  }
}
