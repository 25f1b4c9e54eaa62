package graft

import graft.multimodal.{Mp4, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** MP4 sample-table laws: encode→index round-trips every byte range and
  * timestamp, offsets point at the actual payload bytes, and malformed
  * containers are rejected (not mis-parsed).
  */
class Mp4Spec extends AnyFunSuite {

  private def samplesOf(sizes: Seq[Int], seed: Int = 7): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, s) =>
      Array.tabulate(n)(k => ((seed + s * 31 + k) % 256).toByte)
    }

  test("encode → index round-trips sizes, offsets, timing, keyframes") {
    val sizes = Seq(100, 57, 211, 90, 33)
    val bytes = Mp4.encode(320, 240, timescale = 1200, delta = 160,
      samples = samplesOf(sizes), keyframes = Seq(0, 3), samplesPerChunk = 2)
    val ix = Mp4.index(bytes).getOrElse(fail("index returned None"))
    assert(ix.width == 320 && ix.height == 240 && ix.timescale == 1200)
    assert(ix.samples.length == 5)
    assert(ix.samples.map(_.size) == sizes.map(_.toLong).toVector)
    assert(ix.samples.map(_.dts) == Vector(0L, 160L, 320L, 480L, 640L))
    assert(ix.samples.forall(_.duration == 160L))
    assert(ix.samples.map(_.keyframe) == Vector(true, false, false, true, false))
    assert(ix.samples.map(_.chunkNo) == Vector(0, 0, 1, 1, 2))
    assert(ix.durationMs == 5L * 160L * 1000L / 1200L)
    // offsets point at the actual payload bytes in mdat
    val expected = samplesOf(sizes)
    ix.samples.zipWithIndex.foreach { case (s, i) =>
      val slice = bytes.slice(s.offset.toInt, (s.offset + s.size).toInt)
      assert(slice.sameElements(expected(i)), s"sample $i bytes at offset ${s.offset}")
    }
  }

  test("single sample, no stss box (encoder emits stss only when asked)") {
    val bytes = Mp4.encode(16, 16, timescale = 600, delta = 100,
      samples = samplesOf(Seq(64)), keyframes = Seq.empty)
    val ix = Mp4.index(bytes).getOrElse(fail("index returned None"))
    assert(ix.samples.length == 1)
    assert(ix.samples.head.keyframe, "absent stss means every sample is sync")
    assert(ix.samples.head.offset == 32L, "24-byte ftyp + 8-byte mdat header")
  }

  test("malformed containers return None") {
    assert(Mp4.index(null).isEmpty)
    assert(Mp4.index(Array.emptyByteArray).isEmpty)
    assert(Mp4.index("not an mp4 container at all".getBytes).isEmpty)
    val good = Mp4.encode(16, 16, 600, 100, samplesOf(Seq(64, 64)), Seq(0))
    assert(Mp4.index(good.take(40)).isEmpty, "truncated before moov")
    // corrupt the moov size field of a valid file
    val bad = good.clone()
    val moovAt = {
      var p = 0; var at = -1
      while (p + 8 <= bad.length && at < 0) {
        if (new String(bad, p + 4, 4, "US-ASCII") == "moov") at = p
        else p += java.nio.ByteBuffer.wrap(bad, p, 4).getInt
      }
      at
    }
    bad(moovAt + 3) = 9 // size no longer fits the buffer
    assert(Mp4.index(bad).isEmpty)
  }

  test("table counts with the high bit set or exceeding the box return None, not a crash") {
    val good = Mp4.encode(16, 16, 600, 100, samplesOf(Seq(64, 64, 64)), Seq(0))
    def boxAt(tpe: String): Int = {
      // depth-first scan for the first box of the given type
      def scan(from: Int, until: Int): Int = {
        var p = from
        while (p + 8 <= until) {
          val size = java.nio.ByteBuffer.wrap(good, p, 4).getInt
          val t = new String(good, p + 4, 4, "US-ASCII")
          if (t == tpe) return p
          if (Set("moov", "trak", "mdia", "minf", "stbl").contains(t)) {
            val inner = scan(p + 8, p + size)
            if (inner >= 0) return inner
          }
          p += size
        }
        -1
      }
      scan(0, good.length)
    }
    // each corruption targets one table's entry-count field (payload
    // starts at box+8, count position per table layout)
    val cases = Seq(
      ("stco", 12), // count at payload+4
      ("stsc", 12),
      ("stts", 12),
      ("stss", 12),
      ("stsz", 16)) // count at payload+8
    cases.foreach { case (tpe, countOff) =>
      val at = boxAt(tpe)
      assert(at >= 0, s"$tpe present in fixture")
      // high bit set: would go negative via .toInt pre-fix (NegativeArraySizeException)
      val neg = good.clone()
      neg(at + countOff) = 0x80.toByte
      assert(Mp4.index(neg).isEmpty, s"$tpe high-bit count")
      // plausible-but-oversized count: entries would read past the box end
      val big = good.clone()
      big(at + countOff + 2) = 0x10.toByte // count += 4096
      assert(Mp4.index(big).isEmpty, s"$tpe oversized count")
    }
  }

  test("syntheticMp4 arithmetic matches the documented formulas") {
    for (id <- Seq(0L, 1L, 7L, 12L, 63L, 499L)) {
      val ix = Mp4.index(Multimodal.syntheticMp4(id)).getOrElse(fail(s"id $id"))
      val n = 1 + (id % 7).toInt
      assert(ix.samples.length == n, s"id $id sample count")
      assert(ix.width == 16 * (1 + (id % 8).toInt))
      assert(ix.height == 16 * (1 + ((id / 8) % 8).toInt))
      assert(ix.timescale == 600L * (1 + id % 4))
      var off = 32L
      ix.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s.size == 50 + (id * 13 + i * 7) % 200, s"id $id sample $i size")
        assert(s.offset == off, s"id $id sample $i offset")
        assert(s.duration == 100L + (id % 9) * 10L)
        assert(s.keyframe == (i % 3 == 0))
        off += s.size
      }
    }
  }
}
