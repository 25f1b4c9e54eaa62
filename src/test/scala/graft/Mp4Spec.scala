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

  test("fragmented encode → index round-trips sizes, offsets, timing, keyframes") {
    val sizes = Seq(100, 57, 211, 90, 33)
    val bytes = Mp4.encodeFragmented(320, 240, timescale = 1200, delta = 160,
      samples = samplesOf(sizes), keyframes = Seq(0, 3), samplesPerFragment = 2)
    val ix = Mp4.index(bytes).getOrElse(fail("index returned None"))
    assert(ix.width == 320 && ix.height == 240 && ix.timescale == 1200)
    assert(ix.samples.length == 5)
    assert(ix.samples.map(_.size) == sizes.map(_.toLong).toVector)
    assert(ix.samples.map(_.dts) == Vector(0L, 160L, 320L, 480L, 640L))
    assert(ix.samples.forall(_.duration == 160L))
    assert(ix.samples.map(_.keyframe) == Vector(true, false, false, true, false))
    // each moof is one chunk: fragments of 2 → chunks 0,0,1,1,2
    assert(ix.samples.map(_.chunkNo) == Vector(0, 0, 1, 1, 2))
    // offsets point at the actual payload bytes inside each fragment's mdat
    val expected = samplesOf(sizes)
    ix.samples.zipWithIndex.foreach { case (s, i) =>
      val slice = bytes.slice(s.offset.toInt, (s.offset + s.size).toInt)
      assert(slice.sameElements(expected(i)), s"sample $i bytes at offset ${s.offset}")
    }
  }

  test("fragmented defaults chain: trex/tfhd defaults + first-sample-flags") {
    // useDefaults: trun carries sizes only — durations and flags resolve
    // through tfhd's defaults, keyframes through first-sample-flags
    val sizes = Seq(40, 41, 42, 43)
    val bytes = Mp4.encodeFragmented(64, 64, timescale = 600, delta = 100,
      samples = samplesOf(sizes), keyframes = Seq(0), samplesPerFragment = 2,
      useDefaults = true)
    val ix = Mp4.index(bytes).getOrElse(fail("index returned None"))
    assert(ix.samples.map(_.size) == sizes.map(_.toLong).toVector)
    assert(ix.samples.forall(_.duration == 100L), "default-sample-duration applies")
    assert(ix.samples.map(_.keyframe) == Vector(true, false, false, false))
    assert(ix.samples.map(_.dts) == Vector(0L, 100L, 200L, 300L))
    val expected = samplesOf(sizes)
    ix.samples.zipWithIndex.foreach { case (s, i) =>
      assert(bytes.slice(s.offset.toInt, (s.offset + s.size).toInt)
        .sameElements(expected(i)), s"sample $i")
    }
  }

  test("truncated fragment: moof present but mdat cut short stops cleanly") {
    val bytes = Mp4.encodeFragmented(16, 16, 600, 100,
      samplesOf(Seq(64, 64, 64, 64)), Seq(0), samplesPerFragment = 2)
    // cut inside the SECOND fragment's mdat: scanBoxes drops the
    // truncated box pair, leaving the intact first fragment
    val secondMoofAt = {
      var p = 0; var seen = 0; var at = -1
      while (p + 8 <= bytes.length && at < 0) {
        if (new String(bytes, p + 4, 4, "US-ASCII") == "moof") {
          seen += 1; if (seen == 2) at = p
        }
        if (at < 0) p += java.nio.ByteBuffer.wrap(bytes, p, 4).getInt
      }
      at
    }
    val cut = bytes.take(secondMoofAt + 40) // inside the second moof
    val ix = Mp4.index(cut).getOrElse(fail("index returned None"))
    assert(ix.samples.length == 2, "only the intact first fragment indexes")
    assert(ix.samples.map(_.chunkNo) == Vector(0, 0))
    // a trun whose declared count exceeds its box is rejected, not mis-read
    val bad = bytes.clone()
    // find first trun inside first moof and bump its count high
    var p = 0
    var trunAt = -1
    def walk(from: Int, until: Int): Unit = {
      var q = from
      while (q + 8 <= until && trunAt < 0) {
        val size = java.nio.ByteBuffer.wrap(bad, q, 4).getInt
        val t = new String(bad, q + 4, 4, "US-ASCII")
        if (t == "trun") trunAt = q
        else if (Set("moof", "traf").contains(t)) walk(q + 8, q + size)
        if (trunAt < 0) q += size
      }
    }
    walk(0, bad.length)
    assert(trunAt >= 0)
    bad(trunAt + 12) = 0x80.toByte // sample_count high bit
    assert(Mp4.index(bad).isEmpty)
  }

  test("progressive head + appended fragments index as one track") {
    // a progressive file with fragments appended after it: sample
    // numbering, chunks, and the decode clock continue
    val prog = Mp4.encode(32, 32, 600, 100, samplesOf(Seq(30, 31)), Seq(0),
      samplesPerChunk = 2)
    val frag = Mp4.encodeFragmented(32, 32, 600, 100, samplesOf(Seq(32, 33)), Seq.empty,
      samplesPerFragment = 2)
    // splice: progressive file + the fragmented file's moof+mdat tail
    val fragMoofAt = {
      var p = 0; var at = -1
      while (p + 8 <= frag.length && at < 0) {
        if (new String(frag, p + 4, 4, "US-ASCII") == "moof") at = p
        else p += java.nio.ByteBuffer.wrap(frag, p, 4).getInt
      }
      at
    }
    val spliced = prog ++ frag.drop(fragMoofAt)
    val ix = Mp4.index(spliced).getOrElse(fail("index returned None"))
    assert(ix.samples.length == 4)
    assert(ix.samples.map(_.sampleNo) == Vector(0, 1, 2, 3))
    assert(ix.samples.map(_.chunkNo) == Vector(0, 0, 1, 1))
    // tfdt is an ABSOLUTE decode clock and this spliced fixture's
    // fragment declares base 0 — the parser honors the declaration
    // rather than inventing continuity
    assert(ix.samples.map(_.dts) == Vector(0L, 100L, 0L, 100L))
    // fragment offsets are moof-relative (default-base-is-moof): they
    // survive the splice shifting every fragment byte position
    val expected = samplesOf(Seq(30, 31)) ++ samplesOf(Seq(32, 33)).drop(2)
    ix.samples.take(2).zipWithIndex.foreach { case (s, i) =>
      assert(spliced.slice(s.offset.toInt, (s.offset + s.size).toInt)
        .sameElements(samplesOf(Seq(30, 31))(i)))
    }
  }

  test("syntheticFragMp4 arithmetic: constant 625-byte header + per-fragment layout") {
    for (id <- Seq(0L, 1L, 7L, 12L, 63L, 499L)) {
      val bytes = Multimodal.syntheticFragMp4(id)
      val ix = Mp4.index(bytes).getOrElse(fail(s"id $id"))
      val n = 1 + (id % 7).toInt
      assert(ix.samples.length == n, s"id $id sample count")
      assert(ix.width == 16 * (1 + (id % 8).toInt))
      assert(ix.height == 16 * (1 + ((id / 8) % 8).toInt))
      assert(ix.timescale == 600L * (1 + id % 4))
      def size(s: Int): Long = 50 + (id * 13 + s * 7) % 200
      var fragStart = 625L // ftyp + empty-table moov: all fixed-size boxes
      var s = 0
      while (s < n) {
        val nf = math.min(2, n - s)
        val moofLen = 88L + 12L * nf
        var off = fragStart + moofLen + 8L
        (0 until nf).foreach { j =>
          val smp = ix.samples(s + j)
          assert(smp.offset == off, s"id $id sample ${s + j} offset")
          assert(smp.size == size(s + j))
          assert(smp.duration == 100L + (id % 9) * 10L)
          assert(smp.dts == (s + j).toLong * smp.duration)
          assert(smp.keyframe == ((s + j) % 3 == 0))
          assert(smp.chunkNo == s / 2)
          off += smp.size
        }
        fragStart = off
        s += nf
      }
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

  test("clipMs filters by wall ms and renumbers within the clip; offsets untouched") {
    val sizes = Seq(100, 57, 211, 90, 33, 40)
    val bytes = Mp4.encode(320, 240, timescale = 1200, delta = 160,
      samples = samplesOf(sizes), keyframes = Seq(0, 3), samplesPerChunk = 2)
    val ix = Mp4.index(bytes).get
    // time_ms = s·160·1000/1200 = 0,133,266,400,533,666 → [400,700) picks 3,4,5
    val clip = Mp4.clipMs(ix, 400L, 700L).getOrElse(fail("clip empty"))
    assert(clip.samples.map(_.size) == Vector(90L, 33L, 40L))
    assert(clip.samples.map(_.sampleNo) == Vector(0, 1, 2))
    assert(clip.samples.map(_.chunkNo) == Vector(0, 1, 1), "chunks 1,2,2 renumber densely")
    assert(clip.samples.map(_.offset) == ix.samples.drop(3).map(_.offset),
      "offsets still point at the same payload bytes")
    assert(Mp4.clipMs(ix, 5000L, 6000L).isEmpty, "empty window drops")
  }

  test("64-bit largesize and size==0 box headers parse (the >4GB / live-capture shapes)") {
    val sizes = Seq(100, 57, 211, 90, 33)
    val bytes = Mp4.encode(320, 240, timescale = 1200, delta = 160,
      samples = samplesOf(sizes), keyframes = Seq(0, 3), samplesPerChunk = 2)
    val want = Mp4.index(bytes).get
    val moovAt = bytes.indexOfSlice("moov".getBytes("US-ASCII")) - 4
    val moovSize = java.nio.ByteBuffer.wrap(bytes, moovAt, 4).getInt

    // moov is the LAST box, so reframing it moves no sample offset.
    // largesize: size field 1, 64-bit size after the type (8 bytes wider)
    val big = java.nio.ByteBuffer.allocate(bytes.length + 8)
    big.put(bytes, 0, moovAt)
    big.putInt(1).put("moov".getBytes("US-ASCII")).putLong(moovSize.toLong + 8)
    big.put(bytes, moovAt + 8, bytes.length - moovAt - 8)
    val large = Mp4.index(big.array()).getOrElse(fail("largesize moov must parse"))
    assert(large.samples == want.samples && large.width == want.width)

    // size == 0: the box runs to the end of the file
    val zero = bytes.clone()
    java.nio.ByteBuffer.wrap(zero, moovAt, 4).putInt(0)
    val toEof = Mp4.index(zero).getOrElse(fail("size==0 moov must parse"))
    assert(toEof.samples == want.samples && toEof.width == want.width)

    // a lying largesize (past the file) stops cleanly: no moov → None
    val lying = big.array().clone()
    java.nio.ByteBuffer.wrap(lying, moovAt + 8, 8).putLong(Long.MaxValue)
    assert(Mp4.index(lying).isEmpty)
  }
}
