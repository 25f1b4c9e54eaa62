package graft

import graft.multimodal.{Mp4, Multimodal, Webm}

/** WebM/Matroska container indexing: encode → index round trips, the
  * pinned arithmetic layout constants the DuckDB oracle replays,
  * minimal-VINT + BlockGroup parsing (the wild-Matroska shapes the
  * fixed-width encoder never emits), and the defensive-parse contract.
  */
class WebmSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def samplesOf(sizes: Seq[Int]): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, s) =>
      Array.tabulate(n)(k => ((7 + s * 31 + k) % 256).toByte)
    }

  test("encode → index round-trips sizes, offsets, timing, keyframes") {
    val sizes = Seq(64, 80, 64, 96, 64)
    val bytes = Webm.encode(32, 24, 40, samplesOf(sizes), Seq(0, 3), samplesPerCluster = 2)
    val ix = Webm.index(bytes).getOrElse(fail("index returned None"))
    assert(ix.width == 32 && ix.height == 24)
    assert(ix.timescale == 1000, "1 ms TimestampScale => 1000 ticks/s")
    assert(ix.samples.length == 5)
    ix.samples.zipWithIndex.foreach { case (s, i) =>
      assert(s.sampleNo == i)
      assert(s.chunkNo == i / 2, s"block $i cluster")
      assert(s.size == sizes(i).toLong)
      assert(s.dts == i.toLong * 40)
      assert(s.duration == 40L, "DefaultDuration round-trips in ticks")
      assert(s.keyframe == (i == 0 || i == 3))
      // offsets point at the REAL payload bytes
      val payload = bytes.slice(s.offset.toInt, (s.offset + s.size).toInt)
      assert(payload.toSeq == samplesOf(sizes)(i).toSeq, s"payload $i")
    }
  }

  test("layout constants: header size and per-cluster arithmetic are the pinned formulas") {
    val sizes = Seq(10, 20, 30, 40, 50)
    val bytes = Webm.encode(16, 16, 100, samplesOf(sizes), Seq(0), samplesPerCluster = 2)
    // the first Cluster id starts exactly at HeaderBytes
    assert((bytes(Webm.HeaderBytes) & 0xff) == 0x1f &&
      (bytes(Webm.HeaderBytes + 1) & 0xff) == 0x43, "Cluster id at HeaderBytes")
    val ix = Webm.index(bytes).get
    // block s of cluster f: H + Σ_{g<f}(23 + 13·nf_g + body_g) + 23 +
    // Σ_{within}(13 + size) + 13
    var expected = Webm.HeaderBytes.toLong
    val grouped = sizes.zipWithIndex.grouped(2).toSeq
    val offsets = grouped.flatMap { frag =>
      var p = expected + Webm.ClusterOverhead
      val offs = frag.map { case (sz, _) =>
        val o = p + Webm.BlockOverhead
        p = o + sz
        o
      }
      expected += Webm.ClusterOverhead + frag.map(f => Webm.BlockOverhead + f._1).sum
      offs
    }
    assert(ix.samples.map(_.offset).toSeq == offsets, "closed-form offsets")
    assert(bytes.length.toLong == Webm.HeaderBytes +
      grouped.map(f => Webm.ClusterOverhead + f.map(x => Webm.BlockOverhead + x._1).sum).sum)
  }

  test("encodeLaced: Xiph-laced clusters round-trip with the pinned 36+nf arithmetic") {
    val sizes = Seq(64, 80, 100, 96, 50)
    val bytes = Webm.encodeLaced(32, 24, 40, samplesOf(sizes), Seq(0, 3), samplesPerCluster = 2)
    val ix = Webm.index(bytes).getOrElse(fail("index returned None"))
    assert(ix.samples.length == 5)
    // cluster f of nf frames: 23 cluster head + 9 SimpleBlock head +
    // 4 block head + 1 lace count + (nf-1) size bytes + body
    var fragStart = Webm.HeaderBytes.toLong
    val grouped = sizes.zipWithIndex.grouped(2).toSeq
    val offsets = grouped.flatMap { frag =>
      val nf = frag.length
      var o = fragStart + 36 + nf
      val offs = frag.map { case (sz, _) => val r = o; o += sz; r }
      fragStart += 36 + nf + frag.map(_._1).sum
      offs
    }
    assert(ix.samples.map(_.offset).toSeq == offsets, "laced closed-form offsets")
    assert(bytes.length.toLong == fragStart, "total length closes the arithmetic")
    ix.samples.zipWithIndex.foreach { case (s, i) =>
      assert(s.size == sizes(i).toLong)
      assert(s.dts == i.toLong * 40, "laced frame i at blockTs + i*DefaultDuration")
      // the BLOCK's keyframe (its first frame's verdict) applies to both
      // laced frames: clusters start at samples 0, 2, 4; keys = {0, 3}
      assert(s.keyframe == ((i / 2) * 2 == 0), s"laced keyframe $i")
      val payload = bytes.slice(s.offset.toInt, (s.offset + s.size).toInt)
      assert(payload.toSeq == samplesOf(sizes)(i).toSeq, s"payload $i")
    }
  }

  test("encodeLaced: a ≥255-byte leading frame takes a 255-run size and still round-trips") {
    val sizes = Seq(300, 40)
    val bytes = Webm.encodeLaced(16, 16, 100, samplesOf(sizes), Seq(0), samplesPerCluster = 2)
    val ix = Webm.index(bytes).getOrElse(fail("index returned None"))
    assert(ix.samples.map(_.size).toSeq == Seq(300L, 40L))
    // lace header = count byte + TWO size bytes (255 + 45) for frame 0
    assert(ix.samples.head.offset == Webm.HeaderBytes + 23 + 9 + 4 + 1 + 2)
    val payload0 = bytes.slice(ix.samples.head.offset.toInt,
      (ix.samples.head.offset + 300).toInt)
    assert(payload0.toSeq == samplesOf(sizes).head.toSeq)
  }

  test("syntheticWebm matches the documented generator formulas") {
    for (id <- Seq(0L, 3L, 17L, 40L, 123L)) {
      val ix = Webm.index(Multimodal.syntheticWebm(id)).getOrElse(fail(s"id $id"))
      val n = 1 + (id % 7).toInt
      val delta = 100L + (id % 9) * 10L
      assert(ix.width == 16 * (1 + (id % 8).toInt))
      assert(ix.height == 16 * (1 + ((id / 8) % 8).toInt))
      assert(ix.timescale == 1000L)
      assert(ix.samples.length == n)
      ix.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s.size == 50 + ((id * 13 + i * 7) % 200))
        assert(s.dts == i * delta && s.duration == delta)
        assert(s.keyframe == (i % 3 == 0))
        assert(s.chunkNo == i / 2)
      }
    }
  }

  // --- hand-rolled minimal-VINT encoding: the shapes real muxers emit ---

  private def minVint(v: Long): Array[Byte] = {
    var len = 1
    while (v >= (1L << (7 * len)) - 1) len += 1 // all-ones reserved for unknown
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = v
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out(0) = (out(0) | (0x100 >> len)).toByte
    out
  }

  private def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
    id ++ minVint(payload.length.toLong) ++ payload

  private def uint(id: Array[Byte], v: Long): Array[Byte] = {
    var len = 1
    while (v >= (1L << (8 * len))) len += 1
    el(id, Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte))
  }

  private def idb(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray

  test("minimal-VINT file with BlockGroups: keyframe = no ReferenceBlock; minimal sizes parse") {
    val payloadA = Array.tabulate(12)(_.toByte)
    val payloadB = Array.tabulate(9)(i => (i + 64).toByte)
    def block(payload: Array[Byte], rel: Int): Array[Byte] =
      el(idb(0xa1), Array(0x81.toByte, (rel >> 8).toByte, rel.toByte, 0x00.toByte) ++ payload)
    val groupKey = el(idb(0xa0), block(payloadA, 0)) // no ReferenceBlock → keyframe
    val groupDelta = el(idb(0xa0),
      block(payloadB, 25) ++ el(idb(0xfb), Array((-1 & 0xff).toByte))) // ReferenceBlock → delta frame
    val cluster = el(idb(0x1f, 0x43, 0xb6, 0x75), uint(idb(0xe7), 1000L) ++ groupKey ++ groupDelta)
    val info = el(idb(0x15, 0x49, 0xa9, 0x66), uint(idb(0x2a, 0xd7, 0xb1), 1000000L))
    val video = el(idb(0xe0), uint(idb(0xb0), 640L) ++ uint(idb(0xba), 480L))
    val trackEntry = el(idb(0xae),
      uint(idb(0xd7), 1L) ++ uint(idb(0x83), 1L) ++ video)
    val tracks = el(idb(0x16, 0x54, 0xae, 0x6b), trackEntry)
    val ebml = el(idb(0x1a, 0x45, 0xdf, 0xa3),
      el(idb(0x42, 0x82), "matroska".getBytes("US-ASCII")))
    val segment = el(idb(0x18, 0x53, 0x80, 0x67), info ++ tracks ++ cluster)
    val bytes = ebml ++ segment

    val ix = Webm.index(bytes).getOrElse(fail("minimal-vint file must parse"))
    assert(ix.width == 640 && ix.height == 480 && ix.timescale == 1000)
    assert(ix.samples.length == 2)
    val Seq(a, b) = ix.samples.toSeq
    assert(a.keyframe && !b.keyframe, "BlockGroup keyframe = absence of ReferenceBlock")
    assert(a.dts == 1000L && b.dts == 1025L)
    assert(a.duration == 0L, "no DefaultDuration declared")
    assert(bytes.slice(a.offset.toInt, (a.offset + a.size).toInt).toSeq == payloadA.toSeq)
    assert(bytes.slice(b.offset.toInt, (b.offset + b.size).toInt).toSeq == payloadB.toSeq)
  }

  test("laced SimpleBlocks: Xiph, fixed, and EBML lacing emit one sample per frame") {
    // Xiph: 3 frames of 300, 13, 7 bytes — first two sizes 255-run coded
    val xp = samplesOf(Seq(300, 13, 7))
    val xiph = el(idb(0xa3),
      Array[Byte](0x81.toByte, 0, 0, (0x80 | 0x02).toByte, 2, 0xff.toByte, 45, 13) ++
        xp(0) ++ xp(1) ++ xp(2))
    // fixed: 4 frames, payload divided evenly (4 × 11)
    val fp = samplesOf(Seq(11, 11, 11, 11))
    val fixed = el(idb(0xa3),
      Array[Byte](0x81.toByte, 0, 40, (0x80 | 0x04).toByte, 3) ++ fp.flatten)
    // EBML: 3 frames of 16, 20, 9 — first size a plain VINT (0x90 = 16),
    // then one signed delta (+4 → raw 67 → 0xc3), last = remainder
    val ep = samplesOf(Seq(16, 20, 9))
    val ebmlLaced = el(idb(0xa3),
      Array[Byte](0x81.toByte, 0, 80, 0x06.toByte, 2, 0x90.toByte, 0xc3.toByte) ++
        ep.flatten)
    val cluster = el(idb(0x1f, 0x43, 0xb6, 0x75),
      uint(idb(0xe7), 1000L) ++ xiph ++ fixed ++ ebmlLaced)
    val info = el(idb(0x15, 0x49, 0xa9, 0x66), uint(idb(0x2a, 0xd7, 0xb1), 1000000L))
    val video = el(idb(0xe0), uint(idb(0xb0), 320L) ++ uint(idb(0xba), 240L))
    val trackEntry = el(idb(0xae),
      uint(idb(0xd7), 1L) ++ uint(idb(0x83), 1L) ++
        uint(idb(0x23, 0xe3, 0x83), 40L * 1000000L) ++ video) // DefaultDuration 40 ms
    val tracks = el(idb(0x16, 0x54, 0xae, 0x6b), trackEntry)
    val ebml = el(idb(0x1a, 0x45, 0xdf, 0xa3),
      el(idb(0x42, 0x82), "webm".getBytes("US-ASCII")))
    val segment = el(idb(0x18, 0x53, 0x80, 0x67), info ++ tracks ++ cluster)
    val bytes = ebml ++ segment

    val ix = Webm.index(bytes).getOrElse(fail("laced file must parse"))
    assert(ix.samples.length == 10, s"got ${ix.samples.length} samples")
    assert(ix.samples.map(_.size).toSeq ==
      Seq(300L, 13L, 7L, 11L, 11L, 11L, 11L, 16L, 20L, 9L))
    // payload bytes round-trip exactly through the lace offsets
    ix.samples.zip(xp ++ fp ++ ep).foreach { case (s, p) =>
      assert(bytes.slice(s.offset.toInt, (s.offset + s.size).toInt).toSeq == p.toSeq,
        s"sample ${s.sampleNo} bytes differ")
    }
    // laced timestamps advance by DefaultDuration from the block's time;
    // the block's keyframe verdict covers every laced frame
    assert(ix.samples.map(_.dts).toSeq ==
      Seq(1000L, 1040L, 1080L, 1040L, 1080L, 1120L, 1160L, 1080L, 1120L, 1160L))
    assert(ix.samples.take(7).forall(_.keyframe) && ix.samples.drop(7).forall(!_.keyframe),
      "keyframe bit must cover the whole laced block")
    assert(ix.samples.forall(_.chunkNo == 0))

    // an uneven fixed split is malformed, not mis-sized
    val oddFixed = el(idb(0xa3),
      Array[Byte](0x81.toByte, 0, 0, (0x80 | 0x04).toByte, 2) ++ Array.fill(10)(1.toByte))
    val badCluster = el(idb(0x1f, 0x43, 0xb6, 0x75), uint(idb(0xe7), 0L) ++ oddFixed)
    val bad = ebml ++ el(idb(0x18, 0x53, 0x80, 0x67), info ++ tracks ++ badCluster)
    assert(Webm.index(bad).isEmpty, "3-way split of 10 bytes must reject")

    // fuzz the lacing paths: random mutations never throw
    val rnd = new scala.util.Random(77)
    (0 until 400).foreach { _ =>
      val m = bytes.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Webm.index(m) // may be None or Some; must not throw
    }
  }

  test("unknown-size Segment (live-mux shape) parses to end of file") {
    val good = Webm.encode(16, 16, 50, samplesOf(Seq(30, 40)), Seq(0))
    // rewrite the Segment's 8-byte size VINT to the all-ones unknown marker
    val segSizeAt = 92 + 4
    val mutated = good.clone()
    mutated(segSizeAt) = 0x01.toByte
    for (i <- 1 until 8) mutated(segSizeAt + i) = 0xff.toByte
    val ix = Webm.index(mutated).getOrElse(fail("unknown-size segment must parse"))
    assert(ix.samples.length == 2)
    assert(ix.samples.map(_.size).toSeq == Seq(30L, 40L))
  }

  test("malformed containers return None") {
    assert(Webm.index(null).isEmpty)
    assert(Webm.index(Array.emptyByteArray).isEmpty)
    assert(Webm.index("not a webm at all, just text".getBytes).isEmpty)
    val good = Webm.encode(16, 16, 50, samplesOf(Seq(30, 40)), Seq(0))
    assert(Webm.index(good.take(Webm.HeaderBytes / 2)).isEmpty, "truncated header")
    // wrong DocType: flip "webm" → "webx"
    val docTyped = good.clone()
    val dt = "webm".getBytes("US-ASCII")
    val at = good.indexOfSlice(dt)
    docTyped(at + 3) = 'x'.toByte
    assert(Webm.index(docTyped).isEmpty, "foreign DocType")
    val lacing = good.clone()
    // set lacing bits in the first SimpleBlock's flags byte
    val firstFlags = Webm.HeaderBytes + Webm.ClusterOverhead + Webm.BlockOverhead - 1
    lacing(firstFlags) = (lacing(firstFlags) | 0x06).toByte
    assert(Webm.index(lacing).isEmpty, "laced blocks are unsupported → None")
  }

  test("MP4 and WebM indexes union into one schema (unified Sample/Index types)") {
    val mp4Ix: Option[Mp4.Index] = Mp4.index(Multimodal.syntheticMp4(5L))
    val webmIx: Option[Mp4.Index] = Webm.index(Multimodal.syntheticWebm(5L))
    assert(mp4Ix.isDefined && webmIx.isDefined)
    assert(mp4Ix.get.samples.length == webmIx.get.samples.length,
      "same generator formulas → same frame count")
    assert(mp4Ix.get.width == webmIx.get.width && mp4Ix.get.height == webmIx.get.height)
  }

  // ------------------------------------------------------------------ Cues

  test("encodeWithCues: the pinned 12+58·nc shift, and the full walk skips the table") {
    val sizes = Seq(10, 20, 30, 40, 50)
    val plain = Webm.encode(16, 16, 100, samplesOf(sizes), Seq(0), samplesPerCluster = 2)
    val cued = Webm.encodeWithCues(16, 16, 100, samplesOf(sizes), Seq(0), samplesPerCluster = 2)
    val nc = 3 // ⌈5/2⌉ clusters
    assert(cued.length == plain.length + Webm.cuesBytes(nc), "total length shift")
    // Cues element sits right after the constant header prefix
    assert((cued(Webm.HeaderBytes) & 0xff) == 0x1c && (cued(Webm.HeaderBytes + 1) & 0xff) == 0x53,
      "Cues id at HeaderBytes")
    val pix = Webm.index(plain).get
    val cix = Webm.index(cued).get
    assert(cix.samples.map(s => (s.sampleNo, s.chunkNo, s.size, s.dts, s.keyframe)) ==
      pix.samples.map(s => (s.sampleNo, s.chunkNo, s.size, s.dts, s.keyframe)),
      "Cues are invisible to the full walk")
    assert(cix.samples.map(_.offset) ==
      pix.samples.map(_.offset + Webm.cuesBytes(nc)), "every cluster shifts by the constant")
    // offsets still point at the real payload bytes
    cix.samples.zipWithIndex.foreach { case (s, i) =>
      assert(cued.slice(s.offset.toInt, (s.offset + s.size).toInt).toSeq ==
        samplesOf(sizes)(i).toSeq, s"payload $i")
    }
  }

  /** indexClip(from, to) must equal the full index filtered to
    * [from, to) with sample/chunk numbers renumbered densely from 0.
    */
  private def assertClipEq(bytes: Array[Byte], from: Long, to: Long): Unit = {
    val full = Webm.index(bytes).getOrElse(fail("full index None"))
    val expected = full.samples.filter(s => s.dts >= from && s.dts < to)
    val clip = Webm.indexClip(bytes, from, to)
    if (expected.isEmpty) assert(clip.isEmpty, s"empty clip [$from,$to) must drop")
    else {
      val cs = clip.getOrElse(fail(s"clip [$from,$to) None")).samples
      assert(cs.map(s => (s.offset, s.size, s.dts, s.keyframe)) ==
        expected.map(s => (s.offset, s.size, s.dts, s.keyframe)), s"clip [$from,$to) content")
      assert(cs.map(_.sampleNo) == cs.indices, s"clip [$from,$to) sample_no renumbers")
      // chunk_no renumbers the contributing clusters densely, preserving boundaries
      assert(cs.map(_.chunkNo) ==
        expected.map(_.chunkNo).foldLeft(Vector.empty[Int]) { (acc, c) =>
          if (acc.isEmpty) acc :+ 0
          else acc :+ (acc.last + (if (c == expected(acc.length - 1).chunkNo) 0 else 1))
        }, s"clip [$from,$to) chunk_no renumbers")
    }
  }

  test("indexClip equals the filtered full index — with Cues (seek) and without (linear)") {
    val sizes = Seq(64, 80, 64, 96, 64, 50, 70)
    for (enc <- Seq[Seq[Array[Byte]] => Array[Byte]](
        Webm.encode(32, 24, 100, _, Seq(0, 3), 2),
        Webm.encodeWithCues(32, 24, 100, _, Seq(0, 3), 2),
        Webm.encodeLaced(32, 24, 100, _, Seq(0, 3), 2))) {
      val bytes = enc(samplesOf(sizes))
      for ((from, to) <- Seq((0L, 10000L), (200L, 500L), (150L, 450L), (400L, 401L),
          (650L, 9000L), (700L, 800L), (0L, 0L)))
        assertClipEq(bytes, from, to)
    }
  }

  test("Cues seek starts at the cue-pointed cluster: earlier clusters are never parsed") {
    val sizes = Seq(10, 20, 30, 40, 50, 60)
    val cued = Webm.encodeWithCues(16, 16, 100, samplesOf(sizes), Seq(0), samplesPerCluster = 2)
    // corrupt cluster 0's Timestamp element id (first child of the first
    // cluster, 12 bytes into the cluster element) — the segment-level
    // scan still walks element heads, but parsing cluster 0's CHILDREN
    // now fails
    val mutated = cued.clone()
    val cluster0 = Webm.HeaderBytes + Webm.cuesBytes(3)
    assert((mutated(cluster0) & 0xff) == 0x1f, "cluster 0 where the arithmetic says")
    mutated(cluster0 + 12) = 0x00.toByte
    assert(Webm.index(mutated).isEmpty, "the full walk must parse cluster 0 → None")
    // the clip seeks to the cue for t=400 (cluster 2) and never touches it
    val clip = Webm.indexClip(mutated, 400L, 700L).getOrElse(fail("seek must skip cluster 0"))
    assert(clip.samples.map(_.size) == Seq(50L, 60L))
    assert(clip.samples.map(_.dts) == Seq(400L, 500L))
    assert(clip.samples.map(_.sampleNo) == Seq(0, 1))
  }

  test("a broken Cues table falls back to the linear walk, same results") {
    val sizes = Seq(10, 20, 30, 40, 50, 60)
    val cued = Webm.encodeWithCues(16, 16, 100, samplesOf(sizes), Seq(0), samplesPerCluster = 2)
    val mutated = cued.clone()
    mutated(Webm.HeaderBytes + 12) = 0x00.toByte // first CuePoint id → garbage
    assert(Webm.index(mutated).isDefined, "full walk unaffected (skips Cues by size)")
    assertClipEq(mutated, 400L, 700L)
  }

  test("cluster timestamps past 65535 ticks take the wide element and round-trip exactly") {
    // 2200 frames at 33 ms → last cluster timestamp 71,610 > 0xffff; the
    // 2-byte width would silently truncate (found by the webm_clip probe)
    val n = 2200
    val samples = (0 until n).map(s => Array.tabulate(3)(k => ((s + k) % 256).toByte))
    val wantDts = (0 until n).map(_.toLong * 33)
    for (bytes <- Seq(Webm.encode(16, 16, 33, samples, Seq(0), samplesPerCluster = 30),
        Webm.encodeWithCues(16, 16, 33, samples, Seq(0), samplesPerCluster = 30))) {
      val ix = Webm.index(bytes).getOrElse(fail("long video must index"))
      assert(ix.samples.length == n)
      assert(ix.samples.map(_.dts) == wantDts, "no truncation anywhere")
    }
    val cued = Webm.encodeWithCues(16, 16, 33, samples, Seq(0), samplesPerCluster = 30)
    val clip = Webm.indexClip(cued, 70000L, 71000L).getOrElse(fail("clip in the wide region"))
    assert(clip.samples.map(_.dts) == wantDts.filter(t => t >= 70000L && t < 71000L))
  }

  test("indexClipMs == indexClip under the default ms clock; clipAutoMs dispatches both ways") {
    val cued = Webm.encodeWithCues(16, 16, 100, samplesOf(Seq(10, 20, 30, 40, 50, 60)), Seq(0),
      samplesPerCluster = 2)
    for ((from, to) <- Seq((0L, 9999L), (150L, 450L), (400L, 700L)))
      assert(Webm.indexClipMs(cued, from, to).map(_.samples) ==
        Webm.indexClip(cued, from, to).map(_.samples), s"[$from,$to)")
    // the auto dispatch routes by magic bytes and clips in wall ms
    val mp4 = Multimodal.syntheticMp4(9L)
    assert(Multimodal.clipAutoMs(mp4, 0L, 1000000L).map(_.samples.length) ==
      Mp4.index(mp4).map(_.samples.length), "mp4 route, full window")
    assert(Multimodal.clipAutoMs(cued, 150L, 450L).map(_.samples) ==
      Webm.indexClipMs(cued, 150L, 450L).map(_.samples), "webm route")
    assert(Multimodal.clipAutoMs("not a video".getBytes, 0L, 100L).isEmpty)
  }

  test("syntheticWebmCues: the unlaced twin shifted by the seek table") {
    for (id <- Seq(0L, 3L, 17L, 40L, 123L)) {
      val plain = Webm.index(Multimodal.syntheticWebm(id)).getOrElse(fail(s"id $id"))
      val cued = Webm.index(Multimodal.syntheticWebmCues(id)).getOrElse(fail(s"id $id cues"))
      val n = 1 + (id % 7).toInt
      val shift = Webm.cuesBytes((n + 1) / 2)
      assert(cued.samples.map(_.offset) == plain.samples.map(_.offset + shift), s"id $id shift")
      assert(cued.samples.map(s => (s.sampleNo, s.chunkNo, s.size, s.dts, s.keyframe)) ==
        plain.samples.map(s => (s.sampleNo, s.chunkNo, s.size, s.dts, s.keyframe)), s"id $id")
    }
  }
}
