package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal, dependency-free WebM/Matroska (EBML) container codec for
  * frame INDEXING — not frame decoding; the [[Mp4]] pattern applied to
  * the web's OTHER dominant video container. Web-crawled video is
  * MP4 + WebM; Matroska's public EBML structure (RFC 8794 EBML framing,
  * the public Matroska element registry) exposes per-frame byte ranges,
  * timestamps, and keyframe flags as pure arithmetic: `Segment → Tracks`
  * declares the video track (dimensions, default frame duration),
  * `Segment → Cluster → SimpleBlock/BlockGroup` carries one frame per
  * block with a cluster-relative timestamp and a keyframe bit. That
  * index is what a 100 TB video-curation pass needs first — duration /
  * fps / keyframe-density stats, clip boundary planning, byte-range
  * extraction for downstream GPU decoders — all scan-local per row.
  *
  * Write side emits a valid one-video-track WebM whose block payloads
  * are opaque bytes, with FIXED-WIDTH EBML encodings throughout (EBML
  * explicitly allows longer-than-minimal VINTs): every element size is
  * an 8-byte VINT and every integer value a fixed width, so the whole
  * byte layout is closed-form arithmetic a SQL oracle can replay —
  * the header is a constant [[HeaderBytes]] bytes and each cluster of
  * nf blocks costs `23 + 13·nf + Σ payload` (WebmSpec pins both).
  * Results share [[Mp4.Index]]/[[Mp4.Sample]] so MP4 and WebM corpora
  * index into ONE unified schema. Parsing is defensive: minimal or
  * fixed-width VINTs, unknown-size Segments, Block-in-BlockGroup, all
  * three lacing modes (Xiph / fixed / EBML — one Sample per laced
  * frame), and anything malformed returns None (media pipelines drop
  * and count undecodable rows — same contract as [[Mp4.index]]).
  */
object Webm {

  // ------------------------------------------------------------ EBML ids
  private val IdEbml = Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte)
  private val IdSegment = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte)
  private val IdInfo = Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte)
  private val IdTracks = Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte)
  private val IdCluster = Array(0x1f, 0x43, 0xb6, 0x75).map(_.toByte)

  private val EbmlL: Long = 0x1a45dfa3L
  private val SegmentL: Long = 0x18538067L
  private val InfoL: Long = 0x1549a966L
  private val TracksL: Long = 0x1654ae6bL
  private val ClusterL: Long = 0x1f43b675L
  private val TimestampScaleL: Long = 0x2ad7b1L
  private val TrackEntryL: Long = 0xaeL
  private val TrackNumberL: Long = 0xd7L
  private val TrackTypeL: Long = 0x83L
  private val DefaultDurationL: Long = 0x23e383L
  private val VideoL: Long = 0xe0L
  private val PixelWidthL: Long = 0xb0L
  private val PixelHeightL: Long = 0xbaL
  private val TimestampL: Long = 0xe7L
  private val SimpleBlockL: Long = 0xa3L
  private val BlockGroupL: Long = 0xa0L
  private val BlockL: Long = 0xa1L
  private val ReferenceBlockL: Long = 0xfbL
  private val IdCues = Array(0x1c, 0x53, 0xbb, 0x6b).map(_.toByte)
  private val CuesL: Long = 0x1c53bb6bL
  private val CuePointL: Long = 0xbbL
  private val CueTimeL: Long = 0xb3L
  private val CueTrackPositionsL: Long = 0xb7L
  private val CueTrackL: Long = 0xf7L
  private val CueClusterPositionL: Long = 0xf1L

  /** Constant byte length of the encoder's `EBML header + Segment header
    * + Info + Tracks` prefix — everything before the first Cluster.
    * Closed-form from the fixed-width encodings; WebmSpec pins it
    * against real encoder output.
    */
  val HeaderBytes: Int = 92 + 12 + 27 + 112

  /** Per-cluster overhead before payload bytes: Cluster id+size (12) +
    * Timestamp element (11); each block adds [[BlockOverhead]] + payload.
    */
  val ClusterOverhead: Int = 23

  /** SimpleBlock id (1) + 8-byte size VINT + track VINT (1) + int16
    * relative timestamp (2) + flags (1).
    */
  val BlockOverhead: Int = 13

  /** Byte length of the Cues element [[encodeWithCues]] emits for
    * `nClusters` clusters: Cues id (4) + 8-byte size VINT + one 58-byte
    * CuePoint per cluster (CueTime 13 + CueTrackPositions 36 behind a
    * 9-byte point head) — fixed-width encodings throughout, so seek-table
    * offsets stay closed-form arithmetic (WebmSpec pins it).
    */
  def cuesBytes(nClusters: Int): Int = 12 + 58 * nClusters

  // ---------------------------------------------------------------- write

  /** 8-byte VINT: leading 0x01 marker + 7 payload bytes (values to
    * 2^56-2). Non-minimal on purpose — fixed widths make the layout
    * arithmetic.
    */
  private def vint8(v: Long): Array[Byte] = {
    require(v >= 0 && v < (1L << 56) - 1, s"vint8 out of range: $v")
    val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
    b.putLong(v).array().updated(0, 0x01.toByte)
  }

  private def elem(id: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(id); out.write(vint8(payload.length.toLong)); out.write(payload)
    out.toByteArray
  }

  private def id1(v: Int): Array[Byte] = Array(v.toByte)
  private def id2(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def id3(v: Int): Array[Byte] = Array((v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** Unsigned-integer element with a FIXED value width. */
  private def uintElem(id: Array[Byte], v: Long, width: Int): Array[Byte] = {
    require(width == 8 || (v >>> (8 * width)) == 0,
      s"uintElem: value $v does not fit $width bytes")
    val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
    b.putLong(v)
    elem(id, b.array().takeRight(width))
  }

  /** Cluster Timestamp element: the pinned 2-byte width while the value
    * fits (every oracle-replayed synthetic does — [[ClusterOverhead]]
    * stays 23), 8 bytes past 65 535 ticks so videos longer than ~65 s
    * encode their real timestamps instead of silently truncating (found
    * by the webm_clip scale probe's 6-minute fixtures).
    */
  private def tsElem(clusterTs: Long): Array[Byte] =
    uintElem(id1(0xe7), clusterTs, if (clusterTs <= 0xffffL) 2 else 8)

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** Encode a one-video-track WebM: blocks of `samplesPerCluster` frames
    * per Cluster, cluster Timestamp = its first frame's time, SimpleBlock
    * relative timestamps, keyframe bit 0x80 on `keyframes` (0-based frame
    * numbers). `delta` is the per-frame duration in MILLISECONDS (the
    * Matroska default clock: TimestampScale = 1,000,000 ns); payload
    * bytes are caller-provided opaque data.
    */
  def encode(
      width: Int,
      height: Int,
      delta: Long,
      samples: Seq[Array[Byte]],
      keyframes: Seq[Int],
      samplesPerCluster: Int = 2): Array[Byte] = {
    require(width > 0 && height > 0, "encode: non-positive dimensions")
    require(delta > 0, "encode: non-positive frame duration")
    require(samples.nonEmpty, "encode: need at least one sample")
    require(samplesPerCluster >= 1, "encode: samplesPerCluster < 1")
    val keys = keyframes.toSet

    val (ebmlHeader, info, tracks) = headerParts(width, height, delta)
    val clusters = buildClusters(delta, samples, keys, samplesPerCluster).map(_._1)

    val segmentPayload = concat(info +: tracks +: clusters: _*)
    concat(ebmlHeader, IdSegment, vint8(segmentPayload.length.toLong), segmentPayload)
  }

  /** The unlaced cluster sequence shared by [[encode]] and
    * [[encodeWithCues]]: (cluster bytes, cluster timestamp) per group of
    * `samplesPerCluster` frames.
    */
  private def buildClusters(delta: Long, samples: Seq[Array[Byte]], keys: Set[Int],
      samplesPerCluster: Int): Seq[(Array[Byte], Long)] =
    samples.zipWithIndex.grouped(samplesPerCluster).map { frag =>
      val clusterTs = frag.head._2.toLong * delta
      val blocks = frag.map { case (payload, s) =>
        val rel = s.toLong * delta - clusterTs
        require(rel >= 0 && rel <= Short.MaxValue, s"relative timestamp $rel out of int16")
        val head = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        head.put(0x81.toByte) // track number 1 as minimal VINT
        head.putShort(rel.toShort)
        head.put((if (keys.contains(s)) 0x80 else 0x00).toByte) // flags: keyframe, no lacing
        elem(id1(0xa3), concat(head.array(), payload)) // SimpleBlock
      }
      (elem(IdCluster, concat(tsElem(clusterTs) +: blocks: _*)), clusterTs)
    }.toSeq

  /** [[encode]] plus a Cues seek table — the element real muxers write so
    * a player (or a clip-extraction pass) can jump to the cluster covering
    * a time without walking every preceding cluster. One CuePoint per
    * cluster: CueTime = the cluster's timestamp, CueTrackPositions →
    * CueTrack 1 + CueClusterPosition = the Cluster element's byte offset
    * RELATIVE TO THE SEGMENT PAYLOAD START (Matroska's convention). Cues
    * sits between Tracks and the first Cluster, so every cluster shifts by
    * the constant [[cuesBytes]](nClusters) relative to [[encode]]'s layout
    * — still closed-form for the oracle. [[index]] ignores the element
    * (full walks don't need it); [[indexClip]] seeks with it.
    */
  def encodeWithCues(
      width: Int,
      height: Int,
      delta: Long,
      samples: Seq[Array[Byte]],
      keyframes: Seq[Int],
      samplesPerCluster: Int = 2): Array[Byte] = {
    require(width > 0 && height > 0, "encodeWithCues: non-positive dimensions")
    require(delta > 0, "encodeWithCues: non-positive frame duration")
    require(samples.nonEmpty, "encodeWithCues: need at least one sample")
    require(samplesPerCluster >= 1, "encodeWithCues: samplesPerCluster < 1")
    val keys = keyframes.toSet

    val (ebmlHeader, info, tracks) = headerParts(width, height, delta)
    val clusters = buildClusters(delta, samples, keys, samplesPerCluster)

    // segment-relative cluster positions: info + tracks + cues precede
    val base = info.length + tracks.length + cuesBytes(clusters.length)
    val positions = clusters.map(_._1.length.toLong)
      .scanLeft(base.toLong)(_ + _).dropRight(1)
    val points = clusters.zip(positions).map { case ((_, ts), pos) =>
      elem(id1(0xbb), concat( // CuePoint
        uintElem(id1(0xb3), ts, 4), // CueTime
        elem(id1(0xb7), concat( // CueTrackPositions
          uintElem(id1(0xf7), 1, 1), // CueTrack
          uintElem(id1(0xf1), pos, 8))))) // CueClusterPosition
    }
    val cues = elem(IdCues, concat(points: _*))
    require(cues.length == cuesBytes(clusters.length),
      s"cues layout drifted: ${cues.length} != ${cuesBytes(clusters.length)}")

    val segmentPayload = concat(info +: tracks +: cues +: clusters.map(_._1): _*)
    concat(ebmlHeader, IdSegment, vint8(segmentPayload.length.toLong), segmentPayload)
  }

  /** [[encode]] with XIPH LACING: all `samplesPerCluster` frames of a
    * cluster packed behind ONE SimpleBlock (the audio/all-key shape the
    * lacing feature exists for). Block timestamp = the first frame's
    * time; readers recover frame i's time as blockTs + i·DefaultDuration
    * and apply the block's keyframe flag (taken here from the cluster's
    * FIRST frame) to every laced frame — Matroska lacing semantics, the
    * exact contract [[index]] implements. Lace header: count byte
    * (nf−1), then the first nf−1 sizes as 255-run sums.
    */
  def encodeLaced(
      width: Int,
      height: Int,
      delta: Long,
      samples: Seq[Array[Byte]],
      keyframes: Seq[Int],
      samplesPerCluster: Int = 2): Array[Byte] = {
    require(width > 0 && height > 0, "encodeLaced: non-positive dimensions")
    require(delta > 0, "encodeLaced: non-positive frame duration")
    require(samples.nonEmpty, "encodeLaced: need at least one sample")
    require(samplesPerCluster >= 1 && samplesPerCluster <= 256,
      s"encodeLaced: samplesPerCluster $samplesPerCluster outside 1..256 (count byte)")
    val keys = keyframes.toSet

    val (ebmlHeader, info, tracks) = headerParts(width, height, delta)

    val clusters = samples.zipWithIndex.grouped(samplesPerCluster).map { frag =>
      val clusterTs = frag.head._2.toLong * delta
      val head = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      head.put(0x81.toByte) // track number 1 as minimal VINT
      head.putShort(0.toShort) // block ts = cluster ts (first frame)
      // flags: first frame's keyframe bit + Xiph lacing (bits 1-2 = 01)
      head.put(((if (keys.contains(frag.head._2)) 0x80 else 0x00) | 0x02).toByte)
      val lace = new ByteArrayOutputStream()
      lace.write(frag.length - 1)
      frag.dropRight(1).foreach { case (payload, _) =>
        var s = payload.length
        while (s >= 255) { lace.write(255); s -= 255 }
        lace.write(s)
      }
      val block = elem(id1(0xa3),
        concat(head.array() +: lace.toByteArray +: frag.map(_._1): _*))
      elem(IdCluster, concat(tsElem(clusterTs), block))
    }.toSeq

    val segmentPayload = concat(info +: tracks +: clusters: _*)
    concat(ebmlHeader, IdSegment, vint8(segmentPayload.length.toLong), segmentPayload)
  }

  /** The fixed 243-byte prelude shared by [[encode]] and [[encodeLaced]]:
    * EBML header, segment Info (millisecond TimestampScale), one VP8
    * video TrackEntry with DefaultDuration = `delta` ms.
    */
  private def headerParts(width: Int, height: Int,
      delta: Long): (Array[Byte], Array[Byte], Array[Byte]) = {
    val ebmlHeader = elem(IdEbml, concat(
      uintElem(id2(0x4286), 1, 1), // EBMLVersion
      uintElem(id2(0x42f7), 1, 1), // EBMLReadVersion
      uintElem(id2(0x42f2), 4, 1), // EBMLMaxIDLength
      uintElem(id2(0x42f3), 8, 1), // EBMLMaxSizeLength
      elem(id2(0x4282), "webm".getBytes("US-ASCII")), // DocType
      uintElem(id2(0x4287), 2, 1), // DocTypeVersion
      uintElem(id2(0x4285), 2, 1))) // DocTypeReadVersion

    val info = elem(IdInfo,
      uintElem(id3(0x2ad7b1), 1000000L, 4)) // TimestampScale: 1 ms ticks

    val trackEntry = elem(id1(0xae), concat(
      uintElem(id1(0xd7), 1, 1), // TrackNumber
      uintElem(id2(0x73c5), 1, 1), // TrackUID
      uintElem(id1(0x83), 1, 1), // TrackType: video
      elem(id1(0x86), "V_VP8".getBytes("US-ASCII")), // CodecID
      uintElem(id3(0x23e383), delta * 1000000L, 4), // DefaultDuration (ns)
      elem(id1(0xe0), concat( // Video
        uintElem(id1(0xb0), width.toLong, 2), // PixelWidth
        uintElem(id1(0xba), height.toLong, 2))))) // PixelHeight
    val tracks = elem(IdTracks, trackEntry)
    (ebmlHeader, info, tracks)
  }

  // ----------------------------------------------------------------- read

  /** Parsed EBML element: id value, payload byte range; end == -1 marks
    * unknown size (only tolerated where the walk can bound it).
    */
  private final case class El(id: Long, start: Int, end: Int)

  /** Read one VINT id at `p` (marker kept — ids compare against the full
    * class value). Returns (idValue, bytesConsumed) or null on malformed.
    */
  private def readId(b: Array[Byte], p: Int, until: Int): (Long, Int) = {
    if (p >= until) return null
    val first = b(p) & 0xff
    if (first == 0) return null
    val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8 for 8-bit values
    if (len < 1 || len > 4 || p + len > until) return null
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    (v, len)
  }

  /** Read one VINT size at `p` (marker stripped). Returns
    * (value, bytesConsumed) with value == -1 for the all-ones "unknown
    * size", or null on malformed.
    */
  private def readSize(b: Array[Byte], p: Int, until: Int): (Long, Int) = {
    if (p >= until) return null
    val first = b(p) & 0xff
    if (first == 0) return null
    val len = Integer.numberOfLeadingZeros(first) - 23
    if (len < 1 || len > 8 || p + len > until) return null
    var v = (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    val allOnes = (1L << (7 * len)) - 1
    (if (v == allOnes) -1L else v, len)
  }

  /** Scan the children of [from, until); unknown-size children other than
    * the ones `allowUnknown` admits abort the scan (null).
    */
  private def scanChildren(b: Array[Byte], from: Int, until: Int,
      allowUnknownFor: Long => Boolean): Vector[El] = {
    val out = Vector.newBuilder[El]
    var p = from
    while (p < until) {
      val id = readId(b, p, until)
      if (id == null) return null
      val sz = readSize(b, p + id._2, until)
      if (sz == null) return null
      val start = p + id._2 + sz._2
      if (sz._1 == -1L) {
        if (!allowUnknownFor(id._1)) return null
        // unknown size: element runs to the end of the enclosing range
        out += El(id._1, start, until)
        return out.result()
      }
      if (sz._1 > until - start) return null // truncated/lying size
      out += El(id._1, start, start + sz._1.toInt)
      p = start + sz._1.toInt
    }
    out.result()
  }

  private def uintOf(b: Array[Byte], el: El): Long = {
    var v = 0L
    var i = el.start
    val n = el.end - el.start
    if (n > 8) return -1L
    while (i < el.end) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** Hard cap on indexed blocks — same DoS hygiene as
    * [[Mp4]]'s table-count validation.
    */
  private val MaxBlocks = 10000000

  /** Signed lace-delta VINT (EBML lacing): unsigned VINT minus the
    * per-width bias `2^(7·len-1) - 1`. No unknown-size mapping — every
    * bit pattern is a value here.
    */
  private def readLaceDelta(b: Array[Byte], p: Int, until: Int): (Long, Int) = {
    if (p >= until) return null
    val first = b(p) & 0xff
    if (first == 0) return null
    val len = Integer.numberOfLeadingZeros(first) - 23
    if (len < 1 || len > 8 || p + len > until) return null
    var v = (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    (v - ((1L << (7 * len - 1)) - 1), len)
  }

  /** Decode a block's lace header at [from, until): per-frame
    * (offset, size) pairs. `lacing` is the flag field's bits 1-2:
    * 1 = Xiph (255-run byte sums for the first n-1 sizes), 2 = fixed
    * (payload divided evenly), 3 = EBML (first size a plain VINT, then
    * signed-VINT deltas). The last frame's size is always the remainder
    * (fixed: the even share). Returns None for any malformed header,
    * size overrun, or uneven fixed split — the whole block (and file)
    * is then rejected, per the defensive-parse contract.
    */
  private def laceFrames(b: Array[Byte], from: Int, until: Int,
      lacing: Int): Option[Vector[(Long, Long)]] = {
    if (from >= until) return None
    val n = (b(from) & 0xff) + 1
    var q = from + 1
    val sizes = new Array[Long](n)
    lacing match {
      case 1 =>
        var i = 0
        while (i < n - 1) {
          var s = 0L
          var last = 0xff
          while (last == 0xff) {
            if (q >= until) return None
            last = b(q) & 0xff; q += 1; s += last
            if (s > until - from) return None // size can't exceed the block
          }
          sizes(i) = s; i += 1
        }
      case 2 =>
        val total = (until - q).toLong
        if (total % n != 0) return None
        var i = 0
        while (i < n) { sizes(i) = total / n; i += 1 }
      case 3 =>
        if (n > 1) {
          val fst = readSize(b, q, until)
          if (fst == null || fst._1 < 0) return None
          sizes(0) = fst._1
          q += fst._2
          var i = 1
          while (i < n - 1) {
            val d = readLaceDelta(b, q, until)
            if (d == null) return None
            sizes(i) = sizes(i - 1) + d._1
            if (sizes(i) < 0 || sizes(i) > until - from) return None
            q += d._2; i += 1
          }
        }
      case _ => return None
    }
    if (lacing != 2) {
      var declared = 0L
      var i = 0
      while (i < n - 1) { declared += sizes(i); i += 1 }
      val lastSz = (until - q).toLong - declared
      if (lastSz < 0) return None
      sizes(n - 1) = lastSz
    }
    val out = Vector.newBuilder[(Long, Long)]
    var off = q.toLong
    var i = 0
    while (i < n) {
      if (off + sizes(i) > until) return None
      out += ((off, sizes(i)))
      off += sizes(i); i += 1
    }
    Some(out.result())
  }

  /** Everything [[index]] and [[indexClip]] need before touching a
    * cluster: the Segment element, its scanned children, the derived
    * tick rate, and the first video track's constants.
    */
  private final case class Header(segment: El, kids: Vector[El], timescale: Long,
      trackNum: Long, w: Int, h: Int, defDurTicks: Long)

  /** EBML identity check + Segment scan + Info/Tracks parse — null on
    * anything malformed (internal null-on-fail style of the scanners).
    */
  private def parseHeader(bytes: Array[Byte]): Header = {
    if (bytes == null || bytes.length < 16) return null
    val top = scanChildren(bytes, 0, bytes.length, allowUnknownFor = _ == SegmentL)
    if (top == null) return null
    val ebml = top.find(_.id == EbmlL).getOrElse(return null)
    // DocType must say matroska/webm when present (defensive identity)
    val ebmlKids = scanChildren(bytes, ebml.start, ebml.end, _ => false)
    if (ebmlKids == null) return null
    ebmlKids.find(_.id == 0x4282L).foreach { dt =>
      val s = new String(bytes, dt.start, dt.end - dt.start, "US-ASCII")
      if (s != "webm" && s != "matroska") return null
    }
    val segment = top.find(_.id == SegmentL).getOrElse(return null)
    val kids = scanChildren(bytes, segment.start, segment.end, _ => false)
    if (kids == null) return null

    val tsScale = (for {
      info <- kids.find(_.id == InfoL)
      infoKids = scanChildren(bytes, info.start, info.end, _ => false)
      if infoKids != null
      ts <- infoKids.find(_.id == TimestampScaleL)
    } yield uintOf(bytes, ts)).getOrElse(1000000L)
    if (tsScale <= 0) return null
    val timescale = 1000000000L / tsScale
    if (timescale <= 0) return null

    // first VIDEO TrackEntry: number, dims, default duration
    val tracks = kids.find(_.id == TracksL).getOrElse(return null)
    val entries = scanChildren(bytes, tracks.start, tracks.end, _ => false)
    if (entries == null) return null
    var trackNum = -1L
    var w = 0
    var h = 0
    var defDurTicks = 0L
    entries.filter(_.id == TrackEntryL).foreach { te =>
      if (trackNum == -1L) {
        val tk = scanChildren(bytes, te.start, te.end, _ => false)
        if (tk == null) return null
        val isVideo = tk.find(_.id == TrackTypeL).exists(uintOf(bytes, _) == 1L)
        if (isVideo) {
          trackNum = tk.find(_.id == TrackNumberL).map(uintOf(bytes, _)).getOrElse(-1L)
          tk.find(_.id == DefaultDurationL).foreach { dd =>
            defDurTicks = uintOf(bytes, dd) / tsScale
          }
          tk.find(_.id == VideoL).foreach { v =>
            val vk = scanChildren(bytes, v.start, v.end, _ => false)
            if (vk == null) return null
            w = vk.find(_.id == PixelWidthL).map(uintOf(bytes, _).toInt).getOrElse(0)
            h = vk.find(_.id == PixelHeightL).map(uintOf(bytes, _).toInt).getOrElse(0)
          }
        }
      }
    }
    if (trackNum <= 0 || w <= 0 || h <= 0) return null
    Header(segment, kids, timescale, trackNum, w, h, defDurTicks)
  }

  /** One cluster's frames for the header's track, in block order:
    * (dts, offset, size, keyframe). Null on any malformed structure —
    * block head, lace header, over-wide uint (the callers' None).
    */
  private def clusterSamples(bytes: Array[Byte], cl: El,
      hdr: Header): Vector[(Long, Long, Long, Boolean)] = {
    val ck = scanChildren(bytes, cl.start, cl.end, _ => false)
    if (ck == null) return null
    val clusterTs = ck.find(_.id == TimestampL).map(uintOf(bytes, _)).getOrElse(0L)
    if (clusterTs < 0) return null // over-wide uint: malformed
    val out = Vector.newBuilder[(Long, Long, Long, Boolean)]
    var n = 0
    ck.foreach { el =>
      // a SimpleBlock, or a BlockGroup wrapping a Block (keyframe =
      // the group carries NO ReferenceBlock — Matroska semantics)
      val blockEl: Option[(El, Boolean, Boolean)] = el.id match {
        case SimpleBlockL => Some((el, true, false))
        case BlockGroupL =>
          val gk = scanChildren(bytes, el.start, el.end, _ => false)
          if (gk == null) return null
          gk.find(_.id == BlockL).map { bl =>
            (bl, false, gk.exists(_.id == ReferenceBlockL))
          }
        case _ => None
      }
      blockEl.foreach { case (bl, simple, hasRef) =>
        if (n >= MaxBlocks) return null
        // block payload: track VINT, int16 relative ts, flags byte
        val tn = readSize(bytes, bl.start, bl.end) // track number is a plain VINT
        if (tn == null || tn._1 == -1L) return null
        if (tn._1 == hdr.trackNum) {
          val p = bl.start + tn._2
          if (p + 3 > bl.end) return null
          val rel = ByteBuffer.wrap(bytes, p, 2).order(ByteOrder.BIG_ENDIAN).getShort.toLong
          val flags = bytes(p + 2) & 0xff
          val dataStart = p + 3
          val keyframe = if (simple) (flags & 0x80) != 0 else !hasRef
          // laced blocks carry several frames behind one timestamp:
          // frame i's time is blockTs + i·DefaultDuration (only the
          // first frame's time is coded — Matroska lacing semantics),
          // and the block's keyframe verdict applies to every frame
          // (lacing is the audio/all-key shape in practice)
          val lacing = (flags >> 1) & 0x03
          val frames: Vector[(Long, Long)] =
            if (lacing == 0) Vector((dataStart.toLong, (bl.end - dataStart).toLong))
            else laceFrames(bytes, dataStart, bl.end, lacing).getOrElse(return null)
          val blockTs = clusterTs + rel
          var fi = 0
          while (fi < frames.length) {
            if (n >= MaxBlocks) return null
            val (off, len) = frames(fi)
            out += ((blockTs + fi * hdr.defDurTicks, off, len, keyframe))
            n += 1; fi += 1
          }
        }
      }
    }
    out.result()
  }

  /** Parse the first video track's frame index. Timescale is derived as
    * ticks-per-second from TimestampScale (`1e9 / TimestampScale`; the
    * Matroska-default 1,000,000 ns gives 1000 — millisecond ticks), so
    * the output schema is unit-compatible with [[Mp4.Index]]. Frame
    * duration comes from the track's DefaultDuration (0 when absent —
    * Matroska blocks carry no per-frame duration). A Cues seek table is
    * skipped like any other non-Cluster element — full walks don't need
    * it. Returns None for anything that is not a well-formed
    * WebM/Matroska file with a video track and at least one frame.
    */
  def index(bytes: Array[Byte]): Option[Mp4.Index] = {
    try {
      val hdr = parseHeader(bytes)
      if (hdr == null) return None
      val out = Vector.newBuilder[Mp4.Sample]
      var sampleNo = 0
      var chunkNo = 0
      hdr.kids.filter(_.id == ClusterL).foreach { cl =>
        val cs = clusterSamples(bytes, cl, hdr)
        if (cs == null) return None
        if (sampleNo + cs.length > MaxBlocks) return None
        cs.foreach { case (dts, off, len, keyframe) =>
          out += Mp4.Sample(sampleNo, chunkNo, off, len, dts, hdr.defDurTicks, keyframe)
          sampleNo += 1
        }
        if (cs.nonEmpty) chunkNo += 1
      }
      val samples = out.result()
      if (samples.isEmpty) None
      else Some(Mp4.Index(hdr.w, hdr.h, hdr.timescale, samples))
    } catch {
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
          _: NegativeArraySizeException => None
    }
  }

  /** The Segment's Cues seek table as (CueTime ticks, ABSOLUTE byte
    * offset of the pointed Cluster element), video-track entries only,
    * sorted by time. None when the Segment has no Cues or any CuePoint
    * is structurally malformed — callers fall back to the linear walk
    * (Cues are an optimization hint, not data; a missing/broken seek
    * table must never change results).
    */
  private def parseCues(bytes: Array[Byte], hdr: Header): Option[Vector[(Long, Long)]] = {
    val cues = hdr.kids.find(_.id == CuesL).getOrElse(return None)
    val points = scanChildren(bytes, cues.start, cues.end, _ => false)
    if (points == null) return None
    val out = Vector.newBuilder[(Long, Long)]
    points.filter(_.id == CuePointL).foreach { cp =>
      val pk = scanChildren(bytes, cp.start, cp.end, _ => false)
      if (pk == null) return None
      val time = pk.find(_.id == CueTimeL).map(uintOf(bytes, _)).getOrElse(return None)
      if (time < 0) return None
      pk.filter(_.id == CueTrackPositionsL).foreach { ctp =>
        val tk = scanChildren(bytes, ctp.start, ctp.end, _ => false)
        if (tk == null) return None
        val track = tk.find(_.id == CueTrackL).map(uintOf(bytes, _)).getOrElse(hdr.trackNum)
        if (track == hdr.trackNum) {
          val pos = tk.find(_.id == CueClusterPositionL).map(uintOf(bytes, _))
            .getOrElse(return None)
          if (pos < 0) return None
          out += ((time, hdr.segment.start + pos))
        }
      }
    }
    val v = out.result().sortBy(_._1)
    if (v.isEmpty) None else Some(v)
  }

  /** Clip index: the samples with `fromTicks <= dts < toTicks`, numbered
    * from 0 in walk order (`chunk_no` likewise renumbers the clusters
    * that contributed at least one in-range frame). When the file carries
    * a Cues seek table, the walk STARTS at the cue-pointed cluster with
    * the greatest CueTime <= fromTicks — the preceding clusters' blocks
    * are never parsed, which is the point of the element: a
    * clip-extraction pass over hour-long videos touches ~clip/duration of
    * each file's cluster bodies instead of all of them. A seek target
    * that does not parse as a Cluster, or a structurally broken Cues,
    * falls back to the full linear walk — a seek table is a hint and can
    * never change results (WebmSpec proves clip == filtered full index
    * both ways). Early exit once cluster timestamps pass
    * `toTicks + 32767` (block-relative timestamps are int16, so no later
    * cluster can reach back into range; cluster timestamps are
    * non-decreasing in any real mux — ours included). Assumes block times
    * >= their cluster's Timestamp when seeking, the standard muxing shape
    * ([[encode]]'s rel >= 0 require). None for malformed files or an
    * empty clip — same drop-and-count contract as [[index]].
    */
  def indexClip(bytes: Array[Byte], fromTicks: Long, toTicks: Long): Option[Mp4.Index] = {
    require(fromTicks <= toTicks, s"indexClip: from $fromTicks > to $toTicks")
    try {
      val hdr = parseHeader(bytes)
      if (hdr == null) return None
      clipCore(bytes, hdr, fromTicks, toTicks)
    } catch {
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
          _: NegativeArraySizeException => None
    }
  }

  /** [[indexClip]] with the window in MILLISECONDS of wall time, whatever
    * the file's TimestampScale: selects exactly the samples whose
    * `time_ms = dts·1000/timescale` falls in [fromMs, toMs) — the
    * container-agnostic clip contract [[Mp4]] corpora share (floor-exact:
    * the tick window is the ceil-division preimage of the ms window).
    * Under the Matroska-default millisecond clock this is [[indexClip]].
    */
  def indexClipMs(bytes: Array[Byte], fromMs: Long, toMs: Long): Option[Mp4.Index] = {
    require(fromMs <= toMs, s"indexClipMs: from $fromMs > to $toMs")
    try {
      val hdr = parseHeader(bytes)
      if (hdr == null) return None
      def ceilTicks(ms: Long): Long = (ms * hdr.timescale + 999L) / 1000L
      clipCore(bytes, hdr, ceilTicks(fromMs), ceilTicks(toMs))
    } catch {
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
          _: NegativeArraySizeException => None
    }
  }

  private def clipCore(bytes: Array[Byte], hdr: Header,
      fromTicks: Long, toTicks: Long): Option[Mp4.Index] = {
    {
      // seek: greatest cue time <= fromTicks whose target parses as a
      // Cluster element boundary; anything less → linear walk over the
      // already-scanned Segment children
      val clusters: Vector[El] = {
        val linear = hdr.kids.filter(_.id == ClusterL)
        parseCues(bytes, hdr) match {
          case Some(cues) =>
            val at = cues.filter(_._1 <= fromTicks).lastOption.map(_._2)
            at match {
              case Some(pos) if pos >= 0 && pos < hdr.segment.end =>
                val seeked = scanChildren(bytes, pos.toInt, hdr.segment.end, _ => false)
                if (seeked != null && seeked.nonEmpty && seeked.head.id == ClusterL)
                  seeked.filter(_.id == ClusterL)
                else linear
              case Some(_) => linear
              case None => linear // every cue is past fromTicks: walk all
            }
          case None => linear
        }
      }

      val out = Vector.newBuilder[Mp4.Sample]
      var sampleNo = 0
      var chunkNo = 0
      var i = 0
      var done = false
      while (i < clusters.length && !done) {
        val cl = clusters(i)
        val ck = scanChildren(bytes, cl.start, cl.end, _ => false)
        if (ck == null) return None
        val clusterTs = ck.find(_.id == TimestampL).map(uintOf(bytes, _)).getOrElse(0L)
        if (clusterTs < 0) return None
        if (clusterTs > toTicks + Short.MaxValue.toLong) done = true // int16 rel bound
        else {
          val cs = clusterSamples(bytes, cl, hdr)
          if (cs == null) return None
          if (sampleNo + cs.length > MaxBlocks) return None
          var emitted = false
          cs.foreach { case (dts, off, len, keyframe) =>
            if (dts >= fromTicks && dts < toTicks) {
              out += Mp4.Sample(sampleNo, chunkNo, off, len, dts, hdr.defDurTicks, keyframe)
              sampleNo += 1
              emitted = true
            }
          }
          if (emitted) chunkNo += 1
        }
        i += 1
      }
      val samples = out.result()
      if (samples.isEmpty) None
      else Some(Mp4.Index(hdr.w, hdr.h, hdr.timescale, samples))
    }
  }
}
