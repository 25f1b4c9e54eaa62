package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal, dependency-free MP4 (ISO BMFF, ISO/IEC 14496-12) container
  * codec for frame INDEXING — not frame decoding. Real-world video
  * corpora are overwhelmingly MP4/H.264 and the JDK ships no H.264
  * decoder, but the container's sample tables (`moov/trak/mdia/minf/
  * stbl`) are pure arithmetic over a fully documented public format:
  * sample sizes (`stsz`), decode timestamps (`stts`), chunk layout
  * (`stsc` + `stco`/`co64`), and sync samples (`stss`) reconstruct every
  * frame's byte range, timestamp, and keyframe flag without touching a
  * codec. That index is what a 100 TB video-curation pass actually
  * needs first: duration/fps/keyframe-density stats, clip boundary
  * planning, and byte-range extraction for downstream GPU decoders —
  * all scan-local per row (same shape as [[Avi]] decode).
  *
  * Write side emits a valid one-video-track MP4 (ftyp + mdat + moov)
  * whose sample payloads are opaque bytes — exactly what the read side
  * indexes, and deterministic so a SQL oracle can replay the entire
  * index from a generator formula. Parsing is defensive: anything
  * malformed returns None (media pipelines drop and count undecodable
  * rows).
  */
object Mp4 {

  /** One sample's index entry: byte range, timing (in `timescale`
    * ticks), chunk membership, and sync flag.
    */
  final case class Sample(
      sampleNo: Int,
      chunkNo: Int,
      offset: Long,
      size: Long,
      dts: Long,
      duration: Long,
      keyframe: Boolean)

  /** A video track's full sample index plus the track constants a
    * curation pass reports (dimensions from `tkhd`, tick rate from
    * `mdhd`).
    */
  final case class Index(
      width: Int,
      height: Int,
      timescale: Long,
      samples: Vector[Sample]) {
    def durationTicks: Long = samples.foldLeft(0L)((a, s) => a + s.duration)
    def durationMs: Long =
      if (timescale <= 0) 0L else durationTicks * 1000L / timescale
  }

  // ---------------------------------------------------------------- write

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    out.putInt(8 + payload.length)
    out.put(tpe.getBytes("US-ASCII"))
    out.put(payload)
    out.array()
  }

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def be32(xs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * xs.length).order(ByteOrder.BIG_ENDIAN)
    xs.foreach(b.putInt)
    b.array()
  }

  /** Encode a one-track MP4: `ftyp` + `mdat` (samples concatenated in
    * chunks of `samplesPerChunk`) + `moov` with full sample tables. All
    * samples share one `stts` delta; `keyframes` are 0-based sample
    * numbers. Payload bytes are caller-provided opaque data.
    */
  def encode(
      width: Int,
      height: Int,
      timescale: Long,
      delta: Long,
      samples: Seq[Array[Byte]],
      keyframes: Seq[Int],
      samplesPerChunk: Int = 2): Array[Byte] = {
    require(width > 0 && height > 0, "encode: non-positive dimensions")
    require(timescale > 0 && delta > 0, "encode: non-positive timing")
    require(samples.nonEmpty, "encode: need at least one sample")
    require(samplesPerChunk >= 1, "encode: samplesPerChunk < 1")
    val n = samples.length
    val duration = n.toLong * delta

    val ftyp = box("ftyp", concat(
      "isom".getBytes("US-ASCII"), be32(512),
      "isom".getBytes("US-ASCII"), "iso2".getBytes("US-ASCII")))
    val mdatBody = concat(samples: _*)
    val mdat = box("mdat", mdatBody)
    val mdatBodyOffset = ftyp.length.toLong + 8L

    // chunk layout: fixed-size runs of samplesPerChunk (tail may be short)
    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
    val chunkOffsets = (0 until nChunks).map { c =>
      mdatBodyOffset + samples.take(c * samplesPerChunk).map(_.length.toLong).sum
    }
    // stsc runs: (first_chunk, samples_per_chunk, sample_description_index)
    val lastChunkSamples = n - (nChunks - 1) * samplesPerChunk
    val stscRuns =
      if (nChunks == 1 || lastChunkSamples == samplesPerChunk)
        Seq((1, samplesPerChunk min n, 1))
      else Seq((1, samplesPerChunk, 1), (nChunks, lastChunkSamples, 1))

    val stts = box("stts", concat(be32(0, 1), be32(n, delta.toInt)))
    val stsz = box("stsz", concat(be32(0, 0, n), be32(samples.map(_.length): _*)))
    val stsc = box("stsc", concat(be32(0, stscRuns.length),
      be32(stscRuns.flatMap { case (f, s, d) => Seq(f, s, d) }: _*)))
    val stco = box("stco", concat(be32(0, nChunks),
      be32(chunkOffsets.map(_.toInt): _*)))
    val stss =
      if (keyframes.isEmpty) Array.emptyByteArray
      else box("stss", concat(be32(0, keyframes.length),
        be32(keyframes.map(_ + 1): _*))) // stss is 1-based
    val stsd = box("stsd", concat(be32(0, 1), visualSampleEntry(width, height)))
    val moov = moovBox(width, height, timescale, duration,
      concat(stsd, stts, stss, stsc, stsz, stco), Array.emptyByteArray)
    concat(ftyp, mdat, moov)
  }

  // ------------------------------------------------------- fragmented write

  /** Shared moov builder: full sample tables for progressive files, empty
    * tables (+ `mvex/trex` defaults) for fragmented ones.
    */
  private def moovBox(width: Int, height: Int, timescale: Long, duration: Long,
      stblChildren: Array[Byte], mvex: Array[Byte]): Array[Byte] = {
    val stbl = box("stbl", stblChildren)
    val dref = box("dref", concat(be32(0, 1), box("url ", be32(1))))
    val dinf = box("dinf", dref)
    val vmhd = box("vmhd", concat(be32(1), new Array[Byte](8)))
    val minf = box("minf", concat(vmhd, dinf, stbl))
    val hdlr = box("hdlr", concat(be32(0, 0),
      "vide".getBytes("US-ASCII"), be32(0, 0, 0), Array[Byte](0)))
    val mdhd = box("mdhd", concat(be32(0, 0, 0),
      be32(timescale.toInt, duration.toInt), be32(0x55c40000)))
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    val tkhd = {
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.putInt(7) // version 0, flags: enabled | in_movie
      b.putInt(0); b.putInt(0) // times
      b.putInt(1); b.putInt(0) // track id, reserved
      b.putInt(duration.toInt)
      b.put(new Array[Byte](16)) // reserved, layer, group, volume
      b.putInt(0x00010000); b.putInt(0); b.putInt(0)
      b.putInt(0); b.putInt(0x00010000); b.putInt(0)
      b.putInt(0); b.putInt(0); b.putInt(0x40000000) // identity matrix
      b.putInt(width << 16); b.putInt(height << 16) // 16.16 fixed point
      box("tkhd", b.array())
    }
    val trak = box("trak", concat(tkhd, mdia))
    val mvhd = box("mvhd", concat(be32(0, 0, 0),
      be32(1000, (duration * 1000L / timescale).toInt),
      be32(0x00010000, 0x01000000), new Array[Byte](10 + 36 - 8),
      be32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      new Array[Byte](24), be32(2)))
    box("moov", concat(mvhd, trak, mvex))
  }

  private def visualSampleEntry(width: Int, height: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(86).order(ByteOrder.BIG_ENDIAN)
    b.putInt(86); b.put("mp4v".getBytes("US-ASCII"))
    b.put(new Array[Byte](6)); b.putShort(1) // data_reference_index
    b.put(new Array[Byte](16))
    b.putShort(width.toShort); b.putShort(height.toShort)
    b.putInt(0x00480000); b.putInt(0x00480000) // 72 dpi
    b.putInt(0); b.putShort(1) // frame_count
    b.put(new Array[Byte](32)) // compressorname
    b.putShort(24); b.putShort(-1) // depth, pre_defined
    b.array()
  }

  /** sample_flags value: bit 16 = sample_is_non_sync_sample; keyframes
    * additionally mark sample_depends_on = 2 (independent).
    */
  private def sampleFlags(keyframe: Boolean): Int =
    if (keyframe) 0x02000000 else 0x01010000

  /** Encode a one-track FRAGMENTED MP4 (fMP4 — the layout of DASH/HLS
    * captures and most web-crawled streaming video): `ftyp` + `moov`
    * whose sample tables are EMPTY (`mvex/trex` carries the track
    * defaults) + one `moof`+`mdat` pair per fragment of
    * `samplesPerFragment` samples. Each `moof` holds `mfhd` (sequence
    * number), `tfhd` (default-base-is-moof), `tfdt` (v1 base decode
    * time) and one `trun` with explicit per-sample duration/size/flags
    * and a data offset pointing into its own `mdat`.
    *
    * With `useDefaults = true` the `trun` carries sizes only: durations
    * come from tfhd's default-sample-duration, flags from tfhd's
    * default-sample-flags (non-sync) with trun first-sample-flags
    * marking each fragment's first sample as sync — the compact encoding
    * real muxers emit for constant-rate streams (keyframes must then lie
    * on fragment starts).
    */
  def encodeFragmented(
      width: Int,
      height: Int,
      timescale: Long,
      delta: Long,
      samples: Seq[Array[Byte]],
      keyframes: Seq[Int],
      samplesPerFragment: Int = 2,
      useDefaults: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "encodeFragmented: non-positive dimensions")
    require(timescale > 0 && delta > 0, "encodeFragmented: non-positive timing")
    require(samples.nonEmpty, "encodeFragmented: need at least one sample")
    require(samplesPerFragment >= 1, "encodeFragmented: samplesPerFragment < 1")
    val n = samples.length
    val keys = keyframes.toSet
    if (useDefaults)
      require(keys.forall(_ % samplesPerFragment == 0),
        "encodeFragmented(useDefaults): keyframes must lie on fragment starts")
    val duration = n.toLong * delta

    val ftyp = box("ftyp", concat(
      "iso5".getBytes("US-ASCII"), be32(512),
      "iso5".getBytes("US-ASCII"), "iso6".getBytes("US-ASCII")))
    // empty sample tables: a parser must fall through to the fragments
    val emptyStbl = concat(
      box("stsd", concat(be32(0, 1), visualSampleEntry(width, height))),
      box("stts", be32(0, 0)),
      box("stsc", be32(0, 0)),
      box("stsz", be32(0, 0, 0)),
      box("stco", be32(0, 0)))
    val trex = box("trex", concat(be32(0), // version/flags
      be32(1, 1), // track id, default sample description index
      be32(delta.toInt, 0, sampleFlags(keyframe = false)))) // dur, size, flags
    val moov = moovBox(width, height, timescale, duration,
      emptyStbl, box("mvex", trex))

    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    val fragments = samples.zipWithIndex.grouped(samplesPerFragment).toSeq
    fragments.zipWithIndex.foreach { case (frag, f) =>
      val nf = frag.length
      val first = frag.head._2
      val mfhd = box("mfhd", concat(be32(0), be32(f + 1)))
      val tfhdFlags = 0x020000 | (if (useDefaults) 0x8 | 0x20 else 0)
      val tfhd = box("tfhd", concat(be32(tfhdFlags), be32(1),
        if (useDefaults) be32(delta.toInt, sampleFlags(keyframe = false))
        else Array.emptyByteArray))
      val tfdt = {
        val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
        b.putInt(0x01000000) // version 1
        b.putLong(first.toLong * delta)
        box("tfdt", b.array())
      }
      val trunFlags =
        if (useDefaults) 0x1 | 0x4 | 0x200 // data-offset, first-sample-flags, sizes
        else 0x1 | 0x100 | 0x200 | 0x400 // data-offset, durations, sizes, flags
      val perSample = if (useDefaults) 4 else 12
      val trunLen = 8 + 4 + 4 + 4 + (if (useDefaults) 4 else 0) + nf * perSample
      val trafLen = 8 + tfhd.length + tfdt.length + trunLen
      val moofLen = 8 + mfhd.length + trafLen
      val trun = {
        val b = ByteBuffer.allocate(trunLen - 8).order(ByteOrder.BIG_ENDIAN)
        b.putInt(trunFlags)
        b.putInt(nf)
        b.putInt(moofLen + 8) // data offset: from moof start to mdat body
        if (useDefaults) b.putInt(sampleFlags(keyframe = keys.contains(first)))
        frag.foreach { case (payload, s) =>
          if (!useDefaults) b.putInt(delta.toInt)
          b.putInt(payload.length)
          if (!useDefaults) b.putInt(sampleFlags(keys.contains(s)))
        }
        box("trun", b.array())
      }
      val traf = box("traf", concat(tfhd, tfdt, trun))
      val moof = box("moof", concat(mfhd, traf))
      assert(moof.length == moofLen, s"moof size arithmetic: ${moof.length} vs $moofLen")
      out.write(moof)
      out.write(box("mdat", concat(frag.map(_._1): _*)))
    }
    out.toByteArray
  }

  // ----------------------------------------------------------------- read

  private final case class Box(tpe: String, start: Int, end: Int)

  /** ISO-BMFF box walk, all three header shapes: the common 32-bit size,
    * `size == 1` + 64-bit largesize (how real muxers frame `mdat` past
    * 4 GB — the box-header analog of `co64`), and `size == 0` = "extends
    * to the end of the enclosing space" (the last-box shape live captures
    * write). Truncated or lying sizes stop the walk — the defensive-parse
    * contract.
    */
  private def scanBoxes(b: Array[Byte], from: Int, until: Int): Vector[Box] = {
    val out = Vector.newBuilder[Box]
    var p = from
    while (p + 8 <= until) {
      val size32 = u32(b, p)
      val tpe = new String(b, p + 4, 4, "US-ASCII")
      if (size32 == 0L) { // to the end of the enclosing range; nothing follows
        out += Box(tpe, p + 8, until)
        return out.result()
      }
      val (size, hdr) =
        if (size32 == 1L) {
          if (p + 16 > until) return out.result()
          (u64(b, p + 8), 16)
        } else (size32, 8)
      if (size < hdr || size > until - p) return out.result() // truncated/corrupt: stop
      out += Box(tpe, p + hdr, p + size.toInt)
      p += size.toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], parent: Box, tpe: String): Option[Box] =
    scanBoxes(b, parent.start, parent.end).find(_.tpe == tpe)

  private def u32(b: Array[Byte], at: Int): Long =
    ByteBuffer.wrap(b, at, 4).order(ByteOrder.BIG_ENDIAN).getInt.toLong & 0xffffffffL

  private def u64(b: Array[Byte], at: Int): Long =
    ByteBuffer.wrap(b, at, 8).order(ByteOrder.BIG_ENDIAN).getLong

  /** Sanity cap on any declared table entry count: well past real media
    * (10M samples ≈ 46h at 60fps) but small enough that a crafted count
    * can never trigger a multi-GB allocation.
    */
  private val MaxTableEntries = 10_000_000L

  /** A table box's declared entry count, VALIDATED before any
    * allocation: the unsigned count must be under [[MaxTableEntries]]
    * and the entry array must lie inside the box's byte range (a count
    * whose high bit is set would otherwise go negative via `.toInt` and
    * crash `Array.tabulate` with NegativeArraySizeException; a count
    * exceeding the box would silently read the following boxes' bytes).
    * All arithmetic in Long — no overflow path.
    */
  private def tableCount(b: Array[Byte], box: Box, countAt: Int, entriesAt: Int, entrySize: Int): Option[Int] = {
    if (box.start + countAt + 4 > box.end) return None
    val n = u32(b, box.start + countAt)
    if (n > MaxTableEntries) None
    else if (box.start.toLong + entriesAt + n * entrySize > box.end) None
    else Some(n.toInt)
  }

  /** Clip an already-parsed index to the samples whose
    * `time_ms = dts·1000/timescale` falls in [fromMs, toMs), renumbered
    * from 0 ([[graft.multimodal.Webm.indexClip]]'s contract). MP4 needs
    * no byte-level seek — the moov sample tables ARE the seek index, so
    * a clip is a filter over the (tiny) parsed table; the payload bytes
    * the retained offsets point at are untouched. None when the window
    * is empty — clip-less videos drop like unparseable ones.
    */
  def clipMs(ix: Index, fromMs: Long, toMs: Long): Option[Index] = {
    require(fromMs <= toMs, s"clipMs: from $fromMs > to $toMs")
    if (ix == null || ix.timescale <= 0) return None
    val picked = ix.samples.filter { s =>
      val ms = s.dts * 1000L / ix.timescale
      ms >= fromMs && ms < toMs
    }
    if (picked.isEmpty) None
    else {
      var lastChunk = Int.MinValue
      var chunk = -1
      val renum = picked.zipWithIndex.map { case (s, i) =>
        if (s.chunkNo != lastChunk) { chunk += 1; lastChunk = s.chunkNo }
        s.copy(sampleNo = i, chunkNo = chunk)
      }
      Some(ix.copy(samples = renum))
    }
  }

  /** Parse the first video track's sample tables into a full per-sample
    * index. Returns None for anything that is not a well-formed
    * one-or-more-track MP4 with a video track.
    */
  def index(bytes: Array[Byte]): Option[Index] = {
    if (bytes == null || bytes.length < 16) return None
    try {
      val top = scanBoxes(bytes, 0, bytes.length)
      if (!top.exists(b => b.tpe == "ftyp")) return None
      val moov = top.find(_.tpe == "moov").getOrElse(return None)
      val traks = scanBoxes(bytes, moov.start, moov.end).filter(_.tpe == "trak")
      val videoTrak = traks.find { tk =>
        (for {
          mdia <- child(bytes, tk, "mdia")
          hdlr <- child(bytes, mdia, "hdlr")
        } yield new String(bytes, hdlr.start + 8, 4, "US-ASCII") == "vide")
          .getOrElse(false)
      }.getOrElse(return None)

      val tkhd = child(bytes, videoTrak, "tkhd").getOrElse(return None)
      val tkhdVersion = bytes(tkhd.start) & 0xff
      // width/height are the last two 16.16 values of the box
      val dimsAt = tkhd.end - 8
      val width = (u32(bytes, dimsAt) >> 16).toInt
      val height = (u32(bytes, dimsAt + 4) >> 16).toInt

      val mdia = child(bytes, videoTrak, "mdia").getOrElse(return None)
      val mdhd = child(bytes, mdia, "mdhd").getOrElse(return None)
      val mdhdVersion = bytes(mdhd.start) & 0xff
      val timescale =
        if (mdhdVersion == 1) u32(bytes, mdhd.start + 20)
        else u32(bytes, mdhd.start + 12)
      val stbl = for {
        minf <- child(bytes, mdia, "minf")
        s <- child(bytes, minf, "stbl")
      } yield s
      val st = stbl.getOrElse(return None)

      // ---- progressive samples from stbl (an fMP4 init keeps these
      // tables EMPTY — zero samples here falls through to the fragments)
      val progSamples: Vector[Sample] = {
        // stsz: sample sizes (uniform-size tables carry no entry array,
        // so their count validates against entrySize 0)
        val stsz = child(bytes, st, "stsz").getOrElse(return None)
        val uniformSize = u32(bytes, stsz.start + 4)
        val nSamples = tableCount(bytes, stsz, countAt = 8, entriesAt = 12,
          entrySize = if (uniformSize != 0) 0 else 4).getOrElse(return None)
        if (nSamples == 0) Vector.empty
        else {
          val sizes: Array[Long] =
            if (uniformSize != 0) Array.fill(nSamples)(uniformSize)
            else Array.tabulate(nSamples)(i => u32(bytes, stsz.start + 12 + 4 * i))

          // stts: decode deltas as (count, delta) runs
          val stts = child(bytes, st, "stts").getOrElse(return None)
          val nRuns = tableCount(bytes, stts, countAt = 4, entriesAt = 8, entrySize = 8)
            .getOrElse(return None)
          val durations = new Array[Long](nSamples)
          var s = 0
          var run = 0
          while (run < nRuns && s < nSamples) {
            val cnt = u32(bytes, stts.start + 8 + 8 * run).toInt
            val del = u32(bytes, stts.start + 12 + 8 * run)
            var k = 0
            while (k < cnt && s < nSamples) { durations(s) = del; s += 1; k += 1 }
            run += 1
          }
          if (s != nSamples) return None

          // stss: sync samples (absent box = every sample is sync)
          val keyframes: Int => Boolean = child(bytes, st, "stss") match {
            case None => _ => true
            case Some(ss) =>
              val n = tableCount(bytes, ss, countAt = 4, entriesAt = 8, entrySize = 4)
                .getOrElse(return None)
              val set = (0 until n).map(i => u32(bytes, ss.start + 8 + 4 * i).toInt).toSet
              (sampleNo: Int) => set.contains(sampleNo + 1) // stss is 1-based
          }

          // stco/co64: chunk offsets
          val chunkOffsets: Array[Long] = child(bytes, st, "stco") match {
            case Some(co) =>
              val n = tableCount(bytes, co, countAt = 4, entriesAt = 8, entrySize = 4)
                .getOrElse(return None)
              Array.tabulate(n)(i => u32(bytes, co.start + 8 + 4 * i))
            case None =>
              val co = child(bytes, st, "co64").getOrElse(return None)
              val n = tableCount(bytes, co, countAt = 4, entriesAt = 8, entrySize = 8)
                .getOrElse(return None)
              Array.tabulate(n)(i => u64(bytes, co.start + 8 + 8 * i))
          }

          // stsc: (first_chunk, samples_per_chunk) runs → per-sample chunk
          val stsc = child(bytes, st, "stsc").getOrElse(return None)
          val nScRuns = tableCount(bytes, stsc, countAt = 4, entriesAt = 8, entrySize = 12)
            .getOrElse(return None)
          val scRuns = (0 until nScRuns).map { i =>
            (u32(bytes, stsc.start + 8 + 12 * i).toInt, // first_chunk, 1-based
              u32(bytes, stsc.start + 12 + 12 * i).toInt) // samples_per_chunk
          }
          if (scRuns.isEmpty || chunkOffsets.isEmpty) return None

          // expand chunk layout → per-sample (chunkNo, offset)
          val samples = Vector.newBuilder[Sample]
          var dts = 0L
          var sampleNo = 0
          var chunk = 0
          while (sampleNo < nSamples && chunk < chunkOffsets.length) {
            val runIdx = scRuns.lastIndexWhere(_._1 <= chunk + 1)
            if (runIdx < 0) return None
            val perChunk = scRuns(runIdx)._2
            var within = 0
            var off = chunkOffsets(chunk)
            while (within < perChunk && sampleNo < nSamples) {
              samples += Sample(sampleNo, chunk, off, sizes(sampleNo), dts,
                durations(sampleNo), keyframes(sampleNo))
              off += sizes(sampleNo)
              dts += durations(sampleNo)
              sampleNo += 1
              within += 1
            }
            chunk += 1
          }
          if (sampleNo != nSamples) return None
          samples.result()
        }
      }

      val fragSamples = parseFragments(bytes, top, moov, videoTrak, progSamples)
        .getOrElse(return None)
      val all = progSamples ++ fragSamples
      if (all.isEmpty) return None
      val _ = tkhdVersion // v1 tkhd has the same trailing dims layout
      Some(Index(width, height, timescale, all))
    } catch {
      // NegativeArraySizeException is unreachable now that every table
      // count validates through tableCount, but the defensive-parse
      // contract ("malformed returns None, never a task crash") keeps it
      // in the net as belt and braces
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
          _: NegativeArraySizeException => None
    }
  }

  private def i32(b: Array[Byte], at: Int): Int =
    ByteBuffer.wrap(b, at, 4).order(ByteOrder.BIG_ENDIAN).getInt

  /** Fragmented-MP4 samples: walk every top-level `moof`, matching `traf`
    * boxes for the video track, and expand their `trun` sample runs with
    * the ISO 14496-12 defaulting chain (trun per-sample field → tfhd
    * default → mvex/trex default). Sample numbering and the decode clock
    * continue from the progressive samples (a file may carry both — the
    * progressive head plus appended fragments); each moof is one chunk.
    * Returns None for structurally-broken fragment tables — absent
    * fragments return an empty vector (plain progressive file).
    */
  private def parseFragments(
      bytes: Array[Byte],
      top: Vector[Box],
      moov: Box,
      videoTrak: Box,
      progSamples: Vector[Sample]): Option[Vector[Sample]] = {
    val moofs = top.filter(_.tpe == "moof")
    if (moofs.isEmpty) return Some(Vector.empty)

    val tkhd = child(bytes, videoTrak, "tkhd").getOrElse(return None)
    val tkhdVer = bytes(tkhd.start) & 0xff
    val trackId =
      if (tkhdVer == 1) u32(bytes, tkhd.start + 20) else u32(bytes, tkhd.start + 12)

    // mvex/trex: movie-level fragment defaults for this track
    // (duration, size, flags) — the bottom of the defaulting chain
    val trexDefaults: Option[(Long, Long, Long)] = for {
      mvex <- child(bytes, moov, "mvex")
      trex <- scanBoxes(bytes, mvex.start, mvex.end)
        .find(b => b.tpe == "trex" && b.end - b.start >= 24 && u32(bytes, b.start + 4) == trackId)
    } yield (u32(bytes, trex.start + 12), u32(bytes, trex.start + 16), u32(bytes, trex.start + 20))

    val out = Vector.newBuilder[Sample]
    var sampleNo = progSamples.length
    var chunkNo = progSamples.lastOption.map(_.chunkNo + 1).getOrElse(0)
    var dts = progSamples.lastOption.map(s => s.dts + s.duration).getOrElse(0L)

    moofs.foreach { moof =>
      val moofStart = moof.start - 8L // box start includes the 8-byte header
      var sawTrack = false
      scanBoxes(bytes, moof.start, moof.end).filter(_.tpe == "traf").foreach { traf =>
        val tfhd = child(bytes, traf, "tfhd").getOrElse(return None)
        if (tfhd.end - tfhd.start < 8) return None
        val tfFlags = u32(bytes, tfhd.start) & 0xffffff
        if (u32(bytes, tfhd.start + 4) == trackId) {
          sawTrack = true
          // tfhd optional fields, in flag order
          var p = tfhd.start + 8
          var baseOffset = moofStart // default-base-is-moof AND the first-traf default
          if ((tfFlags & 0x1) != 0) { // explicit base-data-offset
            if (p + 8 > tfhd.end) return None
            baseOffset = u64(bytes, p); p += 8
          }
          if ((tfFlags & 0x2) != 0) p += 4 // sample-description-index
          var defDur = trexDefaults.map(_._1)
          if ((tfFlags & 0x8) != 0) {
            if (p + 4 > tfhd.end) return None
            defDur = Some(u32(bytes, p)); p += 4
          }
          var defSize = trexDefaults.map(_._2)
          if ((tfFlags & 0x10) != 0) {
            if (p + 4 > tfhd.end) return None
            defSize = Some(u32(bytes, p)); p += 4
          }
          var defFlags = trexDefaults.map(_._3)
          if ((tfFlags & 0x20) != 0) {
            if (p + 4 > tfhd.end) return None
            defFlags = Some(u32(bytes, p)); p += 4
          }
          if (p > tfhd.end) return None

          // tfdt: absolute base decode time resets the running clock
          child(bytes, traf, "tfdt").foreach { td =>
            val ver = bytes(td.start) & 0xff
            dts =
              if (ver == 1) { if (td.start + 12 > td.end) return None; u64(bytes, td.start + 4) }
              else { if (td.start + 8 > td.end) return None; u32(bytes, td.start + 4) }
          }

          var runOffset = baseOffset
          scanBoxes(bytes, traf.start, traf.end).filter(_.tpe == "trun").foreach { trun =>
            val trFlags = u32(bytes, trun.start) & 0xffffff
            val perSample =
              4 * java.lang.Long.bitCount(trFlags & (0x100L | 0x200L | 0x400L | 0x800L))
            val headLen = 8 +
              (if ((trFlags & 0x1) != 0) 4 else 0) +
              (if ((trFlags & 0x4) != 0) 4 else 0)
            val cnt = tableCount(bytes, trun, countAt = 4, entriesAt = headLen,
              entrySize = perSample).getOrElse(return None)
            if (sampleNo.toLong + cnt > MaxTableEntries) return None
            var p2 = trun.start + 8
            if ((trFlags & 0x1) != 0) { // signed data offset from the base
              runOffset = baseOffset + i32(bytes, p2); p2 += 4
            }
            var firstFlags: Option[Long] = None
            if ((trFlags & 0x4) != 0) { firstFlags = Some(u32(bytes, p2)); p2 += 4 }
            var k = 0
            while (k < cnt) {
              var dur = defDur
              if ((trFlags & 0x100) != 0) { dur = Some(u32(bytes, p2)); p2 += 4 }
              var size = defSize
              if ((trFlags & 0x200) != 0) { size = Some(u32(bytes, p2)); p2 += 4 }
              var flags = if (k == 0 && firstFlags.isDefined) firstFlags else defFlags
              if ((trFlags & 0x400) != 0) { flags = Some(u32(bytes, p2)); p2 += 4 }
              if ((trFlags & 0x800) != 0) p2 += 4 // composition offset: not indexed
              val sz = size.getOrElse(return None) // no size source anywhere → broken
              val d = dur.getOrElse(0L)
              // bit 16 = sample_is_non_sync_sample
              val keyframe = (flags.getOrElse(0L) & 0x10000L) == 0L
              out += Sample(sampleNo, chunkNo, runOffset, sz, dts, d, keyframe)
              runOffset += sz
              dts += d
              sampleNo += 1
              k += 1
            }
          }
        }
      }
      if (sawTrack) chunkNo += 1
    }
    Some(out.result())
  }
}
