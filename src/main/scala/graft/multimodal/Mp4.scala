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
    // minimal generic visual sample entry ('mp4v'): 8 reserved+index,
    // 16 predefined, dims, resolution, frame count, compressor, depth
    val sampleEntry = {
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
    val stsd = box("stsd", concat(be32(0, 1), sampleEntry))
    val stbl = box("stbl", concat(stsd, stts, stss, stsc, stsz, stco))

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
    val moov = box("moov", concat(mvhd, trak))
    concat(ftyp, mdat, moov)
  }

  // ----------------------------------------------------------------- read

  private final case class Box(tpe: String, start: Int, end: Int)

  private def scanBoxes(b: Array[Byte], from: Int, until: Int): Vector[Box] = {
    val out = Vector.newBuilder[Box]
    var p = from
    while (p + 8 <= until) {
      val buf = ByteBuffer.wrap(b, p, 8).order(ByteOrder.BIG_ENDIAN)
      val size = buf.getInt.toLong & 0xffffffffL
      val tpe = new String(b, p + 4, 4, "US-ASCII")
      if (size < 8 || p + size > until) return out.result() // truncated/corrupt: stop
      out += Box(tpe, p + 8, p + size.toInt)
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

      // stsz: sample sizes (uniform-size tables carry no entry array, so
      // their count validates against entrySize 0 — range-checked either way)
      val stsz = child(bytes, st, "stsz").getOrElse(return None)
      val uniformSize = u32(bytes, stsz.start + 4)
      val nSamples = tableCount(bytes, stsz, countAt = 8, entriesAt = 12,
        entrySize = if (uniformSize != 0) 0 else 4).getOrElse(return None)
      if (nSamples <= 0) return None
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
      val _ = tkhdVersion // v1 tkhd has the same trailing dims layout
      Some(Index(width, height, timescale, samples.result()))
    } catch {
      // NegativeArraySizeException is unreachable now that every table
      // count validates through tableCount, but the defensive-parse
      // contract ("malformed returns None, never a task crash") keeps it
      // in the net as belt and braces
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
          _: NegativeArraySizeException => None
    }
  }
}
