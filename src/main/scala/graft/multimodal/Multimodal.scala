package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: payloads are opaque
  * `binary` columns with a typed metadata struct alongside, processed by
  * per-partition batch UDFs.
  *
  * IMAGE decode is REAL: [[decodeImagesIO]] runs `javax.imageio`
  * (JDK-built-in, headless-safe — PNG/JPEG/BMP/GIF) and its gate's oracle
  * checks actual decoded dimensions and pixel means. AUDIO decode is REAL
  * via `javax.sound.sampled` ([[decodeAudioIO]] — WAV/AIFF/AU). VIDEO
  * decode is REAL via the dependency-free [[Avi]] RIFF reader
  * ([[decodeVideoIO]], [[sampleFramesIO]] — uncompressed BI_RGB and MJPG
  * frames; MJPG rides ImageIO per frame). The byte-level [[decodeStub]]
  * path remains as the codec-less plumbing shape for formats outside
  * those codecs (the production swap is `mapInPandas` with the same
  * schema contract).
  *
  * Scale design: decode is embarrassingly parallel and scan-local — no
  * shuffle. `repartition` the input only to match decoder-core counts;
  * feature outputs are small fixed-width columns so the decoded table is
  * far smaller than the payload table.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaMetadataType: StructType = StructType(
    Seq(
      StructField("media_type", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    ))

  /** Wrap a binary column into the canonical (payload, metadata) layout. */
  def asMediaTable(df: DataFrame, payloadCol: String, mediaType: String): DataFrame =
    df.withColumn(
      "media_meta",
      struct(
        lit(mediaType).as("media_type"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(LongType).as("duration_ms")
      )
    )

  val imageFeatureSchema: StructType = StructType(
    Seq(
      StructField("byte_length", LongType, nullable = false),
      StructField("content_hash", LongType, nullable = false),
      StructField("mean_intensity", DoubleType, nullable = false),
      StructField("feature_vec", ArrayType(DoubleType, containsNull = false), nullable = false)
    ))

  /** STUB decode: deterministic fake features derived from the raw bytes
    * (length, 64-bit content hash, byte-mean as "intensity", 8-dim hash
    * projection as "embedding"). Replace the body with a real codec in
    * production; signature and batch shape stay identical.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Row = {
    val len = bytes.length.toLong
    var h = 1125899906842597L // deterministic FNV-ish rolling hash
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      sum += (bytes(i) & 0xff)
      i += 1
    }
    val mean = if (len == 0) 0.0 else sum.toDouble / len
    val vec = (0 until 8).map(j => ((h >>> (j * 8)) & 0xff).toDouble / 255.0)
    Row(len, h, mean, vec)
  }

  /** Per-partition batch "decode": the mapInPandas-equivalent plumbing.
    * Input: any table with an id column and a binary payload column.
    * Output: id + imageFeatureSchema columns.
    */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: imageFeatureSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(payloadIdx)) Array.emptyByteArray else r.getAs[Array[Byte]](payloadIdx)
        val f = decodeStub(bytes)
        Row.fromSeq(r.get(idIdx) +: f.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** STUB resize: payload→payload transform with metadata update — the
    * shape of every bytes-to-bytes media op (resize, transcode,
    * re-encode). The fake output is a deterministic `w*h/256`-byte
    * digest-expansion of the input so downstream size accounting is
    * realistic; a real implementation swaps the body for the codec call.
    * Narrow (scan-local), no shuffle.
    */
  def resizeImages(df: DataFrame, payloadCol: String, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0)
    val outLen = math.max(1, width * height / 256)
    val resize = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        var h = 1125899906842597L
        var i = 0
        while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
        val out = new Array[Byte](outLen)
        var j = 0
        var s = h
        while (j < outLen) {
          s = s * 6364136223846793005L + 1442695040888963407L
          out(j) = (s >>> 56).toByte
          j += 1
        }
        out
      }
    }
    df.withColumn(payloadCol, resize(col(payloadCol)))
      .withColumn(
        "media_meta",
        if (df.columns.contains("media_meta"))
          col("media_meta")
            .withField("width", lit(width))
            .withField("height", lit(height))
        else struct(
          lit("image").as("media_type"),
          lit(width).as("width"), lit(height).as("height"),
          lit(null).cast(IntegerType).as("sample_rate"),
          lit(null).cast(LongType).as("duration_ms")))
  }

  // =====================================================================
  // REAL image decode (javax.imageio)
  // =====================================================================

  val imageDecodeSchema: StructType = StructType(
    Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("mean_intensity", DoubleType, nullable = false)
    ))

  /** Deterministic grayscale PNG for a row id — a REAL `ImageIO.write`
    * PNG encode (zlib-compressed, full codec round trip), pixel
    * (row i, col j) = (id·31 + i·7 + j·13) mod 256, dimensions
    * (1 + id mod 16) × (1 + ⌊id/16⌋ mod 16). Lets a gate manufacture
    * genuine image payloads from table ids whose DECODED content a SQL
    * oracle can recompute arithmetically: PNG is lossless, so only a real
    * decode reproduces the formula mean.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticPng: id must be non-negative, got $id")
    val w = 1 + (id % 16).toInt
    val h = 1 + ((id / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        raster.setSample(j, i, 0, ((id * 31 + i * 7 + j * 13) % 256).toInt)
        j += 1
      }
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", out), "PNG writer missing")
    out.toByteArray
  }

  /** ImageIO decode hardened for corpus data (fuzz-found, round 9;
    * widened to all formats in round 10):
    *
    *  - an image whose corrupted header declares a huge geometry costs
    *    SECONDS of allocate-and-decode per row before the post-decode
    *    filter runs (measured 11 s on one mutated PNG fixture) — a
    *    decode bomb. The format's own reader parses the DECLARED
    *    width/height from the header (`ImageReader.getWidth/getHeight`
    *    read metadata only, no pixel allocation) and rejects against
    *    `maxPixels` BEFORE any `BufferedImage` is allocated — for every
    *    installed format (PNG, GIF, BMP, JPEG, TIFF, WBMP), not just the
    *    hand-parsed PNG IHDR this check started as;
    *  - JDK readers throw IIOException AND runtime faults
    *    (ArrayIndexOutOfBounds in the JPEG reader) on truncated
    *    streams — mapped to None so one corrupt row drops instead of
    *    failing the whole task (the documented decode contract).
    */
  private[multimodal] def readImageSafe(bytes: Array[Byte],
      maxPixels: Long = 1L << 26): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) None
          else Option(reader.read(0))
            // post-decode re-check stays: a lying header that under-declares
            // must not smuggle an oversized raster past the budget
            .filter(i => i.getWidth.toLong * i.getHeight <= maxPixels &&
              i.getWidth > 0 && i.getHeight > 0)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL image decode: `ImageIO.read` over the payload bytes; None when
    * the bytes are not a decodable image. mean_intensity averages every
    * raster sample across all bands (for 8-bit gray that is exactly the
    * pixel mean; for RGB the mean over the three channels).
    */
  private[multimodal] def decodeImageIO(bytes: Array[Byte]): Option[Row] =
    readImageSafe(bytes).map { img =>
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val bands = raster.getNumBands
      var sum = 0L
      var b = 0
      while (b < bands) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, b); x += 1 }
          y += 1
        }
        b += 1
      }
      Row(w, h, bands, sum.toDouble / (w.toLong * h * bands))
    }

  /** REAL 8×8 average-hash over the decoded image: box-average the
    * raster's band-0 samples onto an 8×8 grid (pure integer block sums —
    * no platform-dependent Graphics2D scaling), threshold by the grid
    * mean, pack 64 bits row-major (bit = 1 when cell > mean). The
    * perceptual twin of SimHash for text: near-identical images land
    * within a few Hamming bits.
    */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    readImageSafe(bytes).map { img =>
      val raster = img.getRaster
      aHash64Grid(img.getWidth, img.getHeight, (x, y) => raster.getSample(x, y, 0))
    }

  /** The aHash kernel over any (x, y) → sample accessor: box-average onto
    * the 8×8 grid, threshold by the grid mean (empty cells average 0),
    * pack 64 bits row-major. Shared by the image ([[aHash64]]) and video
    * ([[aHash64Frame]]) paths so their fingerprints are comparable.
    */
  private def aHash64Grid(w: Int, h: Int, sample: (Int, Int) => Int): Long = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 8 / w
        sums(gy * 8 + gx) += sample(x, y)
        counts(gy * 8 + gx) += 1
        x += 1
      }
      y += 1
    }
    // cells with no pixels (w or h < 8) average as 0
    val cell = Array.tabulate(64)(k => if (counts(k) == 0) 0.0 else sums(k).toDouble / counts(k))
    val mean = cell.sum / 64.0
    var bits = 0L
    var k = 0
    while (k < 64) { if (cell(k) > mean) bits |= (1L << k); k += 1 }
    bits
  }

  /** aHash of one decoded grayscale frame (row-major top-down samples). */
  def aHash64Frame(frame: Array[Byte], w: Int, h: Int): Long =
    aHash64Grid(w, h, (x, y) => frame(y * w + x) & 0xff)

  /** Per-partition REAL decode over a payload column: id + decoded
    * (width, height, channels, mean_intensity). Payloads `ImageIO` cannot
    * decode are DROPPED (media pipelines filter undecodable rows; count
    * input vs output to quantify). Scan-local, no shuffle.
    */
  def decodeImagesIO(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: imageDecodeSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        decodeImageIO(bytes).map(f => Row.fromSeq(r.get(idIdx) +: f.toSeq))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** REAL image resize: decode (ImageIO), box-average the band-0 raster
    * onto a `width`×`height` grid with INTEGER arithmetic (per-cell
    * `sum / count` truncating division — deterministic across platforms,
    * unlike Graphics2D interpolation, and exactly replicable by a SQL
    * oracle), re-encode as grayscale PNG. Undecodable payloads pass
    * through as null payloads. Scan-local, no shuffle — the same
    * bytes→bytes contract as [[resizeImages]], with a real codec on both
    * ends.
    */
  def resizeImagesIO(df: DataFrame, payloadCol: String, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0)
    val resize = udf { (bytes: Array[Byte]) =>
      readImageSafe(bytes).map { img =>
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](width * height)
        val counts = new Array[Long](width * height)
        var y = 0
        while (y < h) {
          val gy = y * height / h
          var x = 0
          while (x < w) {
            val gx = x * width / w
            sums(gy * width + gx) += raster.getSample(x, y, 0)
            counts(gy * width + gx) += 1
            x += 1
          }
          y += 1
        }
        val out = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var k = 0
        while (k < width * height) {
          // upscaling leaves cells with no source pixel → 0 (documented)
          val v = if (counts(k) == 0) 0 else (sums(k) / counts(k)).toInt
          out.getRaster.setSample(k % width, k / width, 0, v)
          k += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }.orNull
    }
    df.withColumn(payloadCol, resize(col(payloadCol)))
      .withColumn(
        "media_meta",
        if (df.columns.contains("media_meta"))
          col("media_meta")
            .withField("width", lit(width))
            .withField("height", lit(height))
        else struct(
          lit("image").as("media_type"),
          lit(width).as("width"), lit(height).as("height"),
          lit(null).cast(IntegerType).as("sample_rate"),
          lit(null).cast(LongType).as("duration_ms")))
  }

  // =====================================================================
  // REAL audio decode (javax.sound.sampled — WAV/PCM, JDK built-in)
  // =====================================================================

  val audioDecodeSchema: StructType = StructType(
    Seq(
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("bits", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false)
    ))

  /** Deterministic mono 16-bit PCM WAV for a row id — a REAL
    * `AudioSystem.write` WAV encode: sample rate 8000 + (id mod 8)·1000,
    * 32 + (id mod 32) frames, sample(t) = ((id·31 + t·17) mod 65536) −
    * 32768. PCM is lossless, so a SQL oracle can recompute the decoded
    * stream's RMS and duration arithmetically — only a real decode
    * reproduces them from the container bytes.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticWav: id must be non-negative, got $id")
    val rate = 8000 + (id % 8).toInt * 1000
    val n = 32 + (id % 32).toInt
    val raw = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val v = ((id * 31 + t * 17) % 65536).toInt - 32768
      raw(2 * t) = (v & 0xff).toByte // little-endian int16
      raw(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode: `AudioSystem.getAudioInputStream` over the
    * payload bytes (WAV/AIFF/AU — whatever the JDK service loader
    * provides); None when the bytes are not a decodable audio container
    * or not 16-bit PCM. RMS is over all samples of all channels,
    * normalized to [-1, 1); duration is integer milliseconds
    * (frames·1000 / rate).
    */
  /** Header sanity gate applied BEFORE any stream read (fuzz-found):
    * a corrupted channel-count field can declare a frame size larger
    * than `readAllBytes`'s internal buffer, making `AudioInputStream
    * .read` return 0 forever (it refuses partial frames) — the JDK's
    * `readAllBytes` then SPINS, hanging the task instead of failing it.
    * A zero sample rate would likewise divide-by-zero downstream.
    */
  private def saneFormat(fmt: javax.sound.sampled.AudioFormat): Boolean =
    fmt.getChannels >= 1 && fmt.getChannels <= 64 &&
      fmt.getFrameSize >= 1 && fmt.getFrameSize <= 4096 &&
      fmt.getSampleRate >= 1f && fmt.getSampleRate <= 1e7f

  private[multimodal] def decodeAudio(bytes: Array[Byte]): Option[Row] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          !saneFormat(fmt)) None
        else {
          val frames = ais.getFrameLength
          val rate = fmt.getSampleRate.toInt
          val channels = fmt.getChannels
          val raw = ais.readAllBytes()
          val nSamples = raw.length / 2
          var sq = 0.0
          var i = 0
          while (i < nSamples) {
            val lo = raw(2 * i) & 0xff
            val hi = raw(2 * i + 1) & 0xff
            val v = (if (fmt.isBigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
            val x = v / 32768.0
            sq += x * x
            i += 1
          }
          val rms = if (nSamples == 0) 0.0 else math.sqrt(sq / nSamples)
          Some(Row(rate, channels, 16, frames, frames * 1000L / rate, rms))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Per-partition REAL audio decode: id + [[audioDecodeSchema]] columns;
    * undecodable payloads dropped (same contract as [[decodeImagesIO]]).
    */
  def decodeAudioIO(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: audioDecodeSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        decodeAudio(bytes).map(f => Row.fromSeq(r.get(idIdx) +: f.toSeq))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  val audioFeatureIOSchema: StructType = StructType(
    Seq(
      StructField("w", IntegerType, nullable = false),
      StructField("win_rms", DoubleType, nullable = false),
      StructField("zcr", LongType, nullable = false),
      StructField("peak", DoubleType, nullable = false),
      StructField("mean_abs", DoubleType, nullable = false)
    ))

  /** REAL audio feature extraction over decoded 16-bit PCM (UDTF shape,
    * 1→`nWindows` rows per decodable payload): per-window RMS plus
    * whole-stream zero-crossing count, normalized peak, and mean absolute
    * amplitude. All samples-of-all-channels interleaved order, window `w`
    * covering samples `[w·n/nWindows, (w+1)·n/nWindows)` with integer
    * division — every quantity is either integer-exact or a fixed-order
    * float fold, so a SQL oracle replicates them bit-for-bit. Undecodable
    * or non-PCM16 payloads drop (same contract as [[decodeAudioIO]]).
    * Spectral features live in [[mfccIO]] (own radix-2 FFT — [[Dsp]]).
    */
  def audioFeaturesIO(df: DataFrame, idCol: String, payloadCol: String, nWindows: Int = 4): DataFrame = {
    require(nWindows >= 1, s"audioFeaturesIO: nWindows must be >= 1, got $nWindows")
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: audioFeatureIOSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        pcmSamples(bytes).toSeq.flatMap { s =>
          val n = s.length
          var zcr = 0L
          var peakI = 0
          var sumAbs = 0L
          var t = 0
          while (t < n) {
            val v = s(t)
            if (t > 0 && ((s(t - 1) < 0) != (v < 0))) zcr += 1
            val a = math.abs(v)
            if (a > peakI) peakI = a
            sumAbs += a
            t += 1
          }
          val peak = peakI / 32768.0
          val meanAbs = if (n == 0) 0.0 else (sumAbs.toDouble / 32768.0) / n
          (0 until nWindows).map { w =>
            val from = w * n / nWindows
            val until = (w + 1) * n / nWindows
            var sq = 0.0
            var i = from
            while (i < until) { val x = s(i) / 32768.0; sq += x * x; i += 1 }
            val cnt = math.max(until - from, 1)
            Row.fromSeq(r.get(idIdx) +: Seq[Any](w, math.sqrt(sq / cnt), zcr, peak, meanAbs))
          }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Decode a payload to interleaved 16-bit PCM samples (all channels);
    * None when not a decodable 16-bit PCM container.
    */
  private[multimodal] def pcmSamples(bytes: Array[Byte]): Option[Array[Int]] =
    pcmSamplesWithRate(bytes).map(_._1)

  /** Deterministic mono 16-bit PCM WAV long enough for framed spectral
    * analysis: FIXED sample rate 8000 Hz (so one mel filterbank covers
    * every fixture — rate variety is [[syntheticWav]]'s job), `64 +
    * (id mod 160)` frames (1–3 full 64-sample analysis frames), sample
    * formula identical to [[syntheticWav]]:
    * `((id·31 + t·17) mod 65536) − 32768`.
    */
  def syntheticWavLong(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticWavLong: id must be non-negative, got $id")
    val n = 64 + (id % 160).toInt
    val raw = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val v = ((id * 31 + t * 17) % 65536).toInt - 32768
      raw(2 * t) = (v & 0xff).toByte // little-endian int16
      raw(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def mfccIOSchema(nCoef: Int): StructType = StructType(
    StructField("frame", IntegerType, nullable = false) +:
      ((0 until nCoef).map(j => StructField(s"c$j", DoubleType, nullable = false)) :+
        StructField("log_energy", DoubleType, nullable = false)))

  /** REAL MFCC over decoded 16-bit PCM (UDTF shape, 1 row per full
    * `frameLen`-sample analysis frame): Hann window → radix-2 FFT
    * ([[Dsp.fft]] — own implementation, the JDK ships none) → one-sided
    * power spectrum → triangular mel filterbank → `ln(e + 1e-10)` →
    * DCT-II, plus the frame's total log-energy. Frames tile the
    * interleaved sample stream with hop = `frameLen`; a trailing partial
    * frame drops. Multichannel payloads are processed as the interleaved
    * stream (downmix upstream if that matters). Undecodable or non-PCM16
    * payloads drop (same contract as [[decodeAudioIO]]).
    *
    * Every float op is a fixed-order fold over embedded-constant tables,
    * so [[graft.queries.DspSql.mfccSql]] reproduces the coefficients
    * bit-for-bit in SQL — the FFT itself is oracle-exact; only the final
    * `ln` rides the (empirically ulp-level) libm parity, absorbed by the
    * gate's round-6. Scale: scan-local per-row compute, tables built
    * once per partition per sample rate; no shuffle.
    */
  def mfccIO(df: DataFrame, idCol: String, payloadCol: String,
             frameLen: Int = 64, nMels: Int = 8, nCoef: Int = 4): DataFrame = {
    require(frameLen > 0 && (frameLen & (frameLen - 1)) == 0, s"mfccIO: frameLen must be a power of two, got $frameLen")
    require(nMels >= 1 && nCoef >= 1 && nCoef <= nMels, s"mfccIO: need 1 <= nCoef <= nMels, got nCoef=$nCoef nMels=$nMels")
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: mfccIOSchema(nCoef).fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val hw = Dsp.hann(frameLen)
      val tables = Dsp.twiddles(frameLen)
      val dct = Dsp.dctTable(nMels, nCoef)
      // mel weights depend on the decoded sample rate — memoized per partition
      val weightsByRate = scala.collection.mutable.HashMap.empty[Int, Array[Array[Double]]]
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        pcmSamplesWithRate(bytes).toSeq.flatMap { case (s, rate) =>
          val weights = weightsByRate.getOrElseUpdate(rate, Dsp.melWeights(frameLen, rate, nMels))
          val nFrames = s.length / frameLen
          (0 until nFrames).map { f =>
            val frame = java.util.Arrays.copyOfRange(s, f * frameLen, (f + 1) * frameLen)
            val (coeffs, logEnergy) = Dsp.mfccFrame(frame, hw, tables, weights, dct)
            Row.fromSeq(r.get(idIdx) +: (f +: (coeffs.toSeq :+ logEnergy)))
          }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  val spectralIOSchema: StructType = StructType(
    Seq(
      StructField("frame", IntegerType, nullable = false),
      StructField("centroid", DoubleType, nullable = false),
      StructField("bandwidth", DoubleType, nullable = false),
      StructField("rolloff", DoubleType, nullable = false),
      StructField("flatness", DoubleType, nullable = false)
    ))

  /** REAL spectral-shape features over decoded 16-bit PCM (same framing
    * contract as [[mfccIO]]): per `frameLen`-sample frame, the power
    * spectrum's centroid, bandwidth, 85% rolloff frequency, and
    * flatness ([[Dsp.spectralFrame]]). Scan-local, no shuffle;
    * undecodable payloads drop.
    */
  def spectralFeaturesIO(df: DataFrame, idCol: String, payloadCol: String,
      frameLen: Int = 64): DataFrame = {
    require(frameLen > 0 && (frameLen & (frameLen - 1)) == 0, s"spectralFeaturesIO: frameLen must be a power of two, got $frameLen")
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: spectralIOSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val hw = Dsp.hann(frameLen)
      val tables = Dsp.twiddles(frameLen)
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        pcmSamplesWithRate(bytes).toSeq.flatMap { case (s, rate) =>
          val nFrames = s.length / frameLen
          (0 until nFrames).map { f =>
            val frame = java.util.Arrays.copyOfRange(s, f * frameLen, (f + 1) * frameLen)
            val power = Dsp.powerSpectrum(frame, hw, tables)
            val (centroid, bandwidth, rolloff, flatness) = Dsp.spectralFrame(power, rate, frameLen)
            Row.fromSeq(r.get(idIdx) +: Seq[Any](f, centroid, bandwidth, rolloff, flatness))
          }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** [[pcmSamples]] plus the container's sample rate (Hz). */
  private[multimodal] def pcmSamplesWithRate(bytes: Array[Byte]): Option[(Array[Int], Int)] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          !saneFormat(fmt)) None
        else {
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val lo = raw(2 * i) & 0xff
            val hi = raw(2 * i + 1) & 0xff
            out(i) = (if (fmt.isBigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
            i += 1
          }
          Some((out, fmt.getSampleRate.toInt))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  val audioFeatureSchema: StructType = StructType(
    Seq(
      StructField("byte_length", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("mfcc_vec", ArrayType(DoubleType, containsNull = false), nullable = false)
    ))

  /** STUB audio feature extraction (13-dim MFCC-shaped vector + RMS from
    * the raw bytes). Same per-partition batch contract as
    * [[decodeImages]]. [[audioFeaturesIO]] is the real-codec path for
    * everything non-spectral; this stub remains only as the MFCC-shaped
    * plumbing contract.
    */
  def audioFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: audioFeatureSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(payloadIdx)) Array.emptyByteArray else r.getAs[Array[Byte]](payloadIdx)
        var h = 1125899906842597L
        var sq = 0.0
        var i = 0
        while (i < bytes.length) {
          h = 31 * h + bytes(i)
          val v = (bytes(i) & 0xff) / 255.0
          sq += v * v
          i += 1
        }
        val rms = if (bytes.isEmpty) 0.0 else math.sqrt(sq / bytes.length)
        val mfcc = (0 until 13).map { j =>
          val s = h * (j + 1) * 6364136223846793005L
          ((s >>> 32).toInt.toDouble / Int.MaxValue)
        }
        Row.fromSeq(r.get(idIdx) +: Seq(bytes.length.toLong, rms, mfcc))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  // =====================================================================
  // REAL video decode (dependency-free AVI/RIFF reader — [[Avi]])
  // =====================================================================

  val videoDecodeSchema: StructType = StructType(
    Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("fps_rate", IntegerType, nullable = false),
      StructField("fps_scale", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("mean_intensity", DoubleType, nullable = false)
    ))

  /** Deterministic grayscale AVI for a row id — a REAL [[Avi.encode]]
    * container (uncompressed 24-bit BI_RGB frames, so the round trip is
    * LOSSLESS): 1 + id mod 6 frames of (1 + id mod 8) × (1 + ⌊id/8⌋ mod 8)
    * pixels at 5 + id mod 10 fps, frame `f` pixel (row i, col j) =
    * (id·31 + f·101 + i·7 + j·13) mod 256. As with [[syntheticPng]], the
    * id-formula is the SQL-checkable ground truth for genuinely decoded
    * frame content.
    */
  def syntheticAvi(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticAvi: id must be non-negative, got $id")
    val w = 1 + (id % 8).toInt
    val h = 1 + ((id / 8) % 8).toInt
    val fps = 5 + (id % 10).toInt
    val nFrames = 1 + (id % 6).toInt
    val frames = (0 until nFrames).map { f =>
      Array.tabulate(w * h) { k =>
        ((id * 31 + f * 101 + (k / w) * 7 + (k % w) * 13) % 256).toByte
      }
    }
    Avi.encode(w, h, fps, frames)
  }

  /** Per-partition REAL video decode: id + [[videoDecodeSchema]] columns
    * (container dims, frame-rate fraction, frame count, duration,
    * all-frame pixel mean). Payloads [[Avi.decode]] cannot open are
    * DROPPED (same contract as [[decodeImagesIO]]). Scan-local, no
    * shuffle; features are fixed-width, so the decoded table is tiny
    * relative to the payload table.
    */
  def decodeVideoIO(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: videoDecodeSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        Avi.decode(bytes).map { v =>
          var sum = 0L
          v.frames.foreach { f =>
            var i = 0
            while (i < f.length) { sum += (f(i) & 0xff); i += 1 }
          }
          val nPx = v.nFrames.toLong * v.width * v.height
          val mean = if (nPx == 0) 0.0 else sum.toDouble / nPx
          Row.fromSeq(r.get(idIdx) +: Seq[Any](
            v.width, v.height, v.fpsRate, v.fpsScale, v.nFrames.toLong, v.durationMs, mean))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  val frameSampleSchema: StructType = StructType(
    Seq(
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_mean", DoubleType, nullable = false)
    ))

  /** REAL frame sampling (UDTF/generator shape, 1→N rows): decode the
    * container, pick `min(n, n_frames)` evenly-spaced frames
    * (`frame_no = sample_idx · n_frames / k` — strictly increasing, no
    * repeats), emit per-frame pixel means. Undecodable payloads drop out.
    * Scan-local: the explode happens inside the partition, frames never
    * shuffle — only the fixed-width per-frame stats do.
    */
  def sampleFramesIO(df: DataFrame, idCol: String, payloadCol: String, n: Int): DataFrame = {
    require(n >= 1, s"sampleFramesIO: n must be >= 1, got $n")
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: frameSampleSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        Avi.decode(bytes).toSeq.flatMap { v =>
          val k = math.min(n, v.nFrames)
          (0 until k).map { s =>
            val frameNo = (s.toLong * v.nFrames / k).toInt
            val f = v.frames(frameNo)
            var sum = 0L
            var i = 0
            while (i < f.length) { sum += (f(i) & 0xff); i += 1 }
            val mean = if (f.length == 0) 0.0 else sum.toDouble / f.length
            Row.fromSeq(r.get(idIdx) +: Seq[Any](s, frameNo, mean))
          }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Deterministic one-track MP4 for a row id — a REAL [[Mp4.encode]]
    * container whose sample tables a SQL oracle can replay from the id:
    * n = 1 + id mod 7 samples, sample `s` size = 50 + (id·13 + s·7) mod
    * 200 with opaque filler bytes, per-sample duration 100 + (id mod 9)·10
    * ticks at timescale 600·(1 + id mod 4), keyframes every 3rd sample,
    * chunks of 2 samples, dimensions 16·(1 + id mod 8) ×
    * 16·(1 + ⌊id/8⌋ mod 8). The fixed `ftyp` prefix puts the first
    * sample at byte 32 and chunks pack contiguously, so every offset is
    * 32 + a prefix sum of the size formula.
    */
  def syntheticMp4(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticMp4: id must be non-negative, got $id")
    val w = 16 * (1 + (id % 8).toInt)
    val h = 16 * (1 + ((id / 8) % 8).toInt)
    val timescale = 600L * (1 + (id % 4))
    val delta = 100L + (id % 9) * 10L
    val n = 1 + (id % 7).toInt
    val samples = (0 until n).map { s =>
      val size = 50 + ((id * 13 + s * 7) % 200).toInt
      Array.tabulate(size)(k => ((id + s * 31 + k) % 256).toByte)
    }
    val keyframes = (0 until n).filter(_ % 3 == 0)
    Mp4.encode(w, h, timescale, delta, samples, keyframes, samplesPerChunk = 2)
  }

  /** Fragmented twin of [[syntheticMp4]]: the SAME per-sample formulas
    * (sizes, timing, keyframes, dimensions) laid out as a real
    * [[Mp4.encodeFragmented]] fMP4 — `moov` with empty sample tables,
    * samples in per-fragment `moof/trun` boxes of 2 samples each. Offsets
    * are fully arithmetic for the oracle: the `ftyp+moov` header is a
    * CONSTANT 625 bytes (all init boxes are fixed-size; Mp4Spec pins it),
    * fragment g of nf samples occupies `(88 + 12·nf) + 8 + Σ sizes`
    * bytes (moof + mdat header + payload), and sample s of fragment f
    * sits after f's moof+mdat header plus its within-fragment
    * predecessor.
    */
  def syntheticFragMp4(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticFragMp4: id must be non-negative, got $id")
    val w = 16 * (1 + (id % 8).toInt)
    val h = 16 * (1 + ((id / 8) % 8).toInt)
    val timescale = 600L * (1 + (id % 4))
    val delta = 100L + (id % 9) * 10L
    val n = 1 + (id % 7).toInt
    val samples = (0 until n).map { s =>
      val size = 50 + ((id * 13 + s * 7) % 200).toInt
      Array.tabulate(size)(k => ((id + s * 31 + k) % 256).toByte)
    }
    val keyframes = (0 until n).filter(_ % 3 == 0)
    Mp4.encodeFragmented(w, h, timescale, delta, samples, keyframes, samplesPerFragment = 2)
  }

  /** WebM twin of [[syntheticMp4]]: the SAME per-sample size/keyframe/
    * dimension formulas laid out as a real [[Webm.encode]] Matroska file
    * (clusters of 2 SimpleBlocks). The clock is Matroska's native
    * millisecond tick (TimestampScale = 1 ms → timescale 1000), with
    * `delta` ms per frame, so `time_ms == dts`. Offsets are fully
    * arithmetic for the oracle: a CONSTANT [[Webm.HeaderBytes]]-byte
    * header, then cluster g of nf blocks occupies
    * `23 + 13·nf + Σ sizes` bytes, and block s of cluster f sits after
    * f's 23-byte cluster head plus its within-cluster predecessors'
    * `13 + size` bytes plus its own 13-byte block head (WebmSpec pins
    * the constants).
    */
  def syntheticWebm(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticWebm: id must be non-negative, got $id")
    val w = 16 * (1 + (id % 8).toInt)
    val h = 16 * (1 + ((id / 8) % 8).toInt)
    val delta = 100L + (id % 9) * 10L
    val n = 1 + (id % 7).toInt
    val samples = (0 until n).map { s =>
      val size = 50 + ((id * 13 + s * 7) % 200).toInt
      Array.tabulate(size)(k => ((id + s * 31 + k) % 256).toByte)
    }
    val keyframes = (0 until n).filter(_ % 3 == 0)
    Webm.encode(w, h, delta, samples, keyframes, samplesPerCluster = 2)
  }

  /** Xiph-laced twin of [[syntheticWebm]]: the same per-sample formulas
    * laid out via [[Webm.encodeLaced]] — each cluster's 2 frames behind
    * ONE laced SimpleBlock. Matroska lacing semantics make two outputs
    * differ from the unlaced twin, both arithmetic for the oracle:
    * every laced frame inherits the BLOCK's keyframe flag (= the
    * cluster's first frame, sample 2f), and frame offsets shift by the
    * lace header (count byte + one size byte per leading frame — all
    * synthetic sizes < 255): cluster f of nf frames occupies
    * `36 + nf + Σ sizes` bytes after the constant 243-byte header, and
    * frame s sits at `frag_start + 36 + nf +` its in-cluster
    * predecessors' sizes (WebmSpec pins the constants).
    */
  def syntheticWebmLaced(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticWebmLaced: id must be non-negative, got $id")
    val w = 16 * (1 + (id % 8).toInt)
    val h = 16 * (1 + ((id / 8) % 8).toInt)
    val delta = 100L + (id % 9) * 10L
    val n = 1 + (id % 7).toInt
    val samples = (0 until n).map { s =>
      val size = 50 + ((id * 13 + s * 7) % 200).toInt
      Array.tabulate(size)(k => ((id + s * 31 + k) % 256).toByte)
    }
    val keyframes = (0 until n).filter(_ % 3 == 0)
    Webm.encodeLaced(w, h, delta, samples, keyframes, samplesPerCluster = 2)
  }

  /** [[syntheticWebm]] with a Cues seek table ([[Webm.encodeWithCues]]):
    * identical frames, every cluster shifted by the constant
    * `Webm.cuesBytes(⌈n/2⌉) = 12 + 58·⌈n/2⌉` bytes the seek table
    * occupies between Tracks and the first Cluster — still closed-form
    * for the oracle.
    */
  def syntheticWebmCues(id: Long): Array[Byte] = {
    require(id >= 0, s"syntheticWebmCues: id must be non-negative, got $id")
    val w = 16 * (1 + (id % 8).toInt)
    val h = 16 * (1 + ((id / 8) % 8).toInt)
    val delta = 100L + (id % 9) * 10L
    val n = 1 + (id % 7).toInt
    val samples = (0 until n).map { s =>
      val size = 50 + ((id * 13 + s * 7) % 200).toInt
      Array.tabulate(size)(k => ((id + s * 31 + k) % 256).toByte)
    }
    val keyframes = (0 until n).filter(_ % 3 == 0)
    Webm.encodeWithCues(w, h, delta, samples, keyframes, samplesPerCluster = 2)
  }

  val videoIndexSchema: StructType = StructType(
    Seq(
      StructField("sample_no", LongType, nullable = false),
      StructField("chunk_no", LongType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("dts", LongType, nullable = false),
      StructField("duration_ticks", LongType, nullable = false),
      StructField("time_ms", LongType, nullable = false),
      StructField("keyframe", BooleanType, nullable = false),
      StructField("timescale", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)
    ))

  /** Per-partition MP4 container indexing (1 row per sample): id +
    * [[videoIndexSchema]] — byte range, chunk, timing (ticks and derived
    * integer milliseconds = dts·1000 / timescale), keyframe flag, and
    * track constants. NO frame decoding ([[Mp4]] class doc); payloads
    * [[Mp4.index]] cannot parse are DROPPED (same contract as
    * [[decodeImagesIO]]). Scan-local per row, no shuffle; the index rows
    * are fixed-width and tiny relative to the payload.
    */
  def indexVideoMp4(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    indexVideoWith(df, idCol, payloadCol, Mp4.index)

  /** [[indexVideoMp4]] for WebM/Matroska payloads ([[Webm]] class doc):
    * identical unified schema, so MP4 and WebM corpora union into one
    * frame-index table. `duration_ticks` comes from the track's
    * DefaultDuration (0 when the file doesn't declare one — Matroska
    * blocks carry no per-frame duration).
    */
  def indexVideoWebm(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    indexVideoWith(df, idCol, payloadCol, Webm.index)

  /** Container-agnostic indexing for MIXED corpora (web crawls carry
    * MP4 and WebM side by side): each payload dispatches on its own
    * magic bytes — EBML's 0x1A45DFA3 → [[Webm.index]], anything else →
    * [[Mp4.index]] with a WebM fallback (both parsers fail cheap and
    * defensively, so a wrong first guess costs a header scan, never a
    * crash). One unified index schema out.
    */
  def indexVideoAuto(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    indexVideoWith(df, idCol, payloadCol, parseVideoAuto)

  /** Clip indexing for WebM payloads ([[Webm.indexClip]]): the samples
    * with `fromTicks <= dts < toTicks` per video, numbered from 0 within
    * the clip. Files carrying a Cues seek table are SEEKED — the walk
    * starts at the cue-pointed cluster covering `fromTicks`, so a
    * clip-extraction pass over long videos parses ~clip/duration of each
    * file's cluster bodies instead of all of them; files without Cues
    * (or with a broken table) take the full walk and return the same
    * rows. Videos with no frame in range drop, like unparseable payloads.
    */
  def clipVideoWebm(df: DataFrame, idCol: String, payloadCol: String,
      fromTicks: Long, toTicks: Long): DataFrame =
    indexVideoWith(df, idCol, payloadCol, Webm.indexClip(_, fromTicks, toTicks))

  /** Container-agnostic clip extraction in MILLISECONDS of wall time —
    * the unified window a curation pass thinks in, whatever each file's
    * tick rate: samples with `time_ms ∈ [fromMs, toMs)`, renumbered from
    * 0 within the clip. Per-container mechanics differ and each gets its
    * cheap path: MP4's moov sample tables ARE the seek index (clip =
    * filter over the parsed table, [[Mp4.clipMs]]); WebM walks from the
    * Cues-seeked cluster ([[Webm.indexClipMs]], ms→tick ceil-division
    * preimage). Same magic-byte dispatch as [[indexVideoAuto]].
    */
  def clipVideoAuto(df: DataFrame, idCol: String, payloadCol: String,
      fromMs: Long, toMs: Long): DataFrame =
    indexVideoWith(df, idCol, payloadCol, clipAutoMs(_, fromMs, toMs))

  private[graft] def clipAutoMs(bytes: Array[Byte], fromMs: Long,
      toMs: Long): Option[Mp4.Index] =
    if (bytes != null && bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
      (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3)
      Webm.indexClipMs(bytes, fromMs, toMs)
    else Mp4.index(bytes).flatMap(Mp4.clipMs(_, fromMs, toMs))
      .orElse(Webm.indexClipMs(bytes, fromMs, toMs))

  private[multimodal] def parseVideoAuto(bytes: Array[Byte]): Option[Mp4.Index] =
    if (bytes != null && bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
      (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3) Webm.index(bytes)
    else Mp4.index(bytes).orElse(Webm.index(bytes))

  private def indexVideoWith(df: DataFrame, idCol: String, payloadCol: String,
      parser: Array[Byte] => Option[Mp4.Index]): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: videoIndexSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        parser(bytes).toSeq.flatMap { ix =>
          ix.samples.map { s =>
            val timeMs = if (ix.timescale <= 0) 0L else s.dts * 1000L / ix.timescale
            Row.fromSeq(r.get(idIdx) +: Seq[Any](
              s.sampleNo.toLong, s.chunkNo.toLong, s.offset, s.size, s.dts,
              s.duration, timeMs, s.keyframe, ix.timescale, ix.width, ix.height))
          }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  val videoHashSchema: StructType = StructType(
    Seq(
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_hash", LongType, nullable = false)
    ))

  /** Per-frame perceptual fingerprints: decode, sample `min(n, n_frames)`
    * evenly-spaced frames (same schedule as [[sampleFramesIO]]), aHash
    * each — the video signature is this small (id, slot, 8-byte hash)
    * table, which is all later stages ever shuffle.
    */
  def videoFrameHashes(df: DataFrame, idCol: String, payloadCol: String, n: Int): DataFrame = {
    require(n >= 1, s"videoFrameHashes: n must be >= 1, got $n")
    val idField = df.schema(idCol)
    val outSchema = StructType(idField +: videoHashSchema.fields)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        Avi.decode(bytes).toSeq.flatMap { v =>
          val k = math.min(n, v.nFrames)
          (0 until k).map { s =>
            val frameNo = (s.toLong * v.nFrames / k).toInt
            val h = aHash64Frame(v.frames(frameNo), v.width, v.height)
            Row.fromSeq(r.get(idIdx) +: Seq[Any](s, frameNo, h))
          }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Perceptual video near-dup pairs: sample `n` frames per video, aHash
    * each, and pair videos whose POSITION-ALIGNED samples are within
    * `maxHamming` bits on at least `minMatches` slots. Alignment rides
    * the sample slot (slot joins only compare frame s-of-k against frame
    * s-of-k), so re-encodes / mild noise pair while different footage
    * doesn't. Reuses the SimHash banding machinery: the shuffle carries
    * (id, slot, band, bucket, fp) rows — payloads and frames never move.
    */
  def videoPerceptualPairs(df: DataFrame, idCol: String, payloadCol: String,
      n: Int = 8, maxHamming: Int = 6, bands: Int = 8, minMatches: Int = 4): DataFrame = {
    import graft.functions.{HashFunctions => H}
    require(maxHamming < bands, s"maxHamming ($maxHamming) must be < bands ($bands) for full recall")
    require(minMatches >= 1, s"minMatches must be >= 1, got $minMatches")
    val fps = videoFrameHashes(df, idCol, payloadCol, n)
      .select(col(idCol).as("id"), col("sample_idx").as("slot"), col("frame_hash").as("fp"))
    val keyed = fps
      .select(col("id"), col("slot"), col("fp"), explode(H.simHashBands(col("fp"), bands)).as("bk"))
      .select(col("id"), col("slot"), col("fp"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    keyed.as("a")
      .join(keyed.as("b"), Seq("slot", "band", "bucket"))
      .where(col("a.id") < col("b.id"))
      .select(col("slot"), col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      .where(H.hamming64(col("fp_a"), col("fp_b")) <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("matched_frames"))
      .where(col("matched_frames") >= minMatches)
  }

  /** Frame-sample stub for video payloads: emits `n` deterministic frame
    * rows per video (UDTF/generator shape — 1→N rows). Kept as the
    * codec-less plumbing shape; [[sampleFramesIO]] is the real-codec path.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, n: Int): DataFrame = {
    // sequence(0, -1) would DESCEND ([0,-1]) and emit phantom frames
    require(n >= 1, s"sampleFrames: n must be >= 1, got $n")
    df.select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0), lit(n - 1)),
            i => xxhash64(col(payloadCol), i)
          )
        ).as(Seq("frame_index", "frame_hash"))
      )
  }

  /** Exact media dedup: one survivor per identical payload (lowest id).
    * The dedup key is (xxhash64, md5, byte length) of the payload — a
    * false merge needs a simultaneous collision of two independent hash
    * families AND equal lengths (< 2⁻¹⁹² — beyond any corpus), while the
    * shuffle carries 44 bytes per row, never the payloads themselves.
    */
  def dedupByContent(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val key = struct(
      xxhash64(col(payloadCol)).as("h"),
      md5(col(payloadCol)).as("m"),
      length(col(payloadCol)).as("len"))
    val survivors = df
      .groupBy(key.as("__ck"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(survivors, Seq(idCol), "left_semi")
  }

  /** Perceptual near-dup pipeline for images: 64-bit aHash-shaped
    * fingerprint from the decoded 8×8 intensity grid, LSH-banded
    * candidate pairs, Hamming verification — the image twin of SimHash
    * text near-dedup, REUSING its banding/verify machinery. Decode is the
    * [[decodeStub]] fake (deterministic from payload bytes), so identical
    * payloads hash identically and the pipeline is fully testable; a real
    * codec swap-in changes only the decode step.
    */
  def perceptualPairs(df: DataFrame, idCol: String, payloadCol: String, maxHamming: Int = 6, bands: Int = 8): DataFrame = {
    val features = decodeImages(df, idCol, payloadCol)
    // byte-level fingerprint (content-hash bits): identical payloads
    // collide; use [[perceptualPairsIO]] for true pixel-space similarity
    bandedHammingPairs(
      features.select(col(idCol).as("id"), col("content_hash").as("fp")), maxHamming, bands)
  }

  /** REAL perceptual near-dup pairs: fingerprints are [[aHash64]] over the
    * DECODED pixels, so visually-near images (re-encodes, slight noise)
    * pair even when their bytes differ completely — which no byte-level
    * hash can do. Undecodable payloads drop out. Same banding/verify
    * machinery and scale shape as [[perceptualPairs]].
    */
  def perceptualPairsIO(df: DataFrame, idCol: String, payloadCol: String, maxHamming: Int = 6, bands: Int = 8): DataFrame = {
    val ahash = udf((b: Array[Byte]) => aHash64(b))
    val fps = df.select(col(idCol).as("id"), ahash(col(payloadCol)).as("fp"))
      .where(col("fp").isNotNull)
    bandedHammingPairs(fps, maxHamming, bands)
  }

  /** Shared LSH tail: band the 64-bit fingerprints, bucket-join candidate
    * pairs, verify by exact Hamming distance. Shuffles (id, band, bucket)
    * only — fingerprints ride along as 8 bytes, payloads never move.
    */
  private def bandedHammingPairs(fps: DataFrame, maxHamming: Int, bands: Int): DataFrame = {
    import graft.functions.{HashFunctions => H}
    // banding's pigeonhole recall only covers Hamming ≤ bands-1: a larger
    // radius would silently miss qualifying pairs
    require(maxHamming < bands, s"maxHamming ($maxHamming) must be < bands ($bands) for full recall")
    val keyed = fps
      .select(col("id"), col("fp"), explode(H.simHashBands(col("fp"), bands)).as("bk"))
      .select(col("id"), col("fp"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    keyed.as("a")
      .join(keyed.as("b"), Seq("band", "bucket"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", H.hamming64(col("fp_a"), col("fp_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
