package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub: deterministic features, schema contract") {
    val df = Seq((1L, "abc".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("id", "payload")
    val out = Multimodal.decodeImages(df, "id", "payload")
    assert(out.columns.toSeq == Seq("id", "byte_length", "content_hash", "mean_intensity", "feature_vec"))
    val rows = out.orderBy($"id").collect()
    assert(rows(0).getAs[Long]("byte_length") == 3)
    assert(rows(1).getAs[Long]("byte_length") == 0)
    assert(rows(1).getAs[Double]("mean_intensity") == 0.0)
    assert(rows(0).getAs[scala.collection.Seq[Double]]("feature_vec").length == 8)
    // determinism
    val again = Multimodal.decodeImages(df, "id", "payload").orderBy($"id").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("media table wrapper adds typed metadata struct") {
    val df = Seq((1L, "x".getBytes("UTF-8"))).toDF("id", "payload")
    val media = Multimodal.asMediaTable(df, "payload", "image/png")
    val meta = media.select($"media_meta.media_type").head().getString(0)
    assert(meta == "image/png")
  }

  test("resize stub: payload replaced, metadata dims updated, deterministic") {
    val df = Multimodal.asMediaTable(
      Seq((1L, "image-bytes-here".getBytes("UTF-8"))).toDF("id", "payload"), "payload", "image/png")
    val out = Multimodal.resizeImages(df, "payload", 64, 64)
    val row = out.head()
    assert(row.getAs[Array[Byte]]("payload").length == 64 * 64 / 256)
    val meta = out.select($"media_meta.width", $"media_meta.height").head()
    assert(meta.getInt(0) == 64 && meta.getInt(1) == 64)
    val again = Multimodal.resizeImages(df, "payload", 64, 64).head()
    assert(row.getAs[Array[Byte]]("payload").toSeq == again.getAs[Array[Byte]]("payload").toSeq)
  }

  test("audio feature stub: schema contract, rms bounds, 13-dim vector") {
    val df = Seq((1L, "audio-bytes".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("id", "payload")
    val out = Multimodal.audioFeatures(df, "id", "payload").orderBy($"id").collect()
    assert(out(0).getAs[scala.collection.Seq[Double]]("mfcc_vec").length == 13)
    val rms = out(0).getAs[Double]("rms")
    assert(rms > 0.0 && rms <= 1.0)
    assert(out(1).getAs[Double]("rms") == 0.0)
  }

  test("frame sampling emits n deterministic rows per input") {
    val df = Seq((1L, "video-bytes".getBytes("UTF-8"))).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "id", "payload", 4)
    assert(frames.count() == 4)
    assert(frames.select($"frame_index").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("content dedup keeps lowest id per identical payload") {
    val df = Seq(
      (3L, "img-A".getBytes("UTF-8")),
      (1L, "img-A".getBytes("UTF-8")), // dup of 3 with lower id
      (2L, "img-B".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val out = Multimodal.dedupByContent(df, "id", "payload")
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L))
  }

  test("perceptual pairs: identical payloads pair at hamming 0, distinct don't") {
    val df = Seq(
      (1L, "same-bytes-same-image".getBytes("UTF-8")),
      (2L, "same-bytes-same-image".getBytes("UTF-8")),
      (3L, "completely different content".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val pairs = Multimodal.perceptualPairs(df, "id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 0)))
  }

  test("REAL decode: ImageIO round trip reproduces the generator formula exactly") {
    val ids = Seq(0L, 1L, 17L, 255L, 4096L, 99999L)
    val df = ids.map(id => (id, Multimodal.syntheticPng(id))).toDF("id", "payload")
    val out = Multimodal.decodeImagesIO(df, "id", "payload").orderBy($"id").collect()
    assert(out.length == ids.length)
    out.foreach { r =>
      val id = r.getLong(0)
      val w = 1 + (id % 16).toInt
      val h = 1 + ((id / 16) % 16).toInt
      assert(r.getInt(1) == w, s"width for $id")
      assert(r.getInt(2) == h, s"height for $id")
      assert(r.getInt(3) == 1, s"channels for $id")
      val want = (for (i <- 0 until h; j <- 0 until w) yield (id * 31 + i * 7 + j * 13) % 256)
        .sum.toDouble / (w * h)
      // PNG is lossless: the decoded mean is the formula mean EXACTLY
      assert(r.getDouble(4) == want, s"mean for $id: ${r.getDouble(4)} != $want")
    }
  }

  test("REAL decode: JPEG payloads decode (lossy - dims and channels only); garbage is dropped") {
    // a real JPEG via ImageIO
    val img = new java.awt.image.BufferedImage(12, 5, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 5; x <- 0 until 12) img.setRGB(x, y, (x * 20) << 16 | (y * 50) << 8)
    val jbytes = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, jbytes),
      (2L, "definitely not an image".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val out = Multimodal.decodeImagesIO(df, "id", "payload").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L)) // undecodable rows dropped
    assert(out.head.getInt(1) == 12 && out.head.getInt(2) == 5 && out.head.getInt(3) == 3)
  }

  test("REAL audio decode: WAV round trip reproduces the PCM formula exactly") {
    val ids = Seq(0L, 1L, 7L, 31L, 63L, 12345L)
    val df = ids.map(id => (id, Multimodal.syntheticWav(id))).toDF("id", "payload")
    val out = Multimodal.decodeAudioIO(df, "id", "payload").orderBy($"id").collect()
    assert(out.length == ids.length)
    out.foreach { r =>
      val id = r.getLong(0)
      val rate = 8000 + (id % 8).toInt * 1000
      val n = 32 + (id % 32).toInt
      assert(r.getInt(1) == rate, s"rate for $id")
      assert(r.getInt(2) == 1 && r.getInt(3) == 16)
      assert(r.getLong(4) == n, s"frames for $id")
      assert(r.getLong(5) == n * 1000L / rate, s"duration for $id")
      val want = math.sqrt((0 until n).map { t =>
        val x = (((id * 31 + t * 17) % 65536) - 32768) / 32768.0
        x * x
      }.foldLeft(0.0)(_ + _) / n)
      assert(r.getDouble(6) == want, s"rms for $id: ${r.getDouble(6)} != $want")
    }
    // garbage / empty / null payloads are dropped, not errors
    val junk = Seq((1L, "not audio".getBytes("UTF-8")), (2L, Array.emptyByteArray),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    assert(Multimodal.decodeAudioIO(junk, "id", "payload").isEmpty)
  }

  test("REAL perceptual pairs: noisy re-encode of the same image pairs, different image doesn't") {
    def pngOf(pixels: (Int, Int) => Int, w: Int = 32, h: Int = 32): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, pixels(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base: (Int, Int) => Int = (x, y) => (x * 8 + y * 3) % 256
    val noisy: (Int, Int) => Int = (x, y) => math.min(255, base(x, y) + (x + y) % 2) // ±1 noise
    val other: (Int, Int) => Int = (x, y) => ((x / 4 + y / 4) % 2) * 255
    // bytes of base vs noisy differ completely; pixels barely do
    val df = Seq((1L, pngOf(base)), (2L, pngOf(noisy)), (3L, pngOf(other)),
      (4L, "not an image".getBytes("UTF-8"))).toDF("id", "payload")
    val pairs = Multimodal.perceptualPairsIO(df, "id", "payload", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "visually-near pair missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "structurally different image paired")
    // the byte-level variant CANNOT find it (bytes differ) — the real
    // decode is what buys pixel-space similarity
    val bytePairs = Multimodal.perceptualPairs(df.where($"id" < 3), "id", "payload", maxHamming = 6)
      .collect()
    assert(bytePairs.isEmpty)
  }

  test("REAL resize: 4x4 box means exact, metadata updated, undecodable passes through null") {
    val id = 37L
    val df = Seq((id, Multimodal.syntheticPng(id)), (99L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload")
    val resized = Multimodal.resizeImagesIO(df, "payload", width = 4, height = 4)
    val meta = resized.select($"media_meta.width", $"media_meta.height").head
    assert(meta.getInt(0) == 4 && meta.getInt(1) == 4)
    assert(resized.where($"id" === 99L).select($"payload").head.isNullAt(0))
    val out = Multimodal.decodeImagesIO(resized.where($"id" === id), "id", "payload").head
    assert(out.getInt(1) == 4 && out.getInt(2) == 4 && out.getInt(3) == 1)
    // exact expectation: integer box means of the generator formula
    val w = 1 + (id % 16).toInt; val h = 1 + ((id / 16) % 16).toInt
    val sums = Array.fill(16)(0L); val counts = Array.fill(16)(0L)
    for (i <- 0 until h; j <- 0 until w) {
      val cell = (i * 4 / h) * 4 + (j * 4 / w)
      sums(cell) += (id * 31 + i * 7 + j * 13) % 256
      counts(cell) += 1
    }
    val want = (0 until 16).map(k => if (counts(k) == 0) 0L else sums(k) / counts(k)).sum / 16.0
    assert(out.getDouble(4) == want, s"${out.getDouble(4)} != $want")
  }

  test("REAL aHash64: identical images collide, small perturbation stays within a few bits") {
    def pngOf(pixels: (Int, Int) => Int, w: Int = 32, h: Int = 32): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, pixels(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base: (Int, Int) => Int = (x, y) => (x * 8 + y * 3) % 256
    val h1 = Multimodal.aHash64(pngOf(base)).get
    val h2 = Multimodal.aHash64(pngOf(base)).get
    assert(h1 == h2)
    // perturb ONE pixel slightly: at most a couple of grid cells flip
    val perturbed: (Int, Int) => Int = (x, y) => if (x == 5 && y == 5) (base(x, y) + 4) % 256 else base(x, y)
    val h3 = Multimodal.aHash64(pngOf(perturbed)).get
    assert(java.lang.Long.bitCount(h1 ^ h3) <= 4, s"perturbation moved ${java.lang.Long.bitCount(h1 ^ h3)} bits")
    // a structurally different image lands far away
    val other: (Int, Int) => Int = (x, y) => ((x / 4 + y / 4) % 2) * 255
    val h4 = Multimodal.aHash64(pngOf(other)).get
    assert(java.lang.Long.bitCount(h1 ^ h4) > 8)
    assert(Multimodal.aHash64("junk".getBytes("UTF-8")).isEmpty)
  }

  test("REAL audio features: zcr/peak/mean_abs/window RMS exact from the PCM formula") {
    val id = 11L // n = 32 + 11 = 43, rate irrelevant here
    val df = Seq((id, Multimodal.syntheticWav(id)), (99L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.audioFeaturesIO(df, "id", "payload", nWindows = 4)
      .orderBy($"w").collect()
    assert(out.length == 4 && out.forall(_.getLong(0) == id))
    val n = 32 + (id % 32).toInt
    val s = Array.tabulate(n)(t => ((id * 31 + t * 17) % 65536).toInt - 32768)
    val zcr = (1 until n).count(t => (s(t - 1) < 0) != (s(t) < 0)).toLong
    val peak = s.map(math.abs).max / 32768.0
    val meanAbs = (s.map(v => math.abs(v).toLong).sum.toDouble / 32768.0) / n
    out.foreach { r =>
      val w = r.getInt(1)
      val from = w * n / 4; val until = (w + 1) * n / 4
      var sq = 0.0
      (from until until).foreach { i => val x = s(i) / 32768.0; sq += x * x }
      assert(r.getDouble(2) == math.sqrt(sq / math.max(until - from, 1)))
      assert(r.getLong(3) == zcr)
      assert(r.getDouble(4) == peak)
      assert(r.getDouble(5) == meanAbs)
    }
  }

  test("REAL video decode: AVI round trip reproduces the generator formula exactly") {
    val ids = Seq(0L, 1L, 7L, 13L, 47L, 63L)
    val avi = udf((id: Long) => Multimodal.syntheticAvi(id))
    val df = ids.toDF("id").select($"id", avi($"id").as("payload"))
    val out = Multimodal.decodeVideoIO(df, "id", "payload").orderBy($"id").collect()
    assert(out.length == ids.length)
    out.foreach { r =>
      val id = r.getLong(0)
      val w = 1 + (id % 8).toInt; val h = 1 + ((id / 8) % 8).toInt
      val fps = 5 + (id % 10).toInt; val nf = 1 + (id % 6).toInt
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getInt(3) == fps && r.getInt(4) == 1)
      assert(r.getLong(5) == nf)
      assert(r.getLong(6) == nf.toLong * 1000 / fps)
      // exact all-frame pixel mean from the formula (lossless BI_RGB)
      var sum = 0L
      for (f <- 0 until nf; i <- 0 until h; j <- 0 until w)
        sum += (id * 31 + f * 101 + i * 7 + j * 13) % 256
      assert(r.getDouble(7) == sum.toDouble / (nf.toLong * w * h), s"id=$id mean mismatch")
    }
    // undecodable payloads drop
    val mixed = Seq((1L, Multimodal.syntheticAvi(1L)), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload")
    assert(Multimodal.decodeVideoIO(mixed, "id", "payload").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("REAL video perceptual pairs: noisy re-render pairs, different footage doesn't") {
    import graft.multimodal.Avi
    val w = 32; val h = 24; val nf = 6
    def gradient(seed: Int, noise: Int): Seq[Array[Byte]] =
      (0 until nf).map { f =>
        Array.tabulate(w * h) { k =>
          val x = k % w; val y = k / w
          val base = (x * 8 + y * 3 + f * 11 + seed) % 256
          val jig = if (noise != 0 && (x + y * w) % 97 == 0) noise else 0
          ((base + jig) % 256).toByte
        }
      }
    val checker: Seq[Array[Byte]] = (0 until nf).map { f =>
      Array.tabulate(w * h)(k => ((((k % w) / 4 + (k / w) / 4 + f) % 2) * 255).toByte)
    }
    val df = Seq(
      (1L, Avi.encode(w, h, 10, gradient(0, 0))),
      (2L, Avi.encode(w, h, 10, gradient(0, 3))), // same footage, slight noise
      (3L, Avi.encode(w, h, 10, checker)), // structurally different
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val pairs = Multimodal.videoPerceptualPairs(df, "id", "payload", n = 4, minMatches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "noisy re-render of the same footage missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "different footage paired")
    // per-frame hashes align with the image-path kernel: a flat frame
    // hashes identically through both entry points
    val hashes = Multimodal.videoFrameHashes(df.where($"id" === 1L), "id", "payload", n = 4)
      .collect()
    assert(hashes.length == 4)
    assert(hashes.map(_.getInt(1)).distinct.length == 4) // sample_idx 0..3
  }

  test("REAL frame sampling: evenly-spaced distinct frames, per-frame means exact") {
    val id = 29L // nf = 1 + 29%6 = 6 frames, w = 6, h = 4
    val df = Seq((id, Multimodal.syntheticAvi(id)), (99L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload")
    val nf = 1 + (id % 6).toInt
    val w = 1 + (id % 8).toInt; val h = 1 + ((id / 8) % 8).toInt
    // n < nf: k = n samples at strictly increasing frame_no
    val out = Multimodal.sampleFramesIO(df, "id", "payload", n = 4).orderBy($"sample_idx").collect()
    assert(out.length == 4 && out.forall(_.getLong(0) == id))
    val frameNos = out.map(_.getInt(2)).toSeq
    assert(frameNos == (0 until 4).map(s => s * nf / 4))
    assert(frameNos.distinct == frameNos)
    out.foreach { r =>
      val f = r.getInt(2)
      var sum = 0L
      for (i <- 0 until h; j <- 0 until w) sum += (id * 31 + f * 101 + i * 7 + j * 13) % 256
      assert(r.getDouble(3) == sum.toDouble / (w * h))
    }
    // n > nf: capped at nf rows, frame_no = 0..nf-1
    val all = Multimodal.sampleFramesIO(df.where($"id" === id), "id", "payload", n = 100)
      .orderBy($"sample_idx").collect()
    assert(all.length == nf)
    assert(all.map(_.getInt(2)).toSeq == (0 until nf))
  }
}
