package graft

import graft.multimodal.{Dsp, Multimodal}
import org.apache.spark.sql.functions._

class DspSpec extends SparkSpec {
  import spark.implicits._

  private def naiveDft(re: Array[Double], im: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n)
    val oi = new Array[Double](n)
    for (k <- 0 until n) {
      var sr = 0.0; var si = 0.0
      for (t <- 0 until n) {
        val a = -2.0 * math.Pi * k * t / n
        val c = math.cos(a); val s = math.sin(a)
        sr += re(t) * c - im(t) * s
        si += re(t) * s + im(t) * c
      }
      or(k) = sr; oi(k) = si
    }
    (or, oi)
  }

  test("fft matches a naive DFT on deterministic pseudo-random input") {
    for (n <- Seq(8, 64, 256)) {
      val tables = Dsp.twiddles(n)
      val re = Array.tabulate(n)(t => math.sin(t * 0.7) + 0.3 * math.cos(t * 2.1))
      val im = Array.tabulate(n)(t => 0.1 * math.sin(t * 1.3))
      val (fr, fi) = Dsp.fft(re, im, tables)
      val (dr, di) = naiveDft(re, im)
      for (k <- 0 until n) {
        assert(math.abs(fr(k) - dr(k)) < 1e-9, s"n=$n re[$k]: ${fr(k)} vs ${dr(k)}")
        assert(math.abs(fi(k) - di(k)) < 1e-9, s"n=$n im[$k]: ${fi(k)} vs ${di(k)}")
      }
    }
  }

  test("fft known transforms: impulse is flat, constant is a DC spike") {
    val n = 64
    val tables = Dsp.twiddles(n)
    val impulse = new Array[Double](n); impulse(0) = 1.0
    val (ir, ii) = Dsp.fft(impulse, new Array[Double](n), tables)
    for (k <- 0 until n) {
      assert(math.abs(ir(k) - 1.0) < 1e-12 && math.abs(ii(k)) < 1e-12, s"impulse bin $k")
    }
    val const = Array.fill(n)(1.0)
    val (cr, ci) = Dsp.fft(const, new Array[Double](n), tables)
    assert(math.abs(cr(0) - n) < 1e-9)
    for (k <- 1 until n) {
      assert(math.abs(cr(k)) < 1e-9 && math.abs(ci(k)) < 1e-9, s"const bin $k")
    }
  }

  test("fft satisfies Parseval's theorem") {
    val n = 128
    val tables = Dsp.twiddles(n)
    val re = Array.tabulate(n)(t => math.sin(t * 0.37) * (1 + t % 5))
    val (fr, fi) = Dsp.fft(re, new Array[Double](n), tables)
    val timeE = re.map(x => x * x).sum
    val freqE = (0 until n).map(k => fr(k) * fr(k) + fi(k) * fi(k)).sum / n
    assert(math.abs(timeE - freqE) / timeE < 1e-12)
  }

  test("mel filterbank: triangles cover the band, weights in [0,1]") {
    val w = Dsp.melWeights(64, 8000, 8)
    assert(w.length == 8 && w.forall(_.length == 33))
    assert(w.flatten.forall(x => x >= 0.0 && x <= 1.0))
    // every filter has some mass, and interior bins are covered by at least one filter
    assert(w.forall(_.sum > 0.0))
    val colSums = (0 until 33).map(k => w.map(_(k)).sum)
    assert(colSums.slice(2, 31).forall(_ > 0.0), s"uncovered interior bin: $colSums")
  }

  test("dct basis row 0 is all-ones; rows are orthogonal") {
    val d = Dsp.dctTable(8, 4)
    assert(d(0).forall(v => math.abs(v - 1.0) < 1e-12))
    for (a <- 0 until 4; b <- 0 until 4 if a != b) {
      val dot = (0 until 8).map(m => d(a)(m) * d(b)(m)).sum
      assert(math.abs(dot) < 1e-9, s"rows $a,$b not orthogonal: $dot")
    }
  }

  test("mfccIO: real WAV decode, frame count from sample count, drops undecodable") {
    val df = Seq(
      (0L, Multimodal.syntheticWavLong(0L)),   // 64 samples -> 1 frame
      (100L, Multimodal.syntheticWavLong(100L)), // 164 samples -> 2 frames
      (159L, Multimodal.syntheticWavLong(159L)), // 223 samples -> 3 frames
      (7L, "not audio".getBytes("UTF-8")),
      (8L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val out = Multimodal.mfccIO(df, "id", "payload", frameLen = 64, nMels = 8, nCoef = 4)
    assert(out.columns.toSeq == Seq("id", "frame", "c0", "c1", "c2", "c3", "log_energy"))
    val byId = out.collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byId == Map(0L -> 1, 100L -> 2, 159L -> 3))
    // coefficients are finite and frames are 0-based contiguous
    val frames = out.where($"id" === 159L).select($"frame").as[Int].collect().sorted
    assert(frames.toSeq == Seq(0, 1, 2))
    assert(out.select($"c0", $"c1", $"c2", $"c3", $"log_energy").collect()
      .forall(r => (0 until 5).forall(i => !r.getDouble(i).isNaN && !r.getDouble(i).isInfinite)))
  }

  test("spectralFrame: pure tone centers the centroid on its bin, tight bandwidth") {
    val n = 64
    val hw = Array.fill(n)(1.0) // rectangular window keeps the tone in one bin
    val tables = Dsp.twiddles(n)
    // bin-8 tone at rate 8000 -> 1000 Hz, int16-scaled
    val samples = Array.tabulate(n)(t => (math.cos(2.0 * math.Pi * 8 * t / n) * 16384).toInt)
    val power = Dsp.powerSpectrum(samples, hw, tables)
    val (centroid, bandwidth, rolloff, flatness) = Dsp.spectralFrame(power, 8000, n)
    assert(math.abs(centroid - 1000.0) < 1.0, s"centroid=$centroid")
    assert(bandwidth < 50.0, s"bandwidth=$bandwidth")
    assert(math.abs(rolloff - 1000.0) < 1e-9, s"rolloff=$rolloff")
    assert(flatness < 0.01, s"tone must have near-zero flatness: $flatness")
    // white-ish flat spectrum: flatness near 1
    val flatPower = Array.fill(n / 2 + 1)(2.5)
    val f2 = Dsp.spectralFrame(flatPower, 8000, n)._4
    assert(math.abs(f2 - 1.0) < 1e-9, s"flat spectrum flatness=$f2")
    // all-zero frame: zeroed shape features
    val z = Dsp.spectralFrame(Array.fill(n / 2 + 1)(0.0), 8000, n)
    assert(z._1 == 0.0 && z._2 == 0.0 && z._3 == 0.0)
  }

  test("spectralFeaturesIO frames like mfccIO and drops undecodable payloads") {
    val df = Seq(
      (100L, Multimodal.syntheticWavLong(100L)), // 164 samples -> 2 frames
      (7L, "not audio".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val out = Multimodal.spectralFeaturesIO(df, "id", "payload", frameLen = 64)
    assert(out.columns.toSeq == Seq("id", "frame", "centroid", "bandwidth", "rolloff", "flatness"))
    val rows = out.orderBy($"frame").collect()
    assert(rows.length == 2 && rows.forall(_.getLong(0) == 100L))
    assert(rows.forall(r => (2 to 5).forall(i => !r.getDouble(i).isNaN)))
    assert(rows.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 4000.0), "rolloff within Nyquist")
  }

  test("mfccIO is bit-identical across partitionings") {
    val ids = (0L until 40L).map(i => (i, Multimodal.syntheticWavLong(i)))
    val a = Multimodal.mfccIO(ids.toDF("id", "payload").repartition(3), "id", "payload")
      .orderBy($"id", $"frame").collect().map(_.toSeq)
    val b = Multimodal.mfccIO(ids.toDF("id", "payload").repartition(17), "id", "payload")
      .orderBy($"id", $"frame").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
