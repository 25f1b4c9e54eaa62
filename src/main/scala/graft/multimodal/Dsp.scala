package graft.multimodal

/** Deterministic DSP kernels for spectral audio features: an
  * own-implemented iterative radix-2 FFT (the JDK ships no FFT), mel
  * filterbank weights, and a DCT-II table — everything MFCC needs.
  *
  * Reference behavior target: spectral feature extraction over decoded
  * PCM (the reference's columnar stores carry audio cells as opaque
  * binary + metadata; feature extraction is downstream compute — see
  * `org.knime.core.data.columnar` value semantics). The kernels here are
  * written for CROSS-ENGINE BIT-EXACTNESS: every stage is a fixed
  * sequence of IEEE-754 double ops with no reassociation, so a SQL
  * oracle that replays the same op order over the same embedded
  * constants reproduces the transform bit-for-bit (see
  * `graft.queries.DspSql`). That is why [[fft]] uses full-length
  * per-stage twiddle tables and a per-index butterfly formula instead of
  * the usual in-place `t = w*x(i+h)` form: each output element is one
  * product and one add/subtract in a deterministic order, trivially
  * mirrored by a SQL list comprehension. (The two forms are bitwise
  * equivalent — the bottom lane's product reuses the same operand values
  * — but the per-index form IS the shared spec.)
  *
  * Scale note: all of this is scan-local per-row compute (no shuffle);
  * tables for a given (n, rate, mels) are computed once per partition
  * and reused across rows.
  */
object Dsp {

  /** Hann window, `w(t) = 0.5 − 0.5·cos(2πt/n)`. */
  def hann(n: Int): Array[Double] =
    Array.tabulate(n)(t => 0.5 - 0.5 * math.cos(2.0 * math.Pi * t / n))

  /** Bit-reversal permutation for a power-of-two `n`. */
  def bitrev(n: Int): Array[Int] = {
    require(n > 0 && (n & (n - 1)) == 0, s"bitrev: n must be a power of two, got $n")
    val bits = java.lang.Integer.numberOfTrailingZeros(n)
    Array.tabulate(n)(i => java.lang.Integer.reverse(i) >>> (32 - bits))
  }

  /** Per-stage full-length twiddle tables for a size-`n` DIT FFT.
    * Stage `s` (half-span `h = 2^s`) entry `i` is
    * `exp(−iπ·(i mod h)/h)` — the same value at a butterfly's top and
    * bottom index, so the per-index formula needs no index adjustment.
    * Returns `(cos, sin)` arrays per stage, stages ordered `h = 1, 2, …,
    * n/2`.
    */
  def twiddles(n: Int): Array[(Array[Double], Array[Double])] = {
    require(n > 0 && (n & (n - 1)) == 0, s"twiddles: n must be a power of two, got $n")
    val bits = java.lang.Integer.numberOfTrailingZeros(n)
    Array.tabulate(bits) { s =>
      val h = 1 << s
      val re = new Array[Double](n)
      val im = new Array[Double](n)
      var i = 0
      while (i < n) {
        val angle = -math.Pi * (i & (h - 1)) / h
        re(i) = math.cos(angle)
        im(i) = math.sin(angle)
        i += 1
      }
      (re, im)
    }
  }

  /** Radix-2 DIT FFT over `(re, im)` (length a power of two). Inputs are
    * in NATURAL order; the bit-reversal permutation happens inside.
    * Returns new arrays; inputs are not mutated. Op order is the shared
    * cross-engine spec — do not "optimize" the butterfly without
    * updating [[graft.queries.DspSql]] in lockstep.
    */
  def fft(reIn: Array[Double], imIn: Array[Double], tables: Array[(Array[Double], Array[Double])]): (Array[Double], Array[Double]) = {
    val n = reIn.length
    require(imIn.length == n, s"fft: re/im length mismatch ($n vs ${imIn.length})")
    val rev = bitrev(n)
    var re = Array.tabulate(n)(i => reIn(rev(i)))
    var im = Array.tabulate(n)(i => imIn(rev(i)))
    var s = 0
    var h = 1
    while (h < n) {
      val twr = tables(s)._1
      val twi = tables(s)._2
      val nr = new Array[Double](n)
      val ni = new Array[Double](n)
      var i = 0
      while (i < n) {
        if ((i & h) == 0) {
          nr(i) = re(i) + (twr(i) * re(i + h) - twi(i) * im(i + h))
          ni(i) = im(i) + (twr(i) * im(i + h) + twi(i) * re(i + h))
        } else {
          nr(i) = re(i - h) - (twr(i) * re(i) - twi(i) * im(i))
          ni(i) = im(i - h) - (twr(i) * im(i) + twi(i) * re(i))
        }
        i += 1
      }
      re = nr
      im = ni
      h <<= 1
      s += 1
    }
    (re, im)
  }

  /** HTK-style mel scale. */
  def mel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)

  def melInv(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank: `nMels` filters over the `nBins =
    * frameLen/2 + 1` one-sided power-spectrum bins of a `frameLen`-point
    * FFT at `sampleRate`. Returns `nMels` rows of `nBins` weights
    * (zeros outside each triangle, so energy folds can run over ALL bins
    * in a fixed order).
    */
  def melWeights(frameLen: Int, sampleRate: Int, nMels: Int): Array[Array[Double]] = {
    require(nMels >= 1, s"melWeights: nMels must be >= 1, got $nMels")
    val nBins = frameLen / 2 + 1
    val melLo = 0.0
    val melHi = mel(sampleRate / 2.0)
    // nMels + 2 boundary frequencies, equally spaced on the mel scale
    val pts = Array.tabulate(nMels + 2)(m => melInv(melLo + (melHi - melLo) * m / (nMels + 1)))
    Array.tabulate(nMels) { m0 =>
      val fLo = pts(m0); val fC = pts(m0 + 1); val fHi = pts(m0 + 2)
      Array.tabulate(nBins) { k =>
        val fk = k.toDouble * sampleRate / frameLen
        val up = (fk - fLo) / (fC - fLo)
        val down = (fHi - fk) / (fHi - fC)
        math.max(0.0, math.min(up, down))
      }
    }
  }

  /** DCT-II basis, `dct(j)(m) = cos(π·j·(m + 0.5)/nMels)` for `j <
    * nCoef` output coefficients over `nMels` log-energies.
    */
  def dctTable(nMels: Int, nCoef: Int): Array[Array[Double]] =
    Array.tabulate(nCoef)(j => Array.tabulate(nMels)(m => math.cos(math.Pi * j * (m + 0.5) / nMels)))

  /** One-sided power spectrum of a Hann-windowed int16 frame — the
    * shared front half of [[mfccFrame]] and [[spectralFrame]]; op order
    * is the cross-engine spec (window product, FFT stages, `re² + im²`).
    */
  def powerSpectrum(samples: Array[Int], hw: Array[Double],
      tables: Array[(Array[Double], Array[Double])]): Array[Double] = {
    val n = samples.length
    val re0 = new Array[Double](n)
    var t = 0
    while (t < n) { re0(t) = (samples(t) / 32768.0) * hw(t); t += 1 }
    val (re, im) = fft(re0, new Array[Double](n), tables)
    val nBins = n / 2 + 1
    val power = new Array[Double](nBins)
    var k = 0
    while (k < nBins) { power(k) = re(k) * re(k) + im(k) * im(k); k += 1 }
    power
  }

  /** Spectral shape features of one frame's power spectrum: centroid
    * (power-weighted mean frequency), bandwidth (power-weighted std dev
    * around the centroid), rolloff (lowest bin frequency where the
    * cumulative power reaches 85% of the total), flatness
    * (geometric / arithmetic mean ratio over `p + 1e-12`). All folds run
    * in ascending bin order — the SQL oracle's accumulation order
    * ([[graft.queries.DspSql.spectralSql]]); zero-power frames yield
    * all-zero centroid/bandwidth/rolloff.
    */
  def spectralFrame(power: Array[Double], sampleRate: Int, frameLen: Int): (Double, Double, Double, Double) = {
    val nBins = power.length
    var total = 0.0
    var k = 0
    while (k < nBins) { total += power(k); k += 1 }
    var wsum = 0.0
    k = 0
    while (k < nBins) { wsum += (k.toDouble * sampleRate / frameLen) * power(k); k += 1 }
    val centroid = if (total > 0.0) wsum / total else 0.0
    var vsum = 0.0
    k = 0
    while (k < nBins) {
      val f = k.toDouble * sampleRate / frameLen
      vsum += power(k) * ((f - centroid) * (f - centroid))
      k += 1
    }
    val bandwidth = if (total > 0.0) math.sqrt(vsum / total) else 0.0
    val thresh = 0.85 * total
    var rolloff = 0.0
    if (total > 0.0) {
      var cum = 0.0
      var found = false
      k = 0
      while (k < nBins && !found) {
        cum += power(k)
        if (cum >= thresh) { rolloff = k.toDouble * sampleRate / frameLen; found = true }
        k += 1
      }
    }
    var lsum = 0.0
    var asum = 0.0
    k = 0
    while (k < nBins) {
      lsum += math.log(power(k) + 1e-12)
      asum += power(k) + 1e-12
      k += 1
    }
    val flatness = math.exp(lsum / nBins) / (asum / nBins)
    (centroid, bandwidth, rolloff, flatness)
  }

  /** MFCC of one windowed frame: power spectrum of the Hann-windowed
    * normalized samples, mel energies as fixed-order folds over all
    * bins, `ln(e + 1e-10)`, DCT-II. Returns `(coeffs, logEnergy)`.
    * `samples` are raw int16 values; every float op's order matches
    * [[graft.queries.DspSql.mfccSql]] exactly.
    */
  def mfccFrame(samples: Array[Int], hw: Array[Double], tables: Array[(Array[Double], Array[Double])],
                weights: Array[Array[Double]], dct: Array[Array[Double]]): (Array[Double], Double) = {
    val n = samples.length
    val power = powerSpectrum(samples, hw, tables)
    val nBins = n / 2 + 1
    var energy = 0.0
    var k = 0
    while (k < nBins) { energy += power(k); k += 1 }
    val logEnergy = math.log(energy + 1e-10)
    val nMels = weights.length
    val logMel = new Array[Double](nMels)
    var m = 0
    while (m < nMels) {
      var e = 0.0
      k = 0
      while (k < nBins) { e += weights(m)(k) * power(k); k += 1 }
      logMel(m) = math.log(e + 1e-10)
      m += 1
    }
    val nCoef = dct.length
    val coeffs = new Array[Double](nCoef)
    var j = 0
    while (j < nCoef) {
      var c = 0.0
      m = 0
      while (m < nMels) { c += dct(j)(m) * logMel(m); m += 1 }
      coeffs(j) = c
      j += 1
    }
    (coeffs, logEnergy)
  }
}
