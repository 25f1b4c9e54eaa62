package graft.queries

import graft.multimodal.Dsp

/** DuckDB SQL generators for the spectral-audio oracles (q_audio_mfcc,
  * q_audio_spectral): replay [[graft.multimodal.Dsp]]'s windowed radix-2
  * FFT → power spectrum pipeline bit-for-bit over the `syntheticWavLong`
  * fixture reconstructed arithmetically from row ids, then the
  * query-specific feature tail.
  *
  * Exactness argument: every constant table (Hann window, bit-reversal,
  * per-stage twiddles, mel weights, DCT basis) is computed by the SAME
  * Scala code the engine runs and embedded as shortest-round-trip
  * double literals (E-notation, so DuckDB parses DOUBLE, never
  * DECIMAL); every float op is then the identical IEEE-754 sequence in
  * both engines — per-index butterflies (one product + one add each,
  * no reassociation) and `list_prepend(0.0)` left folds matching the
  * engine's accumulation order. The FFT/mel/DCT/centroid stages are
  * therefore bitwise reproducible; only `ln`/`exp` lean on libm-vs-Math
  * ulp parity, absorbed by the gates' round-6 (the q_perplexity
  * precedent). Note the engine computes the tables at runtime via
  * `java.lang.Math`, so cross-JVM bitwise identity assumes one JVM/arch
  * — true for local[*] and this harness; a heterogeneous cluster would
  * pin tables via broadcast instead.
  *
  * Oracle-authoring rules applied (see verify skill notes): constants
  * live in one `AS MATERIALIZED` CTE cross-joined per stage (no textual
  * re-evaluation), comprehensions never close over comprehension
  * variables in nested lambdas, stage outputs get distinct column names
  * (no lateral-alias shadowing).
  */
object DspSql {

  /** Shortest-round-trip double literal that DuckDB parses as DOUBLE:
    * `Double.toString` already round-trips; forcing E-notation avoids
    * the DECIMAL literal path (whose int64 scaling can lose the 17th
    * significant digit).
    */
  private def fmtD(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (s.indexOf('E') >= 0) s else s + "E0"
  }

  private def dList(vs: Array[Double]): String = vs.map(fmtD).mkString("[", ", ", "]")

  private def iList(vs: Array[Int]): String = vs.mkString("[", ", ", "]")

  /** The shared FFT pipeline over the `syntheticWavLong(doc_id)` fixture
    * (8000 Hz mono, `64 + doc_id mod 160` samples, frames of `n` with
    * hop `n`, partial tail drops): CTEs `consts` … `sp`, where `sp` is
    * `(doc_id, frame, pw)` with the one-sided power spectrum.
    */
  private def fftCtes(n: Int): String = {
    require(n > 0 && (n & (n - 1)) == 0, s"fftCtes: frameLen must be a power of two, got $n")
    val nBins = n / 2 + 1
    val stages = java.lang.Integer.numberOfTrailingZeros(n)
    val hw = Dsp.hann(n)
    val brev = Dsp.bitrev(n)
    val tw = Dsp.twiddles(n)

    val constCols =
      s"""    ${dList(hw)}::DOUBLE[] AS hw,
         |    ${iList(brev)} AS brev""".stripMargin +
        (0 until stages).map { s =>
          s",\n    ${dList(tw(s)._1)}::DOUBLE[] AS twr$s,\n    ${dList(tw(s)._2)}::DOUBLE[] AS twi$s"
        }.mkString

    // stage s: half-span h = 2^s; distinct column names per stage
    val stageCtes = (0 until stages).map { s =>
      val h = 1 << s
      val pr = s"re$s"; val pi = s"im$s"
      val nr = s"re${s + 1}"; val ni = s"im${s + 1}"
      s"""st${s + 1} AS (
         |  SELECT doc_id, frame,
         |    [CASE WHEN (i & $h) = 0
         |       THEN $pr[i+1] + (twr$s[i+1] * $pr[i+$h+1] - twi$s[i+1] * $pi[i+$h+1])
         |       ELSE $pr[i-$h+1] - (twr$s[i+1] * $pr[i+1] - twi$s[i+1] * $pi[i+1]) END
         |     FOR i IN range(0, $n)] AS $nr,
         |    [CASE WHEN (i & $h) = 0
         |       THEN $pi[i+1] + (twr$s[i+1] * $pi[i+$h+1] + twi$s[i+1] * $pr[i+$h+1])
         |       ELSE $pi[i-$h+1] - (twr$s[i+1] * $pi[i+1] + twi$s[i+1] * $pr[i+1]) END
         |     FOR i IN range(0, $n)] AS $ni
         |  FROM st$s, consts
         |)""".stripMargin
    }.mkString(",\n")

    val fr = s"re$stages"; val fi = s"im$stages"

    s"""consts AS MATERIALIZED (
       |  SELECT
       |$constCols
       |), p AS (
       |  SELECT doc_id, 64 + (doc_id % 160) AS nsmp FROM documents
       |), frames AS (
       |  SELECT doc_id, unnest(range(0, nsmp // $n)) AS frame FROM p
       |), sig AS (
       |  SELECT doc_id, frame,
       |    [CAST((doc_id * 31 + (frame * $n + t) * 17) % 65536 - 32768 AS BIGINT)
       |     FOR t IN range(0, $n)] AS smp
       |  FROM frames
       |), st0 AS (
       |  SELECT doc_id, frame,
       |    [(smp[brev[i+1]+1] / 32768.0) * hw[brev[i+1]+1] FOR i IN range(0, $n)] AS re0,
       |    [0.0E0 FOR i IN range(0, $n)] AS im0
       |  FROM sig, consts
       |),
       |$stageCtes,
       |sp AS (
       |  SELECT doc_id, frame,
       |    [$fr[k+1] * $fr[k+1] + $fi[k+1] * $fi[k+1] FOR k IN range(0, $nBins)] AS pw
       |  FROM st$stages
       |)""".stripMargin
  }

  /** SQL for the q_audio_mfcc gate: [[fftCtes]] then mel filterbank →
    * `ln(e + 1e-10)` → DCT-II, output
    * `(doc_id, frame, c0..c{nCoef-1}, log_energy)` rounded to 6 at the
    * aggregate edge only.
    */
  def mfccSql(frameLen: Int = 64, nMels: Int = 8, nCoef: Int = 4): String = {
    val nBins = frameLen / 2 + 1
    val weights = Dsp.melWeights(frameLen, 8000, nMels)
    val dct = Dsp.dctTable(nMels, nCoef)

    val melExprs = (0 until nMels).map { m =>
      s"""    ln(list_reduce(list_prepend(0.0E0,
         |      [(${dList(weights(m))}::DOUBLE[])[k+1] * pw[k+1] FOR k IN range(0, $nBins)]),
         |      (a, x) -> a + x) + 1e-10) AS lm$m""".stripMargin
    }.mkString(",\n")

    val dctExprs = (0 until nCoef).map { j =>
      val terms = (0 until nMels).map(m => s"${fmtD(dct(j)(m))} * lm$m").mkString("[", ", ", "]")
      s"  round(list_reduce(list_prepend(0.0E0, $terms), (a, x) -> a + x), 6) AS c$j"
    }.mkString(",\n")

    s"""WITH ${fftCtes(frameLen)}, mels AS (
       |  SELECT doc_id, frame,
       |    round(ln(list_reduce(list_prepend(0.0E0, pw), (a, x) -> a + x) + 1e-10), 6) AS log_energy,
       |$melExprs
       |  FROM sp
       |)
       |SELECT doc_id, CAST(frame AS INTEGER) AS frame,
       |$dctExprs,
       |  log_energy
       |FROM mels ORDER BY doc_id, frame""".stripMargin
  }

  /** SQL for the q_audio_spectral gate: [[fftCtes]] then spectral
    * centroid / bandwidth / 85% rolloff / flatness with the exact fold
    * orders of [[graft.multimodal.Dsp.spectralFrame]]. Bin `k`'s
    * frequency is `k * 8000.0 / frameLen` (the fixture's fixed rate);
    * the rolloff scan re-derives each prefix sum as a fold — a prefix of
    * the same left fold is bitwise the engine's running sum.
    */
  def spectralSql(frameLen: Int = 64): String = {
    val nBins = frameLen / 2 + 1
    val freq = s"CAST(k AS DOUBLE) * 8000.0E0 / $frameLen"
    s"""WITH ${fftCtes(frameLen)}, tot AS (
       |  SELECT doc_id, frame, pw,
       |    list_reduce(list_prepend(0.0E0, pw), (a, x) -> a + x) AS total,
       |    list_reduce(list_prepend(0.0E0,
       |      [($freq) * pw[k+1] FOR k IN range(0, $nBins)]), (a, x) -> a + x) AS wsum
       |  FROM sp
       |), cen AS (
       |  SELECT doc_id, frame, pw, total,
       |    CASE WHEN total > 0.0E0 THEN wsum / total ELSE 0.0E0 END AS centroid
       |  FROM tot
       |), shape AS (
       |  SELECT doc_id, frame, total, centroid,
       |    CASE WHEN total > 0.0E0 THEN sqrt(list_reduce(list_prepend(0.0E0,
       |      [pw[k+1] * ((($freq) - centroid) * (($freq) - centroid)) FOR k IN range(0, $nBins)]),
       |      (a, x) -> a + x) / total) ELSE 0.0E0 END AS bandwidth,
       |    CASE WHEN total > 0.0E0 THEN coalesce(list_filter(
       |      [CASE WHEN list_reduce(list_prepend(0.0E0, pw[1:k+1]), (a, x) -> a + x) >= 0.85E0 * total
       |         THEN ($freq) ELSE NULL END FOR k IN range(0, $nBins)],
       |      x -> x IS NOT NULL)[1], 0.0E0) ELSE 0.0E0 END AS rolloff,
       |    exp(list_reduce(list_prepend(0.0E0,
       |      [ln(pw[k+1] + 1e-12) FOR k IN range(0, $nBins)]), (a, x) -> a + x) / $nBins) /
       |    (list_reduce(list_prepend(0.0E0,
       |      [pw[k+1] + 1e-12 FOR k IN range(0, $nBins)]), (a, x) -> a + x) / $nBins) AS flatness
       |  FROM cen
       |)
       |SELECT doc_id, CAST(frame AS INTEGER) AS frame,
       |  round(centroid, 6) AS centroid, round(bandwidth, 6) AS bandwidth,
       |  round(rolloff, 6) AS rolloff, round(flatness, 6) AS flatness
       |FROM shape ORDER BY doc_id, frame""".stripMargin
  }
}
