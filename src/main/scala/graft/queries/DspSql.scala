package graft.queries

import graft.multimodal.Dsp

/** DuckDB SQL generator for the MFCC oracle (q_audio_mfcc): replays
  * [[graft.multimodal.Dsp]]'s windowed radix-2 FFT → power spectrum →
  * mel filterbank → log → DCT-II pipeline bit-for-bit over the
  * `syntheticWavLong` fixture reconstructed arithmetically from row ids.
  *
  * Exactness argument: every constant table (Hann window, bit-reversal,
  * per-stage twiddles, mel weights, DCT basis) is computed by the SAME
  * Scala code the engine runs and embedded as shortest-round-trip
  * double literals (E-notation, so DuckDB parses DOUBLE, never
  * DECIMAL); every float op is then the identical IEEE-754 sequence in
  * both engines — per-index butterflies (one product + one add each,
  * no reassociation) and `list_prepend(0.0)` left folds matching the
  * engine's accumulation order. The FFT/mel/DCT stages are therefore
  * bitwise reproducible; only the final `ln` leans on libm-vs-Math ulp
  * parity, absorbed by the gate's round-6 (the q_perplexity precedent).
  * Note the engine computes the tables at runtime via `java.lang.Math`,
  * so cross-JVM bitwise identity assumes one JVM/arch — true for
  * local[*] and this harness; a heterogeneous cluster would pin tables
  * via broadcast instead.
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

  /** SQL for the q_audio_mfcc gate over the `documents` table: payload =
    * `syntheticWavLong(doc_id)` (8000 Hz mono, `64 + doc_id mod 160`
    * samples), frames of `frameLen` with hop `frameLen` (partial tail
    * drops), output `(doc_id, frame, c0..c{nCoef-1}, log_energy)`
    * rounded to 6 at the aggregate edge only.
    */
  def mfccSql(frameLen: Int = 64, nMels: Int = 8, nCoef: Int = 4): String = {
    require(frameLen > 0 && (frameLen & (frameLen - 1)) == 0, s"mfccSql: frameLen must be a power of two, got $frameLen")
    val n = frameLen
    val nBins = n / 2 + 1
    val stages = java.lang.Integer.numberOfTrailingZeros(n)
    val hw = Dsp.hann(n)
    val brev = Dsp.bitrev(n)
    val tw = Dsp.twiddles(n)
    val weights = Dsp.melWeights(n, 8000, nMels)
    val dct = Dsp.dctTable(nMels, nCoef)

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

    val melExprs = (0 until nMels).map { m =>
      s"""    ln(list_reduce(list_prepend(0.0E0,
         |      [(${dList(weights(m))}::DOUBLE[])[k+1] * pw[k+1] FOR k IN range(0, $nBins)]),
         |      (a, x) -> a + x) + 1e-10) AS lm$m""".stripMargin
    }.mkString(",\n")

    val dctExprs = (0 until nCoef).map { j =>
      val terms = (0 until nMels).map(m => s"${fmtD(dct(j)(m))} * lm$m").mkString("[", ", ", "]")
      s"  round(list_reduce(list_prepend(0.0E0, $terms), (a, x) -> a + x), 6) AS c$j"
    }.mkString(",\n")

    s"""WITH consts AS MATERIALIZED (
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
       |), mels AS (
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
}
