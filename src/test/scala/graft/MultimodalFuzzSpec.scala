// lives in the multimodal package to reach the private[multimodal]
// decode kernels directly (the UDF wrappers add nothing to the contract)
package graft.multimodal

/** Fuzz the non-MP4 codec parsers' defensive contracts (same method as
  * Mp4FuzzSpec / ArrowIpcFuzzSpec): decodeImageIO / decodeAudio /
  * Avi.decode must return Some/None and never throw — one corrupt row
  * must never fail a whole task.
  */
class MultimodalFuzzSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val rnd = new scala.util.Random(43)

  private def noThrow(what: String)(f: => Any): Unit =
    try f
    catch {
      case e: Throwable =>
        fail(s"$what threw ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def fuzzAll(bytes: Array[Byte], what: String): Unit = {
    noThrow(s"$what image")(Multimodal.decodeImageIO(bytes))
    noThrow(s"$what audio")(Multimodal.decodeAudio(bytes))
    noThrow(s"$what pcm")(Multimodal.pcmSamples(bytes))
    noThrow(s"$what avi")(Avi.decode(bytes))
    noThrow(s"$what ahash")(Multimodal.aHash64(bytes))
  }

  test("random byte soup never throws in any codec") {
    for (i <- 0 until 150) {
      val b = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(b)
      fuzzAll(b, s"soup #$i")
    }
  }

  test("mutated valid WAV never throws") {
    val wav = Multimodal.syntheticWav(3L)
    assert(Multimodal.decodeAudio(wav).nonEmpty, "baseline WAV must decode")
    for (i <- 0 until 250) {
      val b = wav.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      fuzzAll(b, s"wav mutation #$i")
    }
    for (n <- 0 until math.min(wav.length, 512))
      fuzzAll(wav.take(n), s"wav truncated at $n")
  }

  test("mutated valid AVI never throws") {
    val avi = Multimodal.syntheticAvi(3L)
    assert(Avi.decode(avi).nonEmpty, "baseline AVI must decode")
    for (i <- 0 until 250) {
      val b = avi.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      noThrow(s"avi mutation #$i")(Avi.decode(b))
    }
    for (n <- 0 until math.min(avi.length, 512))
      noThrow(s"avi truncated at $n")(Avi.decode(avi.take(n)))
  }

  test("mutated valid PNG never throws") {
    val png = Multimodal.syntheticPng(3L)
    assert(Multimodal.decodeImageIO(png).nonEmpty, "baseline PNG must decode")
    for (i <- 0 until 250) {
      val b = png.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      noThrow(s"png mutation #$i")(Multimodal.decodeImageIO(b))
    }
  }
}
