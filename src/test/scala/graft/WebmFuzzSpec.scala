package graft

import graft.multimodal.{Multimodal, Webm}

/** Fuzz the WebM/EBML parser's defensive-parse contract: `index` returns
  * Some/None and NEVER throws (and never loops), for random byte soup,
  * random mutations of valid files, and every truncation point — the
  * same method as Mp4FuzzSpec/ArrowIpcFuzzSpec, which both caught real
  * bugs. EBML is VINT-framed, so mutations hit length fields constantly;
  * the scan must stay bounded.
  */
class WebmFuzzSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val rnd = new scala.util.Random(42) // deterministic corpus

  private def samplesOf(sizes: Seq[Int]): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, s) =>
      Array.tabulate(n)(k => ((7 + s * 31 + k) % 256).toByte)
    }

  private val valid =
    Webm.encode(32, 24, 40, samplesOf(Seq(64, 80, 64, 96, 64)), Seq(0, 3), samplesPerCluster = 2)
  private val synth = Multimodal.syntheticWebm(13L)

  private def assertNoThrow(bytes: Array[Byte], what: String): Unit =
    try Webm.index(bytes)
    catch {
      case e: Throwable =>
        fail(s"$what: index threw ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  test("random byte soup never throws") {
    for (i <- 0 until 300) {
      val len = rnd.nextInt(4096)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assertNoThrow(b, s"soup #$i len=$len")
    }
  }

  test("random mutations of a valid file never throw") {
    for (i <- 0 until 400) {
      val b = valid.clone()
      val nMut = 1 + rnd.nextInt(4)
      for (_ <- 0 until nMut) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      assertNoThrow(b, s"mutation #$i")
    }
  }

  test("random mutations of a synthetic corpus file never throw") {
    for (i <- 0 until 400) {
      val b = synth.clone()
      val nMut = 1 + rnd.nextInt(4)
      for (_ <- 0 until nMut) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      assertNoThrow(b, s"synthetic mutation #$i")
    }
  }

  test("every truncation point of a valid file never throws") {
    for (n <- 0 until valid.length)
      assertNoThrow(valid.take(n), s"truncated at $n")
  }

  test("valid files keep indexing after the fuzz corpus (no shared state)") {
    val ix = Webm.index(valid)
    assert(ix.isDefined && ix.get.samples.length == 5)
  }

  private val cued =
    Webm.encodeWithCues(32, 24, 40, samplesOf(Seq(64, 80, 64, 96, 64)), Seq(0, 3),
      samplesPerCluster = 2)

  test("indexClip never throws on mutations of a Cues-bearing file, and never invents samples") {
    for (i <- 0 until 400) {
      val b = cued.clone()
      val nMut = 1 + rnd.nextInt(4)
      for (_ <- 0 until nMut) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val from = rnd.nextInt(300).toLong
      val to = from + rnd.nextInt(300)
      try {
        // lying Cues may seek into garbage (→ fallback or None) but a
        // returned clip must stay inside the byte range and the window
        Webm.indexClip(b, from, to).foreach { ix =>
          ix.samples.foreach { s =>
            assert(s.offset >= 0 && s.offset + s.size <= b.length, s"clip #$i bounds")
            assert(s.dts >= from && s.dts < to, s"clip #$i window")
          }
        }
      } catch {
        case e: Throwable =>
          fail(s"clip mutation #$i: threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }

  test("every truncation point of a Cues-bearing file never throws under indexClip") {
    for (n <- 0 until cued.length) {
      try Webm.indexClip(cued.take(n), 100L, 300L)
      catch {
        case e: Throwable =>
          fail(s"clip truncated at $n: threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }
}
