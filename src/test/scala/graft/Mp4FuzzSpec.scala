package graft

import graft.multimodal.{Mp4, Multimodal}

/** Fuzz the MP4 container parser's defensive-parse contract: `index`
  * returns Some/None and NEVER throws, for random byte soup, random
  * mutations of valid progressive and fragmented files, and every
  * truncation point. (Same method as ArrowIpcFuzzSpec, which caught a
  * real empty-table bug in round 8 — mutation fuzzing exercises the
  * box-bounds/entry-count validation ADVICE r8 flagged.)
  */
class Mp4FuzzSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val rnd = new scala.util.Random(42) // deterministic corpus

  private def samplesOf(sizes: Seq[Int]): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, s) =>
      Array.tabulate(n)(k => ((7 + s * 31 + k) % 256).toByte)
    }

  private val progressive =
    Mp4.encode(32, 24, 600, 100, samplesOf(Seq(64, 80, 64, 96, 64)), Seq(0, 3), samplesPerChunk = 2)
  private val fragmented = Multimodal.syntheticFragMp4(7L)

  private def assertNoThrow(bytes: Array[Byte], what: String): Unit =
    try Mp4.index(bytes)
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

  test("random mutations of a valid progressive file never throw") {
    for (i <- 0 until 400) {
      val b = progressive.clone()
      val nMut = 1 + rnd.nextInt(4)
      for (_ <- 0 until nMut) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      assertNoThrow(b, s"progressive mutation #$i")
    }
  }

  test("random mutations of a valid fragmented file never throw") {
    for (i <- 0 until 400) {
      val b = fragmented.clone()
      val nMut = 1 + rnd.nextInt(4)
      for (_ <- 0 until nMut) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      assertNoThrow(b, s"fragmented mutation #$i")
    }
  }

  test("every truncation point of valid files never throws") {
    for (n <- 0 until progressive.length)
      assertNoThrow(progressive.take(n), s"progressive truncated at $n")
    for (n <- 0 until fragmented.length)
      assertNoThrow(fragmented.take(n), s"fragmented truncated at $n")
  }

  test("valid inputs still index after the fuzz corpus (no shared-state corruption)") {
    assert(Mp4.index(progressive).nonEmpty)
    assert(Mp4.index(fragmented).nonEmpty)
  }
}
