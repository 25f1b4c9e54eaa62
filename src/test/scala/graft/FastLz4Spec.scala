package graft

import graft.sources.{ArrowIpc, FastLz4}
import org.apache.spark.sql.functions._
import org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream

import java.io.ByteArrayInputStream
import java.nio.file.Files

/** FastLz4's spec-v1.6.1 frames, fast and lz4hc paths: both must decode
  * through an INDEPENDENT spec parser (commons-compress) byte-exactly,
  * and the high-compression mode must actually buy size on compressible
  * data — that's its whole contract (archival writes claw back the fast
  * path's size tradeoff).
  */
class FastLz4Spec extends SparkSpec {

  private def roundTrip(frame: Array[Byte]): Array[Byte] = {
    val in = new FramedLZ4CompressorInputStream(new ByteArrayInputStream(frame))
    try in.readAllBytes() finally in.close()
  }

  test("fast and hc frames both decode byte-exactly via commons-compress; hc is smaller") {
    val rnd = new scala.util.Random(7)
    // compressible: repeated vocabulary with structure
    val src = (0 until 200000).map(i => s"tok_${i % 97}|").mkString.getBytes("UTF-8")
    val fast = FastLz4.compressFrame(src, src.length)
    val hc = FastLz4.compressFrame(src, src.length, level = 9)
    assert(java.util.Arrays.equals(roundTrip(fast), src))
    assert(java.util.Arrays.equals(roundTrip(hc), src))
    assert(hc.length < fast.length,
      s"lz4hc frame ${hc.length} B not smaller than fast ${fast.length} B")
    // incompressible data: both store raw (+frame overhead), both decode
    val noise = Array.fill(65536)(rnd.nextInt().toByte)
    val fastN = FastLz4.compressFrame(noise, noise.length)
    val hcN = FastLz4.compressFrame(noise, noise.length, level = 9)
    assert(java.util.Arrays.equals(roundTrip(fastN), noise))
    assert(java.util.Arrays.equals(roundTrip(hcN), noise))
    // empty input: a valid empty frame
    val empty = FastLz4.compressFrame(Array.emptyByteArray, 0)
    assert(roundTrip(empty).isEmpty)
  }

  test("ArrowIpc.write(compressionLevel) round-trips identically and shrinks the store") {
    val df = spark.range(0, 20000).select(
      col("id"),
      concat(lit("body text body text "), (col("id") % 50).cast("string")).as("text"),
      (col("id") % 7).cast("int").as("k"))
    def dirSize(d: String): Long =
      Files.walk(java.nio.file.Paths.get(d)).filter(Files.isRegularFile(_))
        .mapToLong(Files.size(_)).sum()
    val fastDir = Files.createTempDirectory("lz4_fast").resolve("t").toString
    val hcDir = Files.createTempDirectory("lz4_hc").resolve("t").toString
    ArrowIpc.write(df, fastDir, batchRows = 1024)
    ArrowIpc.write(df, hcDir, batchRows = 1024, compressionLevel = 9)
    def canon(d: String): Seq[String] =
      ArrowIpc.read(spark, d).collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(canon(fastDir) == canon(hcDir))
    val (fs, hs) = (dirSize(fastDir), dirSize(hcDir))
    assert(hs <= fs, s"hc store $hs B larger than fast store $fs B")
  }
}
