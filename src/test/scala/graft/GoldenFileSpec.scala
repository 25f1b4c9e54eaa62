package graft

import graft.table.TableWriter
import org.apache.spark.sql.functions._

/** Golden-file compatibility guard (mirrors the reference's legacy-file
  * round-trip tests, SURVEY.md §5.2 — reference
  * org.knime.core.columnar.arrow.tests/test_data/ + Lz4BlockCompressionLegacyTest):
  * a parquet table written by round-1 code is frozen under
  * src/test/resources/golden; every later round must still read it with
  * identical content. Guards against accidental format/metadata breaks
  * (compression, logical-type metadata, domain sidecar shape).
  */
class GoldenFileSpec extends SparkSpec {
  import spark.implicits._

  private val goldenDir = new java.io.File("src/test/resources/golden/all_types_v1")

  private def referenceDf = {
    Seq(
      (0L, "Row0", true, 1, 1.5f, 2.5, "alpha", Seq(1, 2), Map("k" -> 1)),
      (1L, "Row1", false, -7, -0.5f, 99.25, "βeta", Seq.empty[Int], Map.empty[String, Int]),
      (2L, "Row2", true, 0, 0f, 0.0, "", Seq(3), Map("a" -> 0, "b" -> 1))
    ).toDF("id", "row_id", "b", "i", "f", "d", "s", "arr", "m")
  }

  test("golden table written by v1 still reads identically") {
    if (!goldenDir.exists()) {
      // first run on a fresh checkout: freeze the golden copy (committed
      // to the repo so later rounds read a file written by THIS code)
      TableWriter.write(referenceDf, goldenDir.getAbsolutePath)
    }
    val back = spark.read.parquet(goldenDir.getAbsolutePath).orderBy($"id")
    val expected = referenceDf.orderBy($"id")
    // parquet round trips widen container nullability — compare types
    // modulo nullable flags
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
      expected.schema.map(f => (f.name, f.dataType.simpleString)))
    val a = back.collect().map(_.toSeq.map(v => Option(v).map(_.toString).orNull))
    val e = expected.collect().map(_.toSeq.map(v => Option(v).map(_.toString).orNull))
    assert(a.toSeq.map(_.toSeq) == e.toSeq.map(_.toSeq))
    // domain sidecar still present and parseable
    val sidecar = TableWriter.readDomainsJson(spark, goldenDir.getAbsolutePath)
    assert(sidecar.exists(_.contains("\"row_count\":3")))
  }

  private val goldenDirV2 = new java.io.File("src/test/resources/golden/all_types_v2")

  test("golden table written by v2 (sketch-bearing sidecar) still reads identically") {
    if (!goldenDirV2.exists()) {
      TableWriter.write(referenceDf, goldenDirV2.getAbsolutePath)
    }
    val back = spark.read.parquet(goldenDirV2.getAbsolutePath).orderBy($"id")
    assert(back.count() == 3)
    // v2 sidecar carries base64 HLL sketches; they must deserialize and
    // estimate correctly forever after
    val sketches = TableWriter.readDistinctSketches(spark, goldenDirV2.getAbsolutePath)
    assert(sketches.contains("s") && sketches.contains("row_id"))
    val est = org.apache.datasketches.hll.HllSketch.heapify(sketches("row_id")).getEstimate
    assert(math.round(est) == 3L, s"sketch estimate $est")
  }
}
