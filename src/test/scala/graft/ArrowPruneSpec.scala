package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Column-pruned Arrow IPC reads: `ArrowIpc.read(spark, path, columns)`
  * must (a) return exactly `full.select(columns)` — same values, same
  * order semantics, duplicates/permutations included — on every layout
  * the reader supports (scalars, nested, dictionary-encoded, legacy
  * LZ4-block, the reference's committed golden files), and (b) actually
  * SKIP the unselected columns' bytes: the pruned path reads only the
  * selected fields' buffer ranges located by each record batch's
  * flatbuffer metadata, asserted here through the reader's byte counter.
  */
class ArrowPruneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(name).resolve("t").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = true),
    StructField("small", IntegerType, nullable = true),
    StructField("blob", BinaryType, nullable = true)))

  private def sampleRows(n: Int): Seq[Row] =
    (0 until n).map { i =>
      Row(
        i.toLong,
        if (i % 7 == 3) null else s"name_$i",
        if (i % 5 == 4) null else i * 1.5,
        if (i % 11 == 0) null else (i % 2 == 0),
        if (i % 13 == 6) null else i * 3,
        if (i % 17 == 2) null else Array[Byte](i.toByte, (i + 1).toByte))
    }

  /** Canonical sorted row strings (binary hex-encoded RECURSIVELY —
    * Array[Byte] inside structs/arrays/maps compares by identity
    * otherwise).
    */
  private def canonVal(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case r: Row => r.toSeq.map(canonVal).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canonVal).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canonVal(k) + "->" + canonVal(x) }.sorted.mkString("{", ",", "}")
    case x => x.toString
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(canonVal).mkString("|")).sorted.toSeq

  private def bytesRead[T](f: => T): (T, Long) = ArrowIpc.bytesReadDuring(f)

  test("pruned read == full.select on scalars: single, permuted, duplicated columns") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows(5000), 3), schema)
    val out = tmp("ipc_prune_scalar")
    ArrowIpc.write(df, out, batchRows = 512)
    val full = ArrowIpc.read(spark, out)
    for (cols <- Seq(
        Seq("id"), Seq("score", "id"), Seq("name", "flag", "small"),
        Seq("blob", "id", "blob"), schema.fieldNames.reverse.toSeq)) {
      val pruned = ArrowIpc.read(spark, out, cols)
      assert(pruned.schema.fieldNames.toSeq == cols, s"schema order for $cols")
      assert(canon(pruned) == canon(full.select(cols.map(col): _*)), s"values for $cols")
    }
  }

  test("pruned read skips unselected bytes (fat column stays unread)") {
    // text dwarfs every other column: pruning it away must drop the read
    // byte count by an order of magnitude, not just the decode cost
    val df = spark.range(0, 2000).select(
      col("id"),
      concat(lit("x" * 500), col("id").cast("string")).as("text"),
      (col("id") % 7).as("bucket"))
    val out = tmp("ipc_prune_bytes")
    ArrowIpc.write(df, out, batchRows = 256)
    val (fullRows, fullBytes) = bytesRead(ArrowIpc.read(spark, out).collect().length)
    val (prunedRows, prunedBytes) = bytesRead(ArrowIpc.read(spark, out, Seq("id", "bucket")).collect().length)
    assert(fullRows == 2000 && prunedRows == 2000)
    assert(prunedBytes < fullBytes / 2,
      s"pruned read $prunedBytes B should be well under half of full $fullBytes B")
    // zero-column read (count(*) shape): metadata only, no body bytes
    val (cnt, zeroBytes) = bytesRead(ArrowIpc.read(spark, out, Nil).count())
    assert(cnt == 2000)
    assert(zeroBytes < prunedBytes / 2,
      s"zero-column read $zeroBytes B should be far under pruned $prunedBytes B")
  }

  test("pruned read on nested columns: struct/array/map slices load standalone") {
    val df = spark.sql(
      """SELECT id,
        |  IF(id % 5 = 0, NULL, array(named_struct('a', id, 'b', CAST(id AS STRING)),
        |        named_struct('a', id + 1, 'b', CAST(NULL AS STRING)))) AS arst,
        |  named_struct('inner', named_struct('x', id * 2, 'y', CAST(id AS DOUBLE)),
        |               'z', CAST(id % 3 AS INT)) AS st,
        |  map(concat('k', id), CAST(id AS DOUBLE), 'fixed', CAST(NULL AS DOUBLE)) AS m,
        |  array(array(id, id + 1), array(id * 2)) AS arar
        |FROM range(0, 1000)""".stripMargin)
    val out = tmp("ipc_prune_nested")
    ArrowIpc.write(df, out, batchRows = 128)
    val full = ArrowIpc.read(spark, out)
    for (cols <- Seq(Seq("arst"), Seq("st", "id"), Seq("m"), Seq("arar", "st"))) {
      val pruned = ArrowIpc.read(spark, out, cols)
      assert(canon(pruned) == canon(full.select(cols.map(col): _*)), s"values for $cols")
    }
  }

  test("pruned read with dictionary-encoded columns: needed dicts load, others skip body-unread") {
    val n = 4000
    val words = Array("alpha", "beta", "gamma", "delta")
    val df = spark.range(0, n).select(
      col("id"),
      element_at(lit(words), (col("id") % 4 + 1).cast("int")).as("category"),
      concat(lit("p" * 300), col("id").cast("string")).as("payload"))
    val out = tmp("ipc_prune_dict")
    ArrowIpc.write(df, out, batchRows = 256, dictColumns = Set("category"))
    val full = ArrowIpc.read(spark, out)
    // selecting the dict column: dictionary batches must load and decode
    val withDict = ArrowIpc.read(spark, out, Seq("category", "id"))
    assert(canon(withDict) == canon(full.select(col("category"), col("id"))))
    // selecting AROUND the dict column: its dictionary batches skip unread
    val (vals, noDictBytes) = bytesRead {
      ArrowIpc.read(spark, out, Seq("id")).agg(sum(col("id"))).collect()(0).getLong(0)
    }
    assert(vals == (0L until n).sum)
    val (_, dictBytes) = bytesRead {
      ArrowIpc.read(spark, out, Seq("category", "id")).collect().length
    }
    assert(noDictBytes < dictBytes, "skipping the dict column must read fewer bytes than loading it")
  }

  test("pruned read matches full.select on the reference's golden files (incl. legacy LZ4-block, replacement dicts)") {
    val base = "/root/reference/org.knime.core.columnar.arrow.tests/test_data"
    assume(Files.isDirectory(Paths.get(base)))
    val goldens = Seq(
      s"$base/LZ4_block_compression/data.arrow", // legacy block codec
      s"$base/ZonedDateTime_legacy_files/multiple_batches.arrow", // dict REPLACEMENT per batch
      s"$base/ZonedDateTime_legacy_files/multiple_columns.arrow")
    goldens.filter(g => Files.exists(Paths.get(g))).foreach { g =>
      val full = ArrowIpc.read(spark, g)
      val names = full.schema.fieldNames.toSeq
      for (cols <- Seq(Seq(names.head), names.drop(1), names.reverse)) {
        if (cols.nonEmpty) {
          val pruned = ArrowIpc.read(spark, g, cols)
          assert(canon(pruned) == canon(full.select(cols.map(col): _*)), s"$g / $cols")
        }
      }
      // zero-column count against the full read
      assert(ArrowIpc.read(spark, g, Nil).count() == full.count(), s"$g count")
    }
  }

  test("unknown column fails on the driver with the schema in the message") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows(10), 1), schema)
    val out = tmp("ipc_prune_missing")
    ArrowIpc.write(df, out)
    val e = intercept[IllegalArgumentException] {
      ArrowIpc.read(spark, out, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("id"))
  }
}
