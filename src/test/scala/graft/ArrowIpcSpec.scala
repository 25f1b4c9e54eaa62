package graft

import graft.sources.ArrowIpc
import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.channels.Channels
import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

/** Arrow IPC interop (reference native format:
  * org.knime.core.columnar.arrow/.../offheap/OffHeapArrowBatchStore.java:66).
  * Three directions: engine→engine round-trip, foreign-written (plain
  * arrow-java, LZ4 — simulating a reference store) → engine read, and
  * engine write → plain arrow-java read.
  */
class ArrowIpcSpec extends SparkSpec {
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

  test("round-trip: engine write -> engine read (multi-partition, LZ4)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows(10000), 4), schema)
    val out = tmp("ipc_rt")
    ArrowIpc.write(df, out, batchRows = 1024)
    // one file per partition, internally batched
    assert(Files.list(Paths.get(out)).iterator().asScala.count(_.toString.endsWith(".arrow")) == 4)
    val back = ArrowIpc.read(spark, out)
    assert(back.schema.map(f => (f.name, f.dataType)) == schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy($"id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    val b = back.orderBy($"id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    assert(a.toSeq == b.toSeq)
  }

  test("foreign-written LZ4 IPC file (plain arrow-java) reads correctly") {
    val dir = tmp("ipc_foreign")
    Files.createDirectories(Paths.get(dir))
    val file = Paths.get(dir, "store.arrow")
    val alloc = new RootAllocator(Long.MaxValue)
    val arrowSchema = new ArrowSchema(Seq(
      ArrowIpc.toArrowField(StructField("k", IntegerType, nullable = true)),
      ArrowIpc.toArrowField(StructField("v", StringType, nullable = true))).asJava)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val os = Files.newOutputStream(file)
    val writer = new ArrowFileWriter(
      root, null, Channels.newChannel(os), null,
      org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
      CommonsCompressionFactory.INSTANCE, CompressionUtil.CodecType.LZ4_FRAME)
    writer.start()
    // two batches, like a reference store's batch layout
    for (b <- 0 until 2) {
      val kv = root.getVector("k").asInstanceOf[IntVector]
      val vv = root.getVector("v").asInstanceOf[VarCharVector]
      for (i <- 0 until 3) {
        kv.setSafe(i, b * 3 + i)
        if (i == 1) vv.setNull(i) else vv.setSafe(i, s"b${b}_$i".getBytes("UTF-8"))
      }
      root.setRowCount(3)
      writer.writeBatch()
      root.allocateNew()
    }
    writer.end(); writer.close(); os.close(); root.close(); alloc.close()

    val df = ArrowIpc.read(spark, file.toString)
    val got = df.orderBy($"k").collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSeq
    assert(got == Seq(
      (0, Some("b0_0")), (1, None), (2, Some("b0_2")),
      (3, Some("b1_0")), (4, None), (5, Some("b1_2"))))
  }

  test("engine-written file reads with plain arrow-java (format conformance)") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, null)).toDF("id", "s")
    val out = tmp("ipc_conform")
    ArrowIpc.write(df.repartition(1), out)
    val file = Files.list(Paths.get(out)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val alloc = new RootAllocator(Long.MaxValue)
    val ch = Files.newByteChannel(file)
    val reader = new ArrowFileReader(ch.asInstanceOf[java.nio.channels.SeekableByteChannel],
      alloc, CommonsCompressionFactory.INSTANCE)
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    while (reader.loadNextBatch()) {
      val root = reader.getVectorSchemaRoot
      val idv = root.getVector("id").asInstanceOf[BigIntVector]
      val sv = root.getVector("s").asInstanceOf[VarCharVector]
      for (i <- 0 until root.getRowCount)
        got += ((idv.get(i), if (sv.isNull(i)) null else new String(sv.get(i), "UTF-8")))
    }
    reader.close(); ch.close(); alloc.close()
    assert(got.sortBy(_._1).toSeq == Seq((1L, "x"), (2L, "y"), (3L, null)))
  }

  test("migration path: IPC store -> parquet keeps values and types") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows(500), 2), schema)
    val ipc = tmp("ipc_mig")
    ArrowIpc.write(df, ipc)
    val pq = tmp("ipc_mig_pq")
    ArrowIpc.read(spark, ipc).write.parquet(pq)
    val back = spark.read.parquet(pq)
    assert(back.count() == 500)
    assert(back.schema("id").dataType == LongType && back.schema("blob").dataType == BinaryType)
    assert(back.agg(sum($"id")).head.getLong(0) == (0L until 500L).sum)
  }

  test("unsupported type fails fast at write") {
    val df = Seq((1, Seq(1, 2))).toDF("k", "arr")
    intercept[IllegalArgumentException] { ArrowIpc.write(df, tmp("ipc_bad")) }
  }

  test("mixed-schema directory fails with the offending file, not a vector-cast error") {
    val out = tmp("ipc_mixed")
    ArrowIpc.write(Seq((1L, "a")).toDF("id", "s").repartition(1), out)
    // sneak in a second file with a different schema
    val rogue = Seq((1, 2.0)).toDF("x", "y").repartition(1)
    val rogueDir = tmp("ipc_rogue")
    ArrowIpc.write(rogue, rogueDir)
    import scala.collection.JavaConverters._
    val rogueFile = Files.list(Paths.get(rogueDir)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    Files.copy(rogueFile, Paths.get(out, "zz-rogue.arrow"))
    val e = intercept[org.apache.spark.SparkException] {
      ArrowIpc.read(spark, out).count()
    }
    assert(e.getMessage.contains("zz-rogue") || Option(e.getCause).exists(_.getMessage.contains("zz-rogue")),
      s"error does not name the offending file: ${e.getMessage}")
  }

  test("write commits atomically: _SUCCESS present, no temp files; partial drain safe") {
    import scala.collection.JavaConverters._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows(2000), 3), schema)
    val out = tmp("ipc_commit")
    ArrowIpc.write(df, out, batchRows = 256)
    val names = Files.list(Paths.get(out)).iterator().asScala.map(_.getFileName.toString).toSeq
    assert(names.contains("_SUCCESS"))
    assert(!names.exists(_.endsWith(".tmp")), s"leftover temp files: $names")
    // partially-drained read (limit) must not break subsequent full reads
    // (review finding: resources are closed by the task-completion
    // listener, not only by iterator exhaustion)
    assert(ArrowIpc.read(spark, out).limit(7).collect().length == 7)
    assert(ArrowIpc.read(spark, out).count() == 2000)
  }
}
