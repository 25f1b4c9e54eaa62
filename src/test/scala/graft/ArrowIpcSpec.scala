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
    // CalendarInterval has no Arrow IPC mapping
    val df = Seq(Tuple1(1)).toDF("k")
      .select(expr("make_interval(0, 2)").as("iv"))
    intercept[IllegalArgumentException] { ArrowIpc.write(df, tmp("ipc_bad")) }
  }

  test("nested round-trip: array<struct>, struct<struct>, map, array<array>") {
    val df = spark.sql(
      """SELECT id,
        |  IF(id % 5 = 0, NULL, array(named_struct('a', id, 'b', CAST(id AS STRING)),
        |        named_struct('a', id + 1, 'b', CAST(NULL AS STRING)))) AS arst,
        |  named_struct('inner', named_struct('x', id * 2, 'y', CAST(id AS DOUBLE)),
        |               'tags', IF(id % 3 = 0, NULL, array('t1', concat('t', id)))) AS st,
        |  map(concat('k', id), CAST(id AS DOUBLE), 'fixed', CAST(NULL AS DOUBLE)) AS m,
        |  array(array(id, id + 1), array(), CAST(NULL AS array<bigint>)) AS aa,
        |  IF(id % 7 = 2, NULL, CAST(id AS DECIMAL(18, 6)) * 1.000001) AS dec
        |FROM range(200)""".stripMargin)
    val out = tmp("ipc_nested")
    ArrowIpc.write(df.repartition(2), out, batchRows = 64)
    val back = ArrowIpc.read(spark, out)
    assert(back.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    val key = (r: Row) => r.getLong(0)
    val a = df.collect().sortBy(key).map(_.toString).toSeq
    val b = back.collect().sortBy(key).map(_.toString).toSeq
    assert(a == b)
  }

  test("field metadata survives write -> read; logical time64[ns] restores the Arrow type") {
    val md = new MetadataBuilder()
      .putString("KNIME:logical", "org.example.ZonedDateTimeValueFactory")
      .putString(ArrowIpc.LogicalKey, "time64[ns]").build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("nanoOfDay", LongType, nullable = true, md)))
    val rows = (0 until 50).map(i => Row(i.toLong, if (i % 9 == 0) null else i * 1234567891011L % 86400000000000L))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = tmp("ipc_meta")
    ArrowIpc.write(df, out)
    // the Arrow field on disk is a real time64[ns] (plain arrow-java view)
    val file = Files.list(Paths.get(out)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val alloc = new RootAllocator(Long.MaxValue)
    val ch = Files.newByteChannel(file)
    val reader = new ArrowFileReader(ch.asInstanceOf[java.nio.channels.SeekableByteChannel],
      alloc, CommonsCompressionFactory.INSTANCE)
    val arrowField = reader.getVectorSchemaRoot.getSchema.getFields.get(1)
    assert(arrowField.getType.isInstanceOf[org.apache.arrow.vector.types.pojo.ArrowType.Time],
      s"expected time64 on disk, got ${arrowField.getType}")
    assert(arrowField.getMetadata.get("KNIME:logical") == "org.example.ZonedDateTimeValueFactory")
    reader.close(); ch.close(); alloc.close()
    // and the round trip preserves values + metadata
    val back = ArrowIpc.read(spark, out)
    val f = back.schema("nanoOfDay")
    assert(f.dataType == LongType)
    assert(f.metadata.getString(ArrowIpc.LogicalKey) == "time64[ns]")
    assert(f.metadata.getString("KNIME:logical") == "org.example.ZonedDateTimeValueFactory")
    assert(back.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }

  test("object-column logical type tags survive the IPC round trip (ObjectColumns registry wiring)") {
    import graft.table.ObjectColumns
    val df = Seq((1L, "png-ish"), (2L, "more")).toDF("id", "s")
      .select($"id", expr("encode(s, 'UTF-8')").as("payload"))
    val tagged = ObjectColumns.tagColumn(df, "payload", "org.example.image.PngValue")
    val out = tmp("ipc_objcol")
    ArrowIpc.write(tagged, out)
    val back = ArrowIpc.read(spark, out)
    // the §1.2 logical-type registry reads its tag off the migrated table
    assert(ObjectColumns.logicalTypeOf(back, "payload").contains("org.example.image.PngValue"))
    // and the tag is real Arrow field metadata, visible to ANY Arrow reader
    val file = Files.list(Paths.get(out)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val alloc = new RootAllocator(Long.MaxValue)
    val ch = Files.newByteChannel(file)
    val reader = new ArrowFileReader(ch.asInstanceOf[java.nio.channels.SeekableByteChannel],
      alloc, CommonsCompressionFactory.INSTANCE)
    val md = reader.getVectorSchemaRoot.getSchema.findField("payload").getMetadata
    assert(md.get(ObjectColumns.LogicalTypeKey) == "org.example.image.PngValue")
    reader.close(); ch.close(); alloc.close()
  }

  test("dictionary-encoded string column (foreign-written) decodes on read") {
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryEncoder, DictionaryProvider}
    import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding}
    val dir = tmp("ipc_dict")
    Files.createDirectories(Paths.get(dir))
    val file = Paths.get(dir, "dict.arrow")
    val alloc = new RootAllocator(Long.MaxValue)
    val words = Array("alpha", "beta", "gamma")
    val dictVec = new VarCharVector("d", alloc)
    dictVec.allocateNew()
    words.zipWithIndex.foreach { case (w, i) => dictVec.setSafe(i, w.getBytes("UTF-8")) }
    dictVec.setValueCount(words.length)
    val dictionary = new Dictionary(dictVec,
      new DictionaryEncoding(7L, false, new ArrowType.Int(32, true)))
    val raw = new VarCharVector("s", alloc)
    raw.allocateNew()
    val n = 50
    for (i <- 0 until n)
      if (i % 11 == 5) raw.setNull(i) else raw.setSafe(i, words(i % 3).getBytes("UTF-8"))
    raw.setValueCount(n)
    val encoded = DictionaryEncoder.encode(raw, dictionary).asInstanceOf[FieldVector]
    val idVec = new BigIntVector("id", alloc)
    idVec.allocateNew()
    for (i <- 0 until n) idVec.setSafe(i, i.toLong)
    idVec.setValueCount(n)
    val root = new VectorSchemaRoot(
      java.util.List.of(idVec.getField, encoded.getField),
      java.util.List.of[FieldVector](idVec, encoded))
    val provider = new DictionaryProvider.MapDictionaryProvider(dictionary)
    val os = Files.newOutputStream(file)
    val writer = new ArrowFileWriter(root, provider, Channels.newChannel(os))
    writer.start(); writer.writeBatch(); writer.end(); writer.close(); os.close()
    raw.close(); encoded.close(); idVec.close(); dictVec.close(); alloc.close()

    val df = ArrowIpc.read(spark, file.toString)
    // schema surfaces the VALUE type + the encoding marker
    val sf = df.schema("s")
    assert(sf.dataType == StringType)
    assert(sf.metadata.getString(ArrowIpc.DictKey) == "true")
    assert(sf.metadata.getString(ArrowIpc.DictWidthKey) == "32")
    val got = df.orderBy($"id").collect().map(r => Option(r.getString(1))).toSeq
    val want = (0 until n).map(i => if (i % 11 == 5) None else Some(words(i % 3))).toSeq
    assert(got == want)
  }

  test("Void (all-null) columns round-trip — the reference's ArrowVoidDataFactory shape") {
    val df = spark.sql("SELECT id, NULL AS void_col FROM range(40)")
    assert(df.schema("void_col").dataType == NullType)
    val out = tmp("ipc_void")
    ArrowIpc.write(df, out)
    val back = ArrowIpc.read(spark, out)
    assert(back.schema("void_col").dataType == NullType)
    assert(back.count() == 40)
    assert(back.where($"void_col".isNull).count() == 40)
    // and a foreign-written Null column (plain arrow-java) reads too
    val dir = tmp("ipc_void_foreign")
    Files.createDirectories(Paths.get(dir))
    val file = Paths.get(dir, "v.arrow")
    val alloc = new RootAllocator(Long.MaxValue)
    val idv = new BigIntVector("id", alloc)
    idv.allocateNew(); (0 until 5).foreach(i => idv.setSafe(i, i.toLong)); idv.setValueCount(5)
    val nv = new NullVector("nothing", 5)
    val root = new VectorSchemaRoot(
      java.util.List.of(idv.getField, nv.getField),
      java.util.List.of[FieldVector](idv, nv))
    val os = Files.newOutputStream(file)
    val writer = new ArrowFileWriter(root, null, Channels.newChannel(os))
    writer.start(); writer.writeBatch(); writer.end(); writer.close(); os.close()
    root.close(); alloc.close()
    val fdf = ArrowIpc.read(spark, file.toString)
    assert(fdf.schema("nothing").dataType == NullType)
    assert(fdf.count() == 5)
  }

  test("TimestampNTZ round-trips (lineitem's date columns migrate)") {
    val df = spark.sql(
      "SELECT id, timestampadd(HOUR, CAST(id AS INT), TIMESTAMP_NTZ'2024-01-01 00:00:00') AS ts FROM range(100)")
    val out = tmp("ipc_ntz")
    ArrowIpc.write(df, out)
    val back = ArrowIpc.read(spark, out)
    assert(back.schema("ts").dataType == TimestampNTZType)
    assert(back.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
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

  test("write-side dictionary encoding: delta accumulation, round trip, plain arrow-java read") {
    import org.apache.arrow.vector.dictionary.DictionaryProvider
    // values sorted so later batches introduce NEW dictionary values →
    // the writer must emit delta batches, not just one initial dictionary
    val df = spark.sql(
      """SELECT id,
        |  concat('cat_', CAST(id div 100 AS INTEGER)) AS category,
        |  IF(id % 9 = 4, NULL, encode(concat('b', CAST(id div 200 AS INTEGER)), 'UTF-8')) AS tag
        |FROM range(1000) ORDER BY id""".stripMargin)
    val out = tmp("ipc_dictw")
    ArrowIpc.write(df.repartition(1).sortWithinPartitions($"id"), out,
      batchRows = 128, dictColumns = Set("category", "tag"))

    // footer shape: >2 dictionary blocks proves deltas were written
    // (1 initial per column + at least one delta)
    import scala.collection.JavaConverters._
    val file = Files.list(Paths.get(out)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val reader = new ArrowFileReader(
      Files.newByteChannel(file), new RootAllocator(Long.MaxValue), CommonsCompressionFactory.INSTANCE)
    val dictBlocks = reader.getDictionaryBlocks.size()
    reader.close()
    assert(dictBlocks > 2, s"expected initial+delta dictionary batches, got $dictBlocks blocks")

    // engine round trip: values exact, schema surfaces the dict marker
    val back = ArrowIpc.read(spark, out)
    assert(back.schema("category").dataType == StringType)
    assert(back.schema("category").metadata.getString(ArrowIpc.DictKey) == "true")
    assert(back.schema("tag").dataType == BinaryType)
    val a = df.orderBy($"id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    val b = back.orderBy($"id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    assert(a.toSeq == b.toSeq)

    // re-write WITHOUT explicit dictColumns: the read marker alone keeps
    // the encoding (reference→Spark→IPC round trips stay dict-encoded)
    val out2 = tmp("ipc_dictw2")
    ArrowIpc.write(back.repartition(1), out2)
    val file2 = Files.list(Paths.get(out2)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val r2 = new ArrowFileReader(
      Files.newByteChannel(file2), new RootAllocator(Long.MaxValue), CommonsCompressionFactory.INSTANCE)
    assert(r2.getDictionaryBlocks.size() >= 2, "dict marker did not re-encode on write")
    r2.close()

    // non-string/binary dict column fails fast
    val e = intercept[IllegalArgumentException] {
      ArrowIpc.write(df, tmp("ipc_dictbad"), dictColumns = Set("id"))
    }
    assert(e.getMessage.contains("only string/binary leaves"))
  }

  test("NESTED dictionary encoding on write: list element, struct field, map value") {
    // low-cardinality string leaves inside list/struct/map; values shift
    // across batches so deltas are exercised at depth too
    val df = spark.sql(
      """SELECT id,
        |  array(concat('t_', CAST(id div 100 AS INTEGER)), concat('t_', CAST(id div 50 AS INTEGER))) AS tags,
        |  named_struct('name', concat('n_', CAST(id div 150 AS INTEGER)), 'score', CAST(id AS DOUBLE)) AS meta,
        |  map('k', concat('v_', CAST(id div 80 AS INTEGER))) AS props
        |FROM range(600) ORDER BY id""".stripMargin)
    val out = tmp("ipc_dictn")
    ArrowIpc.write(df.repartition(1).sortWithinPartitions($"id"), out,
      batchRows = 100,
      dictColumns = Set("tags.element", "meta.name", "props.value"))

    // the file's schema must carry the encodings at depth, and dictionary
    // blocks must include deltas (values change across the 6 batches)
    import scala.collection.JavaConverters._
    val file = Files.list(Paths.get(out)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val reader = new ArrowFileReader(
      Files.newByteChannel(file), new RootAllocator(Long.MaxValue), CommonsCompressionFactory.INSTANCE)
    val sch = reader.getVectorSchemaRoot.getSchema
    def fieldByName(n: String) = sch.getFields.asScala.find(_.getName == n).get
    assert(fieldByName("tags").getChildren.get(0).getDictionary != null, "list element not dict-encoded")
    assert(fieldByName("meta").getChildren.asScala.find(_.getName == "name").get.getDictionary != null,
      "struct field not dict-encoded")
    assert(fieldByName("props").getChildren.get(0).getChildren.asScala
      .find(_.getName == "value").get.getDictionary != null, "map value not dict-encoded")
    // distinct ids per encoded leaf
    val ids = Seq(
      fieldByName("tags").getChildren.get(0).getDictionary.getId,
      fieldByName("meta").getChildren.asScala.find(_.getName == "name").get.getDictionary.getId,
      fieldByName("props").getChildren.get(0).getChildren.asScala
        .find(_.getName == "value").get.getDictionary.getId)
    assert(ids.distinct.size == 3, s"dictionary ids must be unique: $ids")
    val dictBlocks = reader.getDictionaryBlocks.size()
    reader.close()
    assert(dictBlocks > 3, s"expected initial+delta dictionary batches at depth, got $dictBlocks")

    // round trip through our own reader: values exact at every depth
    val back = ArrowIpc.read(spark, out)
    val norm = (r: org.apache.spark.sql.Row) => r.toSeq.map {
      case m: scala.collection.Map[_, _] => m.toSeq.toString
      case x => x
    }
    assert(back.orderBy($"id").collect().map(norm).toSeq ==
      df.orderBy($"id").collect().map(norm).toSeq)

    // nested struct-field dict marker survives the round trip and
    // re-encodes on a marker-only re-write
    val metaField = back.schema("meta").dataType.asInstanceOf[StructType]("name")
    assert(metaField.metadata.getString(ArrowIpc.DictKey) == "true")
    val out2 = tmp("ipc_dictn2")
    ArrowIpc.write(back.repartition(1), out2)
    val file2 = Files.list(Paths.get(out2)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val r2 = new ArrowFileReader(
      Files.newByteChannel(file2), new RootAllocator(Long.MaxValue), CommonsCompressionFactory.INSTANCE)
    val metaName2 = r2.getVectorSchemaRoot.getSchema.getFields.asScala
      .find(_.getName == "meta").get.getChildren.asScala.find(_.getName == "name").get
    assert(metaName2.getDictionary != null, "nested struct marker did not re-encode on write")
    r2.close()

    // marker on a struct field NESTED UNDER AN ARRAY also re-encodes
    // (struct fields have metadata slots wherever they sit)
    val df3 = spark.sql(
      """SELECT id, array(named_struct('tag', concat('t_', CAST(id div 100 AS INTEGER)))) AS items
        |FROM range(300) ORDER BY id""".stripMargin)
    val out3a = tmp("ipc_dictn3a")
    ArrowIpc.write(df3.repartition(1), out3a, dictColumns = Set("items.element.tag"))
    val back3 = ArrowIpc.read(spark, out3a)
    val out3b = tmp("ipc_dictn3b")
    ArrowIpc.write(back3.repartition(1), out3b) // marker-only re-write
    val file3 = Files.list(Paths.get(out3b)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val r3 = new ArrowFileReader(
      Files.newByteChannel(file3), new RootAllocator(Long.MaxValue), CommonsCompressionFactory.INSTANCE)
    val tag3 = r3.getVectorSchemaRoot.getSchema.getFields.asScala
      .find(_.getName == "items").get.getChildren.get(0).getChildren.asScala
      .find(_.getName == "tag").get
    assert(tag3.getDictionary != null, "array-nested struct marker did not re-encode on write")
    r3.close()

    // bad paths fail fast
    val e1 = intercept[IllegalArgumentException] {
      ArrowIpc.write(df, tmp("ipc_dictn_bad"), dictColumns = Set("meta.score"))
    }
    assert(e1.getMessage.contains("only string/binary leaves"))
    val e2 = intercept[IllegalArgumentException] {
      ArrowIpc.write(df, tmp("ipc_dictn_bad2"), dictColumns = Set("tags.nope"))
    }
    assert(e2.getMessage.contains("no such column path"))
  }

  test("foreign dict-encoded INT column: read marker does not break re-write (writes plain)") {
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryEncoder, DictionaryProvider}
    import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding}
    val dir = tmp("ipc_dictint")
    Files.createDirectories(Paths.get(dir))
    val file = Paths.get(dir, "d.arrow")
    val alloc = new RootAllocator(Long.MaxValue)
    val dictVec = new BigIntVector("d", alloc)
    dictVec.allocateNew()
    Seq(100L, 200L, 300L).zipWithIndex.foreach { case (v, i) => dictVec.setSafe(i, v) }
    dictVec.setValueCount(3)
    val dictionary = new Dictionary(dictVec,
      new DictionaryEncoding(5L, false, new ArrowType.Int(32, true)))
    val raw = new BigIntVector("v", alloc)
    raw.allocateNew()
    (0 until 30).foreach(i => raw.setSafe(i, Seq(100L, 200L, 300L)(i % 3)))
    raw.setValueCount(30)
    val encoded = DictionaryEncoder.encode(raw, dictionary).asInstanceOf[FieldVector]
    val root = new VectorSchemaRoot(
      java.util.List.of(encoded.getField), java.util.List.of[FieldVector](encoded))
    val provider = new DictionaryProvider.MapDictionaryProvider(dictionary)
    val os = Files.newOutputStream(file)
    val writer = new ArrowFileWriter(root, provider, Channels.newChannel(os))
    writer.start(); writer.writeBatch(); writer.end(); writer.close(); os.close()
    raw.close(); encoded.close(); dictVec.close(); alloc.close()

    val back = ArrowIpc.read(spark, file.toString)
    assert(back.schema("v").dataType == LongType)
    assert(back.schema("v").metadata.getString(ArrowIpc.DictKey) == "true")
    // the marker is best-effort: a LONG column can't dict-encode, so the
    // re-write must fall back to plain vectors, not fail the migration
    val out = tmp("ipc_dictint_rw")
    ArrowIpc.write(back.repartition(1), out)
    val rt = ArrowIpc.read(spark, out)
    assert(rt.select(sum($"v")).head.getLong(0) == back.select(sum($"v")).head.getLong(0))
  }

  test("dict column with all-null first batch: initial batch once, then deltas (no replacement)") {
    import org.apache.arrow.vector.ipc.SeekableReadChannel
    import org.apache.arrow.vector.ipc.message.MessageSerializer
    // first 64-row batch all null, values appear from batch 2 on — the
    // empty initial dictionary must still count as emitted
    val df = spark.sql(
      """SELECT id, IF(id < 64, NULL, concat('g', CAST(id div 64 AS INTEGER))) AS grp
        |FROM range(256) ORDER BY id""".stripMargin)
    val out = tmp("ipc_dictnullfirst")
    ArrowIpc.write(df.repartition(1).sortWithinPartitions($"id"), out,
      batchRows = 64, dictColumns = Set("grp"))
    import scala.collection.JavaConverters._
    val file = Files.list(Paths.get(out)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val alloc = new RootAllocator(Long.MaxValue)
    val ch = Files.newByteChannel(file)
    val reader = new ArrowFileReader(ch, alloc, CommonsCompressionFactory.INSTANCE)
    reader.getVectorSchemaRoot // force footer read
    val blocks = reader.getDictionaryBlocks.asScala.toSeq
    assert(blocks.nonEmpty)
    val rch = new SeekableReadChannel(ch)
    val deltaFlags = blocks.map { blk =>
      rch.setPosition(blk.getOffset)
      val db = MessageSerializer.deserializeDictionaryBatch(rch, blk, alloc)
      try db.isDelta finally db.close()
    }
    reader.close()
    assert(deltaFlags.head == false, "first dictionary batch must be the initial (non-delta) one")
    assert(deltaFlags.tail.forall(identity),
      s"every later dictionary batch must be a delta, got $deltaFlags — replacement is invalid in IPC files")
    assert(deltaFlags.size >= 2)
    // and the values survive the round trip
    val back = ArrowIpc.read(spark, out)
    assert(back.where($"grp".isNull).count() == 64)
    assert(back.select($"grp").distinct().count() == 4) // null + g1..g3
  }

  test("write-side dict encoding: all-null dict column and single-batch file read back") {
    val df = spark.sql(
      "SELECT id, CAST(NULL AS STRING) AS cat, concat('v', CAST(id % 3 AS INTEGER)) AS v FROM range(50)")
    val out = tmp("ipc_dictnull")
    ArrowIpc.write(df.repartition(1), out, dictColumns = Set("cat", "v"))
    val back = ArrowIpc.read(spark, out)
    assert(back.count() == 50)
    assert(back.where($"cat".isNull).count() == 50)
    assert(back.select($"v").distinct().count() == 3)
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
