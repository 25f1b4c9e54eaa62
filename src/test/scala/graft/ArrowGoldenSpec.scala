package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Reads the reference's COMMITTED golden Arrow files directly — the
  * strongest migration proof available: these are real stores written by
  * the reference engine itself and checked into its repository
  * (org.knime.core.columnar.arrow.tests/test_data/; generator mains in
  * Lz4BlockCompressionLegacyTest.java:142-153).
  *
  * Two of these files (data.arrow, compressed.arrow) use the reference's
  * LEGACY LZ4-block compression — codec byte -2, not part of the Arrow
  * format (ArrowCompressionUtil.java:157) — which pyarrow refuses
  * ("Unsupported codec") and arrow-java silently misreads; they exercise
  * [[ArrowIpc]]'s footer-driven legacy path. The ZonedDateTime files
  * additionally exercise struct columns, NESTED dictionary-encoded
  * large_binary columns with per-batch dictionary REPLACEMENT
  * (OnHeapArrowDictEncodedStringData.java, DictKeys.java:72-206), and
  * time64[ns] (pyarrow also refuses the replacement files).
  */
class ArrowGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/root/reference/org.knime.core.columnar.arrow.tests/test_data"
  private def golden(rel: String): String = s"$base/$rel"
  private def available: Boolean = Files.isDirectory(Paths.get(base))

  /** Row canonicalizer for compare: Row.toString prints binary columns by
    * object identity, so hex-encode byte arrays recursively.
    */
  private def canon(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case r: Row => r.toSeq.map(canon).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canon(k) + "->" + canon(x) }.sorted.mkString("{", ",", "}")
    case x => x.toString
  }

  /** Length-prefixed binary → the string payload (the reference's
    * serializer writes [int32 LE length][UTF-8 bytes] for zone ids).
    */
  private def lpString(b: Array[Byte]): String = {
    val len = (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
    assert(len == b.length - 4, s"length prefix $len != payload ${b.length - 4}")
    new String(b, 4, len, "UTF-8")
  }

  test("legacy LZ4-block store (data.arrow): exact contents per the reference's generator") {
    assume(available)
    // generator: 3 batches x 20 rows; int col = i % (10*(batch+1)), null at
    // i%7==0; string col = STRINGS[(i+batch) % 5], null at i%13==0
    // (Lz4BlockCompressionLegacyTest.java:159-186)
    val strings = Array("foo", "bar", "car", "aaa", "bbb")
    val df = ArrowIpc.read(spark, golden("LZ4_block_compression/data.arrow"))
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      Seq(("0", IntegerType), ("1", StringType)))
    val rows = df.collect() // single file = single partition: file order kept
    assert(rows.length == 60)
    for (k <- 0 until 60) {
      val batch = k / 20; val i = k % 20
      val wantInt = if (i % 7 == 0) null else Int.box(i % (10 * (batch + 1)))
      val wantStr = if (i % 13 == 0) null else strings((i + batch) % 5)
      assert(rows(k).get(0) == wantInt, s"row $k int")
      assert(rows(k).get(1) == wantStr, s"row $k string")
    }
    // the reference's store metadata surfaces for migration tooling
    val meta = ArrowIpc.storeMetadataOf(spark, golden("LZ4_block_compression/data.arrow"))
    assert(meta.get("KNIME:basic:chunkSize").contains("20"))
    assert(meta.get("KNIME:basic:usingLz4Block").contains("true"))
  }

  test("single_batch.arrow: struct + nested dict-encoded zoneId decode to known values") {
    assume(available)
    val df = ArrowIpc.read(spark, golden("ZonedDateTime_legacy_files/single_batch.arrow"))
    // schema: one struct col with the ZonedDateTime decomposition; zoneId
    // is dict-encoded large_binary, nanoOfDay is time64[ns]
    val st = df.schema("0").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("epochDay", "nanoOfDay", "zoneOffset", "zoneId"))
    assert(st("epochDay").dataType == LongType)
    assert(st("nanoOfDay").dataType == LongType)
    assert(st("nanoOfDay").metadata.getString(ArrowIpc.LogicalKey) == "time64[ns]")
    assert(st("zoneOffset").dataType == IntegerType)
    assert(st("zoneId").dataType == BinaryType)
    assert(st("zoneId").metadata.getString(ArrowIpc.DictKey) == "true")
    val rows = df.collect()
    assert(rows.length == 20)
    // null pattern: i % 7 == 0 (cross-checked against pyarrow, which CAN
    // read this single-dictionary file)
    for (i <- 0 until 20)
      assert(rows(i).isNullAt(0) == (i % 7 == 0), s"null pattern at $i")
    // pyarrow-derived ground truth for row 1
    val r1 = rows(1).getStruct(0)
    assert(r1.getLong(0) == 168652335705L)
    assert(r1.getLong(1) == 25576982112925L)
    assert(r1.getInt(2) == 36000)
    assert(lpString(r1.getAs[Array[Byte]](3)) == "Pacific/Truk")
    // row 18 (deep in the dictionary): America/North_Dakota/Beulah
    val r18 = rows(18).getStruct(0)
    assert(r18.getLong(0) == 169895671266L)
    assert(lpString(r18.getAs[Array[Byte]](3)) == "America/North_Dakota/Beulah")
  }

  test("multiple_batches.arrow: per-batch dictionary REPLACEMENT resolves correctly") {
    assume(available)
    val df = ArrowIpc.read(spark, golden("ZonedDateTime_legacy_files/multiple_batches.arrow"))
    val rows = df.collect()
    assert(rows.length == 60)
    // every batch re-writes dictionary id 0; values must decode per batch
    // (arrow-java probe ground truth: batch b, row 1 epochDay)
    assert(rows(1).getStruct(0).getLong(0) == 168652335705L)
    assert(rows(21).getStruct(0).getLong(0) == 168848650128L)
    assert(rows(41).getStruct(0).getLong(0) == 168783222872L)
    // all decoded zone ids are well-formed length-prefixed zone names
    val zones = rows.iterator.filter(!_.isNullAt(0)).map(_.getStruct(0))
      .filter(!_.isNullAt(3)).map(s => lpString(s.getAs[Array[Byte]](3))).toSeq
    assert(zones.nonEmpty)
    zones.foreach(z => assert(z.nonEmpty && z.forall(c => !c.isControl), s"bad zone '$z'"))
    // THE replacement-correctness invariant: the generator slides the same
    // (epochDay, zone) tuples across batches, so a given epochDay must
    // decode to ONE zone everywhere. Binding any batch to a stale
    // dictionary (what plain ArrowFileReader does) breaks this massively:
    // epochDay 168848650128 sits at batch0-row2 AND batch1-row1, and the
    // pyarrow-validated pairing says America/Porto_Acre for both.
    val pairing = rows.iterator.filter(!_.isNullAt(0)).map(_.getStruct(0))
      .filter(!_.isNullAt(3))
      .map(s => (s.getLong(0), lpString(s.getAs[Array[Byte]](3)))).toSeq
    pairing.groupBy(_._1).foreach { case (epoch, zs) =>
      assert(zs.map(_._2).distinct.size == 1,
        s"epochDay $epoch decodes to multiple zones (stale dictionary): ${zs.map(_._2).distinct}")
    }
    assert(pairing.toMap.get(168848650128L).contains("America/Porto_Acre"))
    // deterministic: a second read hashes identically
    val again = ArrowIpc.read(spark, golden("ZonedDateTime_legacy_files/multiple_batches.arrow")).collect()
    assert(rows.map(canon).toSeq == again.map(canon).toSeq)
  }

  test("compressed.arrow (legacy path) agrees with multiple_columns.arrow (standard path)") {
    assume(available)
    // same generated table written twice by the reference: once plain,
    // once LZ4-block compressed. Equality proves the legacy
    // decompression + dictionary handling byte-exact against the
    // standard arrow-java path.
    val legacy = ArrowIpc.read(spark, golden("ZonedDateTime_legacy_files/compressed.arrow")).collect()
    val standard = ArrowIpc.read(spark, golden("ZonedDateTime_legacy_files/multiple_columns.arrow")).collect()
    assert(legacy.length == 60 && standard.length == 60)
    legacy.zip(standard).zipWithIndex.foreach { case ((l, st2), i) =>
      if (canon(l) != canon(st2)) info(s"DIFF at $i:\n  legacy  =${canon(l)}\n  standard=${canon(st2)}")
    }
    assert(legacy.map(canon).toSeq == standard.map(canon).toSeq)
    val meta = ArrowIpc.storeMetadataOf(spark, golden("ZonedDateTime_legacy_files/compressed.arrow"))
    assert(meta.get("KNIME:basic:usingLz4Block").contains("true"))
  }

  test("struct_list.arrow: struct<struct, int, list<struct>> with three dictionaries") {
    assume(available)
    val df = ArrowIpc.read(spark, golden("ZonedDateTime_legacy_files/struct_list.arrow"))
    val outer = df.schema("0").dataType.asInstanceOf[StructType]
    assert(outer("0").dataType.isInstanceOf[StructType])
    assert(outer("1").dataType == IntegerType)
    val lst = outer("2").dataType.asInstanceOf[ArrayType]
    assert(lst.elementType.isInstanceOf[StructType])
    val rows = df.collect()
    assert(rows.length == 60)
    // arrow-java probe ground truth: batch 0 row 1 int field
    val r1 = rows(1).getStruct(0)
    assert(r1.getInt(1) == -1661998771)
    // nested list-of-struct zoneIds (dictionary id 1) decode to sane names
    val nested = r1.getSeq[Row](2)
    assert(nested.length == 5)
    assert(lpString(nested.head.getAs[Array[Byte]](3)).nonEmpty)
    // batch 2 row 1 has an empty nested list (probe ground truth)
    assert(rows(41).getStruct(0).getSeq[Row](2).isEmpty)
    // migration to parquet (the recommended repeated-analytics path) keeps
    // every nested value
    val pq = Files.createTempDirectory("golden_pq").resolve("t").toString
    df.write.parquet(pq)
    val back = spark.read.parquet(pq).collect()
    assert(back.map(canon).sorted.toSeq == rows.map(canon).sorted.toSeq)
  }

  test("migration round-trip: replacement-dict golden rewrites as initial+delta, contents identical") {
    assume(available)
    // the reference's multiple_batches.arrow re-writes dictionary id 0
    // per batch (REPLACEMENT - invalid in IPC files per the Arrow spec,
    // pyarrow refuses it). The migration path is: our reader resolves the
    // replacements correctly, our writer re-encodes the same dictionary
    // columns as ONE initial batch + DELTAS per id - the spec-portable
    // shape - with contents byte-identical
    val src = golden("ZonedDateTime_legacy_files/multiple_batches.arrow")
    val df = graft.sources.ArrowIpc.read(spark, src)
    val out = java.nio.file.Files.createTempDirectory("arrow_migrate")
      .resolve("t").toString
    // small batches force multiple record batches -> deltas exercised
    graft.sources.ArrowIpc.write(df.repartition(1), out, batchRows = 16)
    val back = graft.sources.ArrowIpc.read(spark, out).collect()
    assert(back.length == 60)
    assert(df.collect().map(canon).sorted.toSeq == back.map(canon).sorted.toSeq)
    // the rewritten store: per dictionary id, first batch initial, every
    // later one a delta - no replacement anywhere
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowFileReader
    import org.apache.arrow.vector.ipc.SeekableReadChannel
    import org.apache.arrow.vector.ipc.message.MessageSerializer
    import org.apache.arrow.compression.CommonsCompressionFactory
    import scala.collection.JavaConverters._
    val file = Files.list(Paths.get(out)).iterator().asScala
      .find(_.toString.endsWith(".arrow")).get
    val alloc = new RootAllocator(Long.MaxValue)
    val ch = Files.newByteChannel(file)
    val reader = new ArrowFileReader(ch, alloc, CommonsCompressionFactory.INSTANCE)
    reader.getVectorSchemaRoot
    val blocks = reader.getDictionaryBlocks.asScala.toSeq
    assert(blocks.nonEmpty, "rewritten store lost its dictionary encoding")
    val rch = new SeekableReadChannel(ch)
    val flagsById = blocks.map { blk =>
      rch.setPosition(blk.getOffset)
      val db = MessageSerializer.deserializeDictionaryBatch(rch, blk, alloc)
      try (db.getDictionaryId, db.isDelta) finally db.close()
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    reader.close()
    flagsById.foreach { case (id, flags) =>
      assert(!flags.head, s"dict $id: first batch must be the initial one")
      assert(flags.tail.forall(identity),
        s"dict $id: later batches must all be deltas, got $flags - " +
          "replacement is invalid in IPC files")
    }
    // deltas actually happened (the golden's zone vocabulary spans batches)
    assert(flagsById.values.exists(_.size >= 2),
      s"expected at least one delta batch, got $flagsById")
  }
}
