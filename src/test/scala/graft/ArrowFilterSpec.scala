package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Batch-statistics filter skipping on Arrow IPC reads: engine-written
  * files carry per-batch min/max/null stats in the footer, and
  * `read(path, columns, filters)` must (a) return EXACTLY the rows the
  * filters select — for every supported filter shape, on stats-bearing
  * and stats-free (foreign) files alike — and (b) actually skip
  * non-matching batches' bytes, asserted via the reader's IO counter on
  * a sorted write where batches partition the keyspace.
  */
class ArrowFilterSpec extends SparkSpec {

  private def tmp(name: String) =
    Files.createTempDirectory(name).resolve("t").toString

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.map(x => f"$x%02x").mkString
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  private def bytesRead[T](f: => T): (T, Long) = ArrowIpc.bytesReadDuring(f)

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("qty", IntegerType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("cat", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("d", DateType, nullable = true),
    StructField("allnull", IntegerType, nullable = true)))

  private def rows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(
      i.toLong,
      if (i % 11 == 0) null else i % 50,
      if (i % 13 == 0) null else i * 0.25,
      if (i % 7 == 0) null else s"cat_${i % 5}",
      if (i % 17 == 0) null else java.sql.Timestamp.valueOf(s"2026-01-${i % 28 + 1} 12:00:00"),
      if (i % 19 == 0) null else java.sql.Date.valueOf(s"2025-0${i % 9 + 1}-15"),
      null)
  }

  // sorted by id → batches partition the keyspace → range filters skip
  private lazy val store: String = {
    val out = tmp("ipc_filter")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows(8000), 1), schema).orderBy("id")
    ArrowIpc.write(df, out, batchRows = 512)
    out
  }

  test("every supported filter shape returns exactly the brute-force rows") {
    val full = ArrowIpc.read(spark, store)
    val cases: Seq[(Seq[Filter], org.apache.spark.sql.Column)] = Seq(
      (Seq(EqualTo("qty", 7)), col("qty") === 7),
      (Seq(GreaterThan("id", 7000L)), col("id") > 7000L),
      (Seq(GreaterThanOrEqual("price", 1900.0)), col("price") >= 1900.0),
      (Seq(LessThan("id", 300L)), col("id") < 300L),
      (Seq(LessThanOrEqual("qty", 2)), col("qty") <= 2),
      (Seq(In("cat", Array("cat_1", "cat_3"))), col("cat").isin("cat_1", "cat_3")),
      (Seq(IsNull("qty")), col("qty").isNull),
      (Seq(IsNotNull("cat"), LessThan("id", 100L)), col("cat").isNotNull && col("id") < 100L),
      (Seq(Or(LessThan("id", 50L), GreaterThan("id", 7950L))), col("id") < 50L || col("id") > 7950L),
      (Seq(And(GreaterThan("id", 1000L), LessThan("id", 1200L))), col("id") > 1000L && col("id") < 1200L),
      (Seq(Not(EqualTo("qty", 7))), !(col("qty") === 7)),
      (Seq(StringStartsWith("cat", "cat_4")), col("cat").startsWith("cat_4")),
      (Seq(EqualTo("ts", java.sql.Timestamp.valueOf("2026-01-05 12:00:00"))),
        col("ts") === java.sql.Timestamp.valueOf("2026-01-05 12:00:00")),
      (Seq(GreaterThan("d", java.sql.Date.valueOf("2025-07-01"))),
        col("d") > lit(java.sql.Date.valueOf("2025-07-01"))),
      (Seq(EqualTo("allnull", 1)), col("allnull") === 1),
      (Seq(IsNull("allnull")), col("allnull").isNull))
    cases.foreach { case (fs, pred) =>
      val got = ArrowIpc.readFiltered(spark, store, fs)
      assert(canon(got) == canon(full.where(pred)), s"filters $fs")
    }
  }

  test("range filter on the sorted key skips non-matching batches' bytes") {
    ArrowIpc.read(spark, store).count() // warm footer/page caches either way
    val (allRows, fullBytes) = bytesRead(ArrowIpc.readFiltered(spark, store, Nil).count())
    assert(allRows == 8000)
    val fs = Seq(GreaterThanOrEqual("id", 1000L), LessThan("id", 1512L))
    val (hit, narrowBytes) = bytesRead(ArrowIpc.readFiltered(spark, store, fs).count())
    assert(hit == 512)
    // 8000 rows / 512-row batches = 16 batches; the range covers 2
    assert(narrowBytes < fullBytes / 4,
      s"narrow range read $narrowBytes B, full $fullBytes B — batches not skipped?")
    // impossible predicate: zero batches survive
    val (none, noneBytes) = bytesRead(
      ArrowIpc.readFiltered(spark, store, Seq(GreaterThan("id", 1000000L))).count())
    assert(none == 0)
    assert(noneBytes < narrowBytes / 2, s"impossible filter still read $noneBytes B")
    // all-null column: equality can never match, IsNull reads everything
    val (z, zBytes) = bytesRead(
      ArrowIpc.readFiltered(spark, store, Seq(EqualTo("allnull", 1))).count())
    assert(z == 0 && zBytes < noneBytes * 2)
  }

  test("filters compose with column pruning; filter-only columns drop from the output") {
    val got = ArrowIpc.read(spark, store, Seq("cat", "id"),
      Seq(And(GreaterThanOrEqual("id", 2000L), LessThan("id", 2100L)), IsNotNull("qty")))
    assert(got.schema.fieldNames.toSeq == Seq("cat", "id"))
    val want = ArrowIpc.read(spark, store)
      .where(col("id") >= 2000L && col("id") < 2100L && col("qty").isNotNull)
      .select(col("cat"), col("id"))
    assert(canon(got) == canon(want))
    // duplicated output names under filters re-expand after the residual
    val dup = ArrowIpc.read(spark, store, Seq("id", "id"), Seq(LessThan("id", 10L)))
    assert(dup.schema.fieldNames.toSeq == Seq("id", "id"))
    assert(dup.count() == 10)
  }

  test("dictionary-encoded string column gets stats: equality on it skips batches") {
    val out = tmp("ipc_filter_dict")
    val df = spark.range(0, 8000).select(
      col("id"),
      concat(lit("cat_"), (col("id") / 1000).cast("int").cast("string")).as("cat"),
      concat(lit("pad" * 100), col("id").cast("string")).as("payload"))
      .orderBy("cat", "id") // batches carry narrow cat ranges
    graft.sources.ArrowIpc.write(df, out, batchRows = 512, dictColumns = Set("cat"))
    val full = ArrowIpc.read(spark, out)
    val (_, fullBytes) = bytesRead(full.collect().length)
    val (got, dictBytes) = bytesRead(
      ArrowIpc.readFiltered(spark, out, Seq(EqualTo("cat", "cat_3"))).collect())
    assert(got.length == 1000)
    assert(got.forall(_.getAs[String]("cat") == "cat_3"))
    assert(dictBytes < fullBytes / 3,
      s"dict-column equality read $dictBytes B vs full $fullBytes B — batches not skipped?")
    // a value outside the dictionary skips everything
    val (none, _) = bytesRead(
      ArrowIpc.readFiltered(spark, out, Seq(EqualTo("cat", "zzz"))).count())
    assert(none == 0)
  }

  test("foreign files without stats: filters stay exact, nothing is skipped") {
    val base = "/root/reference/org.knime.core.columnar.arrow.tests/test_data"
    assume(Files.isDirectory(Paths.get(base)))
    val g = s"$base/LZ4_block_compression/data.arrow"
    val full = ArrowIpc.read(spark, g)
    val key = full.schema.fieldNames.head // int column per the generator
    val got = ArrowIpc.readFiltered(spark, g, Seq(GreaterThan(key, 5)))
    assert(canon(got) == canon(full.where(col(key) > 5)))
  }

  test("signed zeros: a batch of -0.0 survives >= 0.0 and == 0.0 filters (review fix)") {
    // java.lang.Double.compare orders -0.0 < 0.0; Spark's residual treats
    // them equal — the skip decision must agree with the residual or rows
    // vanish silently (the parquet ±0.0 bounds hazard)
    val out = tmp("ipc_filter_zero")
    val df = spark.range(0, 1024).select(
      col("id"),
      when(col("id") < 512, lit(-0.0)).otherwise(lit(1.5)).as("v"))
      .orderBy("id") // first two batches are all -0.0
    ArrowIpc.write(df, out, batchRows = 256)
    val ge = ArrowIpc.readFiltered(spark, out, Seq(GreaterThanOrEqual("v", 0.0)))
    assert(ge.count() == 1024, "-0.0 rows must satisfy >= 0.0")
    val eq = ArrowIpc.readFiltered(spark, out, Seq(EqualTo("v", 0.0)))
    assert(eq.count() == 512, "-0.0 rows must satisfy == 0.0")
    val lt = ArrowIpc.readFiltered(spark, out, Seq(LessThan("v", 0.0)))
    assert(lt.count() == 0, "-0.0 is not < 0.0 under Spark semantics")
  }

  test("StringStartsWith with a prefix ending near the surrogate range (review fix)") {
    // bumping the last CHAR of "a퟿" lands on an unpaired surrogate
    // that UTF8String encodes as '?' — byte-wise SMALLER than the prefix;
    // the upper bound must be computed over UTF-8 bytes instead
    val out = tmp("ipc_filter_surrogate")
    import spark.implicits._
    val df = (0 until 512).map(i => (i.toLong, "a퟿x" + i)).toDF("id", "s").orderBy("id")
    ArrowIpc.write(df, out, batchRows = 128)
    val got = ArrowIpc.readFiltered(spark, out, Seq(StringStartsWith("s", "a퟿")))
    assert(got.count() == 512, "every row starts with the prefix; none may be skipped")
    val none = ArrowIpc.readFiltered(spark, out, Seq(StringStartsWith("s", "b")))
    assert(none.count() == 0)
  }

  // ---- nested struct leaves (round 15): stats under dotted paths ----

  private val nestedSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("page", IntegerType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("tag", StringType, nullable = true),
      StructField("deep", StructType(Seq(
        StructField("k", LongType, nullable = true))), nullable = true))),
      nullable = true),
    StructField("payload", StringType, nullable = true)))

  private def nestedRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(
      i.toLong,
      if (i % 23 == 0) null // struct-null rows: null for every leaf below
      else Row(
        if (i % 11 == 0) null else i / 4, // monotone with id → batches partition
        if (i % 13 == 0) null else i * 0.5,
        if (i % 7 == 0) null else s"t${i % 6}",
        if (i % 5 == 0) null else Row(i.toLong * 3)),
      s"pad" * 50 + i)
  }

  private lazy val nestedStore: String = {
    val out = tmp("ipc_filter_nested")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(nestedRows(8000), 1), nestedSchema).orderBy("id")
    ArrowIpc.write(df, out, batchRows = 512)
    out
  }

  test("nested leaf filters return exactly the brute-force rows, incl. struct-null rows") {
    val full = ArrowIpc.read(spark, nestedStore)
    val cases: Seq[(Seq[Filter], org.apache.spark.sql.Column)] = Seq(
      (Seq(GreaterThan("meta.page", 1500)), col("meta.page") > 1500),
      (Seq(LessThanOrEqual("meta.score", 100.0)), col("meta.score") <= 100.0),
      (Seq(EqualTo("meta.tag", "t3")), col("meta.tag") === "t3"),
      (Seq(In("meta.tag", Array("t1", "t5"))), col("meta.tag").isin("t1", "t5")),
      (Seq(IsNull("meta.page")), col("meta.page").isNull),
      (Seq(IsNotNull("meta.deep.k"), LessThan("id", 200L)),
        col("meta.deep.k").isNotNull && col("id") < 200L),
      (Seq(And(GreaterThanOrEqual("meta.deep.k", 3000L), LessThan("meta.deep.k", 4500L))),
        col("meta.deep.k") >= 3000L && col("meta.deep.k") < 4500L),
      (Seq(StringStartsWith("meta.tag", "t")), col("meta.tag").startsWith("t")))
    cases.foreach { case (fs, pred) =>
      val got = ArrowIpc.readFiltered(spark, nestedStore, fs)
      assert(canon(got) == canon(full.where(pred)), s"filters $fs")
    }
  }

  test("nested leaf range filter skips non-matching batches' bytes") {
    ArrowIpc.read(spark, nestedStore).count() // warm caches
    val (_, fullBytes) = bytesRead(ArrowIpc.readFiltered(spark, nestedStore, Nil).count())
    // page = id/4 ∈ [250, 380) → ids [1000, 1520) → 2 of 16 batches
    val fs = Seq(GreaterThanOrEqual("meta.page", 250), LessThan("meta.page", 380))
    val full = ArrowIpc.read(spark, nestedStore)
    val want = full.where(col("meta.page") >= 250 && col("meta.page") < 380).count()
    val (hit, narrowBytes) = bytesRead(
      ArrowIpc.readFiltered(spark, nestedStore, fs).count())
    assert(hit == want && want > 0)
    assert(narrowBytes < fullBytes / 4,
      s"nested range read $narrowBytes B, full $fullBytes B — batches not skipped?")
    // two-level leaf: deep.k = 3*id ∈ [3000, 4536) → ids [1000, 1512)
    val fs2 = Seq(GreaterThanOrEqual("meta.deep.k", 3000L), LessThan("meta.deep.k", 4536L))
    val want2 = full.where(col("meta.deep.k") >= 3000L && col("meta.deep.k") < 4536L).count()
    val (hit2, bytes2) = bytesRead(
      ArrowIpc.readFiltered(spark, nestedStore, fs2).count())
    assert(hit2 == want2 && want2 > 0)
    assert(bytes2 < fullBytes / 4,
      s"deep-leaf range read $bytes2 B, full $fullBytes B — batches not skipped?")
  }

  test("nested filter composes with column pruning: root struct reads internally, drops from output") {
    val got = ArrowIpc.read(spark, nestedStore, Seq("id"),
      Seq(GreaterThan("meta.page", 1900)))
    assert(got.schema.fieldNames.toSeq == Seq("id"))
    val want = ArrowIpc.read(spark, nestedStore)
      .where(col("meta.page") > 1900).select(col("id"))
    assert(canon(got) == canon(want))
  }

  test("nested DICT-encoded string leaf gets stats: equality on it skips batches") {
    val out = tmp("ipc_filter_nested_dict")
    val df = spark.range(0, 8000).select(
      col("id"),
      struct(
        concat(lit("cat_"), (col("id") / 1000).cast("int").cast("string")).as("cat"),
        (col("id") % 100).cast("int").as("sub")).as("m"),
      concat(lit("pad" * 100), col("id").cast("string")).as("payload"))
      .orderBy(col("m.cat"), col("id")) // batches carry narrow cat ranges
    graft.sources.ArrowIpc.write(df, out, batchRows = 512, dictColumns = Set("m.cat"))
    val full = ArrowIpc.read(spark, out)
    val (_, fullBytes) = bytesRead(full.collect().length)
    val (got, dictBytes) = bytesRead(
      ArrowIpc.readFiltered(spark, out, Seq(EqualTo("m.cat", "cat_3"))).collect())
    assert(got.length == 1000)
    assert(got.forall(_.getAs[Row]("m").getAs[String]("cat") == "cat_3"))
    assert(dictBytes < fullBytes / 3,
      s"nested dict equality read $dictBytes B vs full $fullBytes B — batches not skipped?")
    // a value outside the dictionary skips everything
    val (none, _) = bytesRead(
      ArrowIpc.readFiltered(spark, out, Seq(EqualTo("m.cat", "zzz"))).count())
    assert(none == 0)
  }

  test("written files carry BatchStatsKey in the FILE footer (mutable-fileMeta contract)") {
    // the writer hands ArrowFileWriter a mutable map and mutates it until
    // end(); an arrow-java upgrade that copied the map at construction
    // would silently write no stats (reads stay correct but full-scan) —
    // this pins the contract so the upgrade fails loudly here instead
    import java.nio.file.{Files => F, Paths => P}
    val parts = F.list(P.get(store)).toArray.map(_.toString).filter(_.endsWith(".arrow"))
    assert(parts.nonEmpty)
    parts.foreach { f =>
      val meta = ArrowIpc.fileMetadataOf(spark, f)
      assert(meta.contains(ArrowIpc.BatchStatsKey),
        s"$f footer lost ${ArrowIpc.BatchStatsKey} - ArrowFileWriter no longer " +
          "serializes file metadata mutated after construction")
    }
  }

  test("corrupt/mismatched stats metadata only disables skipping") {
    // hand-break the stats: parseBatchStats must reject a wrong batch
    // count and the read must fall back to full scanning, same results
    assert(ArrowIpc.parseBatchStats("not json", 3).isEmpty)
    assert(ArrowIpc.parseBatchStats("[]", 3).isEmpty)
    assert(ArrowIpc.parseBatchStats("""[{"rows":1,"cols":{}}]""", 3).isEmpty)
    val ok = ArrowIpc.parseBatchStats(
      """[{"rows":2,"cols":{"a":{"t":"l","min":1,"max":9,"nulls":0}}}]""", 1)
    assert(ok.exists(_.head.cols.contains("a")))
  }
}
