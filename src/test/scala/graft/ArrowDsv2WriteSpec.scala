package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The DSv2 write path (`df.write.format("arrowipc")`): same
  * per-partition engine as [[ArrowIpc.write]] (IpcPartWriter), so files
  * must round-trip identically — including dictionary encoding and the
  * per-batch statistics that drive filter skipping — under append and
  * overwrite semantics.
  */
class ArrowDsv2WriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(name).resolve("t").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cat", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def df(from: Int, n: Int, parts: Int = 2) =
    spark.createDataFrame(
      spark.sparkContext.parallelize((from until from + n).map(i =>
        Row(i.toLong, if (i % 9 == 0) null else s"cat_${i % 7}", i * 1.5)), parts),
      schema)

  private def arrowFiles(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".arrow")).toSeq.sorted

  test("append write round-trips through both read surfaces; default " +
      "ErrorIfExists mode is refused") {
    val out = tmp("dsv2w_rt")
    intercept[Exception] { // DSv2 TableProvider requires explicit append/overwrite
      df(0, 100).write.format("arrowipc").save(out)
    }
    df(0, 1000).write.format("arrowipc").mode("append").save(out)
    assert(Files.exists(Paths.get(out, "_SUCCESS")))
    assert(arrowFiles(out).size == 2) // one per partition
    val back = spark.read.format("arrowipc").load(out)
    assert(back.schema.map(f => (f.name, f.dataType)) == schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 1000)
    assert(back.agg(sum($"id")).head.getLong(0) == (0L until 1000L).sum)
    // the native reader sees the same store
    assert(ArrowIpc.read(spark, out).count() == 1000)
    // a second append lands NEXT TO the first (job-unique names)
    df(1000, 500).write.format("arrowipc").mode("append").save(out)
    assert(arrowFiles(out).size == 4)
    val all = spark.read.format("arrowipc").load(out)
    assert(all.count() == 1500)
    assert(all.agg(sum($"id")).head.getLong(0) == (0L until 1500L).sum)
  }

  test("overwrite retires the previous generation's files") {
    val out = tmp("dsv2w_ow")
    df(0, 800).write.format("arrowipc").mode("append").save(out)
    val gen1 = arrowFiles(out)
    df(5000, 200, parts = 1).write.format("arrowipc").mode("overwrite").save(out)
    val gen2 = arrowFiles(out)
    assert(gen2.size == 1 && gen1.intersect(gen2).isEmpty,
      s"old files survived the overwrite: gen1=$gen1 gen2=$gen2")
    val back = spark.read.format("arrowipc").load(out)
    assert(back.count() == 200)
    assert(back.agg(min($"id"), max($"id")).head.toSeq == Seq(5000L, 5199L))
  }

  test("append schema drift is refused on the driver with both schemas named") {
    val out = tmp("dsv2w_drift")
    df(0, 100).write.format("arrowipc").mode("append").save(out)
    val drifted = df(0, 10).withColumnRenamed("score", "points")
    val e = intercept[Exception] {
      drifted.write.format("arrowipc").mode("append").save(out)
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("does not match"), chain(e))
    // the store is untouched
    assert(spark.read.format("arrowipc").load(out).count() == 100)
    // overwrite with the new schema is the sanctioned route
    drifted.write.format("arrowipc").mode("overwrite").save(out)
    val back = spark.read.format("arrowipc").load(out)
    assert(back.columns.toSeq == Seq("id", "cat", "points") && back.count() == 10)
  }

  test("write options reach the engine: dictColumns encodes, batchRows " +
      "sizes batches, stats drive filter skipping on the written store") {
    val out = tmp("dsv2w_opts")
    df(0, 1000, parts = 1).write.format("arrowipc")
      .option("dictColumns", "cat").option("batchRows", "128")
      .mode("append").save(out)
    // dictionary marker survives the round trip (the read schema carries
    // the dict-encoded metadata the writer re-consumes)
    val back = spark.read.format("arrowipc").load(out)
    val catField = back.schema.fields.find(_.name == "cat").get
    assert(catField.metadata.contains(ArrowIpc.DictKey),
      s"cat not dictionary-encoded: ${catField.metadata}")
    // batchRows=128 over 1000 rows -> 8 batches in the single file
    val f = Files.list(Paths.get(out)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".arrow")).toSeq.head
    assert(ArrowIpc.recordBatchBlocks(spark, f).size == 8)
    // the written stats skip batches for a range predicate - byte parity
    // with an unfiltered pruned scan proves skipping engaged
    val (got, filteredBytes) = ArrowIpc.bytesReadDuring {
      spark.read.format("arrowipc").load(out)
        .where($"id" >= 0L && $"id" < 100L).select($"id").collect()
    }
    assert(got.length == 100)
    val (_, allBytes) = ArrowIpc.bytesReadDuring {
      spark.read.format("arrowipc").load(out).select($"id").collect()
    }
    assert(filteredBytes < allBytes / 2,
      s"written stats did not skip: $filteredBytes vs $allBytes")
    // bad option values fail loud with the knob named
    val e = intercept[Exception] {
      df(0, 10).write.format("arrowipc").option("dictColumns", "nope")
        .mode("overwrite").save(out)
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("no such column path"), chain(e))
  }

  test("empty dataframe write leaves a readable schema-carrying store") {
    val out = tmp("dsv2w_empty")
    df(0, 100).where($"id" < 0).write.format("arrowipc").mode("append").save(out)
    val back = spark.read.format("arrowipc").load(out)
    assert(back.count() == 0)
    assert(back.schema.map(f => (f.name, f.dataType)) == schema.map(f => (f.name, f.dataType)))
  }

  test("DSv2-written store equals a native-written store value-for-value " +
      "(same engine, two surfaces)") {
    val d = df(0, 2000)
    val v2Out = tmp("dsv2w_parity_v2")
    val natOut = tmp("dsv2w_parity_nat")
    d.write.format("arrowipc").option("dictColumns", "cat")
      .option("batchRows", "256").mode("append").save(v2Out)
    ArrowIpc.write(d, natOut, batchRows = 256, dictColumns = Set("cat"))
    def canon(dir: String): Seq[Seq[Any]] =
      ArrowIpc.read(spark, dir).orderBy($"id").collect().toSeq.map(_.toSeq)
    assert(canon(v2Out) == canon(natOut))
  }
}
