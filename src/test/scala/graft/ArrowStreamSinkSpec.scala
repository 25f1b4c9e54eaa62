package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The arrowipc STREAMING sink (`df.writeStream.format("arrowipc")`):
  * the produce side of the reference's consume-while-producing story —
  * each epoch appends one complete IPC file per partition, the partial
  * reader (and the plain footer reader — every committed file is
  * footer-complete) consumes the growing store live, and epoch replay
  * is idempotent by deterministic (pid, epoch) naming.
  */
class ArrowStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def arrowFiles(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".arrow")).toSeq.sorted

  test("epochs append complete files; both readers see the growing store; " +
      "totals equal the fed data") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_sink").toString
    val out = s"$dir/store"
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = source.toDF.toDF("id", "cat")
      .writeStream.format("arrowipc")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("dictColumns", "cat")
      .start(out)
    try {
      source.addData((0L until 100L).map(i => (i, s"c${i % 5}")): _*)
      q.processAllAvailable()
      val afterE0 = arrowFiles(out)
      assert(afterE0.nonEmpty && afterE0.forall(_.contains("-e0")),
        s"epoch-0 files: $afterE0")
      // mid-stream consumption: the partial reader AND the footer reader
      // both see exactly the committed epoch
      assert(ArrowIpc.readPartial(spark, out).count() == 100)
      assert(ArrowIpc.read(spark, out).count() == 100)
      source.addData((100L until 250L).map(i => (i, s"c${i % 5}")): _*)
      q.processAllAvailable()
      assert(arrowFiles(out).exists(_.contains("-e1")))
      val back = spark.read.format("arrowipc").load(out)
      assert(back.count() == 250)
      assert(back.agg(sum($"id")).head.getLong(0) == (0L until 250L).sum)
      // dictionary option reached the sink
      assert(back.schema.fields.find(_.name == "cat").get.metadata
        .contains(ArrowIpc.DictKey))
    } finally q.stop()
  }

  test("epoch replay is idempotent: rewriting the same (pid, epoch) " +
      "replaces the file instead of duplicating rows") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_sink_replay").toString
    val out = s"$dir/store"
    implicit val sqlCtx = spark.sqlContext
    // run epoch 0 through a real query, then simulate the post-crash
    // replay by re-running a writer for the SAME (pid, epoch) directly
    val source = MemoryStream[(Long, String)]
    val q = source.toDF.toDF("id", "cat")
      .writeStream.format("arrowipc")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(out)
    try {
      source.addData((0L until 64L).map(i => (i, s"c$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val files0 = arrowFiles(out)
    val n0 = spark.read.format("arrowipc").load(out).count()
    // replay: same partition ids, same epoch, same rows -> same names,
    // same count (the files are REPLACED, not appended)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cat", org.apache.spark.sql.types.StringType)))
    files0.zipWithIndex.foreach { case (f, _) =>
      val pid = f.stripPrefix("part-").take(5).toInt
      val w = new graft.sources.ArrowIpc.IpcPartWriter(
        spark.sparkContext.hadoopConfiguration, out, schema, Set.empty,
        4096, 0, f, s".$f-replay.tmp", replacePrior = true)
      try {
        // re-feed the rows that landed in this file
        val rows = ArrowIpc.read(spark, s"$out/$f").collect()
        rows.foreach { r =>
          w.writeRow(org.apache.spark.sql.catalyst.InternalRow(
            r.getLong(0), org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))))
        }
        w.commit()
      } finally w.close()
    }
    assert(arrowFiles(out) == files0, "replay must not add files")
    assert(spark.read.format("arrowipc").load(out).count() == n0,
      "replay must not duplicate rows")
  }

  test("append-mode epoch commit retires THIS epoch's unwritten files: a " +
      "replay with fewer partitions cannot leave the original's extras as dupes") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_sink_shrink").toString
    val out = s"$dir/store"
    java.nio.file.Files.createDirectories(Paths.get(out))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    def writeFile(name: String, ids: Range): Unit = {
      val w = new graft.sources.ArrowIpc.IpcPartWriter(
        spark.sparkContext.hadoopConfiguration, out, schema, Set.empty, 4096, 0,
        name, s".$name.tmp", replacePrior = true)
      try {
        ids.foreach(i => w.writeRow(org.apache.spark.sql.catalyst.InternalRow(i.toLong)))
        w.commit()
      } finally w.close()
    }
    // crashed original of epoch 0 ran 2 partitions; epoch 1 is committed
    writeFile("part-00000-e0.arrow", 0 until 10)
    writeFile("part-00001-e0.arrow", 10 until 20)
    writeFile("part-00000-e1.arrow", 20 until 30)
    // the replay of epoch 0 rewrote only partition 0 (source coalesced
    // after restart); its commit must retire the orphaned partition 1
    // of THE SAME epoch and leave epoch 1 alone
    val w = new graft.sources.ArrowIpcWrite(out, schema, Set.empty, 4096, 0,
      overwrite = false, "qid",
      new org.apache.spark.SerializableWritable(spark.sparkContext.hadoopConfiguration))
    w.toStreaming.commit(0L,
      Array(graft.sources.ArrowIpcFileCommitted("part-00000-e0.arrow")))
    assert(arrowFiles(out) == Seq("part-00000-e0.arrow", "part-00000-e1.arrow"),
      s"epoch self-clean wrong: ${arrowFiles(out)}")
    assert(spark.read.format("arrowipc").load(out).count() == 20)
  }

  test("complete output mode retires prior epochs (truncate per epoch)") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_sink_complete").toString
    val out = s"$dir/store"
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val counts = source.toDF.toDF("id", "cat")
      .groupBy($"cat").agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("arrowipc")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(out)
    try {
      source.addData((0L until 50L).map(i => (i, s"c${i % 3}")): _*)
      q.processAllAvailable()
      val e0 = spark.read.format("arrowipc").load(out)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(e0.values.sum == 50)
      source.addData((50L until 80L).map(i => (i, s"c${i % 3}")): _*)
      q.processAllAvailable()
      // the store holds ONLY the latest epoch's table
      assert(arrowFiles(out).forall(_.contains("-e1")),
        s"stale epoch files survived: ${arrowFiles(out)}")
      val e1 = spark.read.format("arrowipc").load(out)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(e1.values.sum == 80, s"complete-mode table wrong: $e1")
    } finally q.stop()
  }
}
