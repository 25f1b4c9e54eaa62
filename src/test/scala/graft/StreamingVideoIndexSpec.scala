package graft

import graft.multimodal.{Mp4, Multimodal}
import graft.streaming.StreamingVideoIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous video-ingest indexing: per-batch sample index over mixed
  * progressive + fragmented MP4 payloads, quarantine lane for corrupt
  * rows, ingest-health stats, idempotent replay — the indexing twin of
  * StreamingMediaDedupSpec (no pixels ever decode here).
  */
class StreamingVideoIndexSpec extends SparkSpec {
  import spark.implicits._

  private def progressive(nSamples: Int): Array[Byte] =
    Mp4.encode(64, 48, 1000, 40, (0 until nSamples).map(i => Array.fill(10 + i)(i.toByte)),
      keyframes = Seq(0), samplesPerChunk = 2)

  private def fragmented(nSamples: Int): Array[Byte] =
    Mp4.encodeFragmented(64, 48, 1000, 40,
      (0 until nSamples).map(i => Array.fill(10 + i)(i.toByte)),
      keyframes = Seq(0, 2), samplesPerFragment = 2)

  test("stream indexes both layouts, quarantines corrupt payloads, replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("svindex").toString
    val (ixDir, qDir, stDir) = (s"$dir/index", s"$dir/quarantine", s"$dir/stats")
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Array[Byte])]
    val q = StreamingVideoIndex
      .writer(source.toDF.toDF("vid_id", "payload"), "payload", "vid_id", ixDir, qDir, stDir)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    // batch 0: a progressive file and an fMP4 — both layouts index
    source.addData((1L, progressive(4)), (2L, fragmented(4)))
    q.processAllAvailable()
    // batch 1: one good file, one truncated container, one null payload
    source.addData((3L, progressive(3)), (4L, "nonsense".getBytes("UTF-8")),
      (5L, null.asInstanceOf[Array[Byte]]))
    q.processAllAvailable()
    q.stop()

    val ix = StreamingVideoIndex.readIndex(spark, ixDir)
    assert(ix.select($"vid_id").distinct().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(ix.where($"vid_id" === 1L).count() == 4)
    assert(ix.where($"vid_id" === 2L).count() == 4)
    // the fragmented file's index carries the same per-sample facts:
    // keyframes at 0 and 2, sizes 10..13, strictly increasing offsets
    val frag = ix.where($"vid_id" === 2L)
      .select($"sample_no", $"size", $"offset", $"keyframe")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(frag.map(_._2) == Seq(10L, 11L, 12L, 13L), s"sizes: $frag")
    assert(frag.map(_._3) == frag.map(_._3).sorted, s"offsets not monotone: $frag")
    assert(frag.collect { case (n, _, _, true) => n } == Seq(0L, 2L), s"keyframes: $frag")

    // quarantine lane: the corrupt and null rows of batch 1, with reasons
    val quarantined = spark.read.option("basePath", qDir).parquet(s"$qDir/batch=*")
      .select($"vid_id", $"reason").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(quarantined == Seq((4L, "unparseable_container"), (5L, "null_payload")),
      s"quarantine: $quarantined")

    // stats lane: one health line per batch with consistent counts
    val stats = StreamingVideoIndex.readStats(spark, stDir)
      .select($"batch_id", $"n_videos", $"n_indexed", $"n_quarantined", $"n_samples", $"n_keyframes")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(stats == Seq((0L, 2L, 2L, 0L, 8L, 3L), (1L, 3L, 1L, 2L, 3L, 1L)), s"stats: $stats")

    // replay of a committed batch overwrites its own output bit-for-bit
    val batch1 = Seq((3L, progressive(3)), (4L, "nonsense".getBytes("UTF-8")),
      (5L, null.asInstanceOf[Array[Byte]])).toDF("vid_id", "payload")
    StreamingVideoIndex.applyBatch(batch1, 1L, "payload", "vid_id", ixDir, qDir, stDir)
    assert(StreamingVideoIndex.readIndex(spark, ixDir).count() == 11)
    assert(StreamingVideoIndex.readStats(spark, stDir).count() == 2)
  }

  test("mixed-container batch: MP4, fMP4 and WebM index side by side via auto dispatch") {
    val webm = graft.multimodal.Webm.encode(64, 48, 40,
      (0 until 4).map(i => Array.fill(10 + i)(i.toByte)), Seq(0, 2), samplesPerCluster = 2)
    val batch = Seq(
      (1L, progressive(4)), (2L, fragmented(4)), (3L, webm),
      (4L, "garbage bytes, no container".getBytes("UTF-8"))
    ).toDF("vid_id", "payload")
    val dir = java.nio.file.Files.createTempDirectory("svindex_mix").toString
    StreamingVideoIndex.applyBatch(batch, 0L, "payload", "vid_id",
      s"$dir/ix", s"$dir/q", s"$dir/st")
    val ix = spark.read.parquet(s"$dir/ix/batch=0")
    assert(ix.select($"vid_id").distinct().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L),
      "all three container layouts index in one stream")
    // the WebM rows carry the same unified schema and facts
    val w = ix.where($"vid_id" === 3L)
      .select($"sample_no", $"size", $"keyframe", $"width", $"timescale")
      .as[(Long, Long, Boolean, Int, Long)].collect().sortBy(_._1).toSeq
    assert(w.map(_._2) == Seq(10L, 11L, 12L, 13L))
    assert(w.collect { case (n, _, true, _, _) => n } == Seq(0L, 2L))
    assert(w.forall(r => r._4 == 64 && r._5 == 1000L))
    val quarantined = spark.read.parquet(s"$dir/q/batch=0")
      .select($"vid_id").as[Long].collect().toSeq
    assert(quarantined == Seq(4L))
  }

  test("batch indexing of the synthetic gate payloads matches the direct operator") {
    val docs = Seq(0L, 1L, 2L).toDF("doc_id")
      .select($"doc_id", org.apache.spark.sql.functions.udf(
        (id: Long) => Multimodal.syntheticMp4(id)).apply($"doc_id").as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("svindex_b").toString
    StreamingVideoIndex.applyBatch(docs, 0L, "payload", "doc_id",
      s"$dir/ix", s"$dir/q", s"$dir/st")
    val direct = Multimodal.indexVideoMp4(docs, "doc_id", "payload").count()
    assert(spark.read.parquet(s"$dir/ix/batch=0").count() == direct)
    assert(spark.read.parquet(s"$dir/q/batch=0").count() == 0)
  }
}
