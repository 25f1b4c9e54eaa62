package graft

import graft.multimodal.{Avi, MediaFingerprintStore, Multimodal}
import graft.streaming.StreamingMediaDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted perceptual media fingerprint index: store-served dedup
  * verdicts are bit-identical to the streaming twin's over the full
  * fingerprint state, appends are committed segments (torn append
  * invisible, committed replay a no-op, id discipline enforced),
  * compaction preserves verdicts, and the guards fail loud.
  */
class MediaFingerprintStoreSpec extends SparkSpec {
  import spark.implicits._

  private val w = 32; private val h = 24; private val nf = 6

  /** Gradient footage, re-renderable with sparse pixel noise (the
    * StreamingMediaDedupSpec fixture).
    */
  private def footage(seed: Int, noise: Int): Array[Byte] =
    Avi.encode(w, h, 10, (0 until nf).map { f =>
      Array.tabulate(w * h) { k =>
        val x = k % w; val y = k / w
        val base = (x * 8 + y * 3 + f * 11 + seed) % 256
        val jig = if (noise != 0 && (x + y * w) % 97 == 0) noise else 0
        ((base + jig) % 256).toByte
      }
    })

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def media(rows: (Long, Array[Byte])*): DataFrame =
    rows.toDF("vid_id", "payload")

  private def survivorIds(df: DataFrame): Seq[Long] =
    df.select($"vid_id").as[Long].collect().sorted.toSeq

  test("dedupBatch == streaming incrementalFps over the full state; append == rebuild") {
    val corpus = media((1L, footage(0, 0)), (2L, footage(50, 0)), (3L, footage(200, 0)))
    val dir = tmp("mfps")
    MediaFingerprintStore.build(corpus, "payload", "vid_id", dir, n = 4, bands = 8,
      nBuckets = 8)
    val m = MediaFingerprintStore.loadManifest(spark, dir)
    assert(m.nDocs == 3 && m.maxId == 3L && m.n == 4)
    // batch: a re-render of corpus footage (dies), new footage (lives),
    // an in-batch re-render pair (higher id dies), an undecodable payload
    // (admitted - no fingerprints, policy for a filter stage)
    val batch = media((10L, footage(0, 5)), (11L, footage(90, 0)),
      (12L, footage(90, 3)), (13L, "junk".getBytes("UTF-8")))
    val got = MediaFingerprintStore.dedupBatch(spark, dir, batch, "payload",
      "vid_id", maxHamming = 6, minMatches = 3)
    // the in-memory twin over the FULL stored fingerprints
    val corpusFps = Multimodal.videoFrameHashes(corpus, "vid_id", "payload", 4)
      .select($"vid_id".as("id"), $"sample_idx".as("slot"), $"frame_hash".as("fp"))
    val batchFps = Multimodal.videoFrameHashes(batch, "vid_id", "payload", 4)
      .select($"vid_id".as("id"), $"sample_idx".as("slot"), $"frame_hash".as("fp"))
    val want = StreamingMediaDedup.incrementalFps(corpusFps, batchFps, batch,
      "vid_id", maxHamming = 6, bands = 8, minMatches = 3)
    assert(survivorIds(got) == survivorIds(want))
    assert(survivorIds(got) == Seq(11L, 13L), s"got ${survivorIds(got)}")

    // fold the survivors in; store state == a from-scratch rebuild
    MediaFingerprintStore.append(got, "payload", "vid_id", dir)
    val rb = tmp("mfps_rb")
    MediaFingerprintStore.build(
      corpus.unionAll(media((11L, footage(90, 0)), (13L, "junk".getBytes("UTF-8")): (Long, Array[Byte]))),
      "payload", "vid_id", rb, n = 4, bands = 8, nBuckets = 8)
    def fpSet(d: String) = MediaFingerprintStore.readFps(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fpSet(dir) == fpSet(rb))
    assert(MediaFingerprintStore.loadManifest(spark, dir).maxId == 13L)
    // a second batch probes the appended state identically on both stores
    val b2 = media((20L, footage(90, 7)), (21L, footage(0, 2)), (22L, footage(123, 0)))
    assert(survivorIds(MediaFingerprintStore.dedupBatch(spark, dir, b2, "payload",
        "vid_id", maxHamming = 6, minMatches = 3)) ==
      survivorIds(MediaFingerprintStore.dedupBatch(spark, rb, b2, "payload",
        "vid_id", maxHamming = 6, minMatches = 3)))

    // compactTo: single segment, verdicts bit-identical, source untouched
    val cmp = tmp("mfps_cmp")
    MediaFingerprintStore.compactTo(spark, dir, cmp)
    assert(MediaFingerprintStore.committedSegments(spark, cmp) == Seq(0L))
    assert(fpSet(cmp) == fpSet(dir))
    assert(MediaFingerprintStore.loadManifest(spark, cmp).maxId == 13L)
    assert(survivorIds(MediaFingerprintStore.dedupBatch(spark, cmp, b2, "payload",
        "vid_id", maxHamming = 6, minMatches = 3)) ==
      survivorIds(MediaFingerprintStore.dedupBatch(spark, dir, b2, "payload",
        "vid_id", maxHamming = 6, minMatches = 3)))
    // in-place compact refused
    intercept[IllegalArgumentException] {
      MediaFingerprintStore.compactTo(spark, dir, dir)
    }
  }

  test("torn append invisible; committed replay no-op; id discipline; torn rebuild loud") {
    val dir = tmp("mfps_torn")
    MediaFingerprintStore.build(media((1L, footage(0, 0))), "payload", "vid_id",
      dir, n = 4, bands = 8, nBuckets = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // torn append: segment written but _done never landed -> invisible
    MediaFingerprintStore.append(media((5L, footage(7, 0))), "payload", "vid_id",
      dir, segmentId = 1L)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/segs/seg=1/_done"), false)
    assert(MediaFingerprintStore.loadManifest(spark, dir).maxId == 1L)
    // retry rewrites and commits
    MediaFingerprintStore.append(media((5L, footage(7, 0))), "payload", "vid_id",
      dir, segmentId = 1L)
    assert(MediaFingerprintStore.loadManifest(spark, dir).maxId == 5L)
    val before = MediaFingerprintStore.readFps(spark, dir).count()
    // committed explicit-id replay: no-op
    MediaFingerprintStore.append(media((5L, footage(7, 0))), "payload", "vid_id",
      dir, segmentId = 1L)
    assert(MediaFingerprintStore.readFps(spark, dir).count() == before)
    // auto-id retry of already-stored ids fails the watermark guard
    intercept[IllegalArgumentException] {
      MediaFingerprintStore.append(media((5L, footage(7, 0))), "payload", "vid_id", dir)
    }
    // explicit id 0 reserved for the build
    intercept[IllegalArgumentException] {
      MediaFingerprintStore.append(media((9L, footage(1, 0))), "payload", "vid_id",
        dir, segmentId = 0L)
    }
    // duplicate ids in one batch refused
    intercept[IllegalArgumentException] {
      MediaFingerprintStore.append(media((9L, footage(1, 0)), (9L, footage(2, 0))),
        "payload", "vid_id", dir)
    }
    // torn REBUILD: manifest present, zero committed segments -> loud
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/segs"), true)
    val e = intercept[IllegalArgumentException] {
      MediaFingerprintStore.loadManifest(spark, dir)
    }
    assert(e.getMessage.contains("no committed segments"))
  }

  test("StreamingMediaDedup.compactTo: store-served verdicts == the stream's") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmp("mfps_stream")
    val (survDir, fpDir) = (s"$dir/surv", s"$dir/fps")
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Array[Byte])]
    val q = StreamingMediaDedup
      .writer(source.toDF.toDF("vid_id", "payload"), "payload", "vid_id",
        survDir, fpDir, n = 4, minMatches = 3)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData((1L, footage(0, 0)), (2L, footage(50, 0)), (3L, footage(0, 3)))
    q.processAllAvailable()
    // an undecodable admit: its id must survive into the store's watermark
    source.addData((4L, footage(120, 0)), (5L, "junk".getBytes("UTF-8")))
    q.processAllAvailable()
    q.stop()
    val out = tmp("mfps_stream_store")
    StreamingMediaDedup.compactTo(spark, survDir, fpDir, "vid_id", out,
      n = 4, bands = 8, nBuckets = 8)
    val m = MediaFingerprintStore.loadManifest(spark, out)
    assert(m.maxId == 5L, s"unfingerprintable admit must advance maxId, got ${m.maxId}")
    // next batch: store verdicts == continuing the stream's own rule over
    // its full fingerprint state
    val b = media((10L, footage(0, 7)), (11L, footage(120, 2)), (12L, footage(33, 0)))
    val got = survivorIds(MediaFingerprintStore.dedupBatch(spark, out, b,
      "payload", "vid_id", maxHamming = 6, minMatches = 3))
    val batchFps = Multimodal.videoFrameHashes(b, "vid_id", "payload", 4)
      .select($"vid_id".as("id"), $"sample_idx".as("slot"), $"frame_hash".as("fp"))
    val streamFps = spark.read.parquet(s"$fpDir/batch=0", s"$fpDir/batch=1")
      .select($"id", $"slot", $"fp")
    val want = survivorIds(StreamingMediaDedup.incrementalFps(streamFps, batchFps,
      b, "vid_id", maxHamming = 6, bands = 8, minMatches = 3))
    assert(got == want && got == Seq(12L), s"got $got want $want")
  }

  test("appendAuto folds at the segment bound; verdicts preserved") {
    val dir = tmp("mfps_auto")
    MediaFingerprintStore.build(media((1L, footage(0, 0))), "payload", "vid_id",
      dir, n = 4, bands = 8, nBuckets = 4)
    assert(MediaFingerprintStore.appendAuto(media((5L, footage(50, 0))),
      "payload", "vid_id", dir, maxSegments = 3) == "append")
    assert(MediaFingerprintStore.appendAuto(media((9L, footage(120, 0))),
      "payload", "vid_id", dir, maxSegments = 3) == "append+compact")
    assert(MediaFingerprintStore.committedSegments(spark, dir) == Seq(0L))
    assert(MediaFingerprintStore.loadManifest(spark, dir).maxId == 9L)
    val rb = tmp("mfps_auto_rb")
    MediaFingerprintStore.build(
      media((1L, footage(0, 0)), (5L, footage(50, 0)), (9L, footage(120, 0))),
      "payload", "vid_id", rb, n = 4, bands = 8, nBuckets = 4)
    val probe = media((20L, footage(0, 3)), (21L, footage(200, 0)))
    assert(survivorIds(MediaFingerprintStore.dedupBatch(spark, dir, probe,
        "payload", "vid_id", maxHamming = 6, minMatches = 3)) ==
      survivorIds(MediaFingerprintStore.dedupBatch(spark, rb, probe,
        "payload", "vid_id", maxHamming = 6, minMatches = 3)))
  }

}
