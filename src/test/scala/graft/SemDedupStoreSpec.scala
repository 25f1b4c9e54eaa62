package graft

import graft.dedup.{SemDedup, SemDedupStore}
import graft.streaming.StreamingSemDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted semantic-dedup index: store-served verdicts are
  * bit-identical to the streaming twin's over the full admitted state
  * AND to the from-scratch in-memory pass on the equivalent corpus,
  * appends assign against the FROZEN centroids, the segment/replay/torn
  * discipline holds, and compaction preserves verdicts.
  */
class SemDedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ids(df: DataFrame): Seq[Long] =
    df.select($"vec_id").as[Long].collect().sorted.toSeq

  private val ex = Array(1.0f, 0.0f, 0.0f, 0.0f)
  private val ey = Array(0.0f, 1.0f, 0.0f, 0.0f)
  private val ez = Array(0.0f, 0.0f, 1.0f, 0.0f)
  private val exNear = Array(0.99f, 0.01f, 0.0f, 0.0f)
  private val eyNear = Array(0.0f, 0.98f, 0.02f, 0.0f)

  test("dedupBatch == streaming droppedIds over the full state; verdict shape; append == rebuild") {
    val corpus = Seq((1L, ex), (2L, ey), (3L, ez)).toDF("vec_id", "embedding")
    val dir = tmp("sds")
    SemDedupStore.build(corpus, "vec_id", "embedding", dir, k = 2, iters = 1,
      nBuckets = 4)
    val m = SemDedupStore.loadManifest(spark, dir)
    assert(m.nDocs == 3 && m.maxId == 3L && m.k == 2 && m.d == 4)
    // centroids round-trip bit-exact
    val back = SemDedupStore.loadCentroids(spark, dir)
    val trained = SemDedup.kmeansDeterministic(corpus, "embedding", "vec_id", 2, 1)
    assert(back.map(_.toSeq).toSeq == trained.map(_.toSeq).toSeq)

    // batch: near-dups of stored anchors + an in-batch dup pair + fresh
    val batch = Seq((10L, exNear), (11L, eyNear), (12L, exNear),
      (13L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val got = SemDedupStore.dedupBatch(spark, dir, batch, "vec_id", "embedding",
      tau = 0.95)
    // in-memory twin over the FULL stored state
    val assigned = SemDedup.assignClusters(batch, "embedding", trained)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"), $"cluster")
    val state = SemDedupStore.readState(spark, dir)
    val dropped = StreamingSemDedup.droppedIds(state, assigned, tau = 0.95)
      .withColumnRenamed("drop_id", "vec_id")
    val want = batch.join(dropped, Seq("vec_id"), "left_anti")
    assert(ids(got) == ids(want))
    assert(ids(got) == Seq(13L), s"got ${ids(got)}") // 10,12 die vs ex; 11 vs ey
    // verdict shape: (vec_id, cluster, kept)
    val verdict = SemDedupStore.dedupVerdict(spark, dir, batch, "vec_id",
      "embedding", tau = 0.95)
    assert(verdict.columns.toSeq == Seq("vec_id", "cluster", "kept"))
    assert(verdict.where(!$"kept").count() == 3)

    // append survivors; store state == a from-scratch rebuild's state for
    // the same corpus ASSIGNED AGAINST THE SAME centroids (frozen-centroid
    // contract: the rebuild here re-trains on the original corpus, whose
    // 2 lowest ids seed identically, so assignments agree)
    SemDedupStore.append(got, "vec_id", "embedding", dir)
    assert(SemDedupStore.loadManifest(spark, dir).maxId == 13L)
    def stateSet(d: String) = SemDedupStore.readState(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2))).toSet
    val rb = tmp("sds_rb")
    SemDedupStore.buildFromState(
      SemDedup.assignClusters(
          corpus.unionAll(Seq((13L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")),
          "embedding", trained)
        .select($"vec_id".as("id"), $"cluster", $"embedding".cast("array<double>").as("vec")),
      rb, trained, nBuckets = 4)
    assert(stateSet(dir) == stateSet(rb))

    // compactTo: single segment, verdicts identical, in-place refused
    val cmp = tmp("sds_cmp")
    SemDedupStore.compactTo(spark, dir, cmp)
    assert(SemDedupStore.committedSegments(spark, cmp) == Seq(0L))
    assert(stateSet(cmp) == stateSet(dir))
    val b2 = Seq((20L, exNear), (21L, Array(0.51f, 0.49f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    assert(ids(SemDedupStore.dedupBatch(spark, cmp, b2, "vec_id", "embedding", 0.95)) ==
      ids(SemDedupStore.dedupBatch(spark, dir, b2, "vec_id", "embedding", 0.95)))
    intercept[IllegalArgumentException] { SemDedupStore.compactTo(spark, dir, dir) }
  }

  test("torn append invisible; committed replay no-op; id discipline; torn rebuild loud") {
    val dir = tmp("sds_torn")
    SemDedupStore.build(Seq((1L, ex), (2L, ey)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, k = 2, iters = 1, nBuckets = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SemDedupStore.append(Seq((5L, ez)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, segmentId = 1L)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/segs/seg=1/_done"), false)
    assert(SemDedupStore.loadManifest(spark, dir).maxId == 2L) // torn: invisible
    SemDedupStore.append(Seq((5L, ez)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, segmentId = 1L) // retry commits
    assert(SemDedupStore.loadManifest(spark, dir).maxId == 5L)
    val before = SemDedupStore.readState(spark, dir).count()
    SemDedupStore.append(Seq((5L, ez)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, segmentId = 1L) // committed replay: no-op
    assert(SemDedupStore.readState(spark, dir).count() == before)
    intercept[IllegalArgumentException] { // watermark guard
      SemDedupStore.append(Seq((5L, ez)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dir)
    }
    intercept[IllegalArgumentException] { // segment 0 reserved
      SemDedupStore.append(Seq((9L, ez)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dir, segmentId = 0L)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/segs"), true)
    val e = intercept[IllegalArgumentException] {
      SemDedupStore.loadManifest(spark, dir)
    }
    assert(e.getMessage.contains("no committed segments"))
  }

  test("StreamingSemDedup.compactTo: store-served verdicts == the stream's") {
    val dir = tmp("sds_stream")
    val (survDir, stateDir) = (s"$dir/surv", s"$dir/state")
    val sample = Seq((0L, ex), (1L, ey)).toDF("vec_id", "embedding")
    val centroids = SemDedup.kmeansDeterministic(sample, "embedding", "vec_id", k = 2, iters = 0)
    // two batches through the replayable batch API (the stream's kernel)
    StreamingSemDedup.applyBatch(Seq((1L, ex), (2L, ey), (3L, exNear)).toDF("vec_id", "embedding"),
      0L, "vec_id", "embedding", survDir, stateDir, centroids, tau = 0.95)
    StreamingSemDedup.applyBatch(Seq((4L, ez)).toDF("vec_id", "embedding"),
      1L, "vec_id", "embedding", survDir, stateDir, centroids, tau = 0.95)
    val out = tmp("sds_stream_store")
    StreamingSemDedup.compactTo(spark, stateDir, out, centroids, nBuckets = 4)
    assert(SemDedupStore.loadManifest(spark, out).maxId == 4L)
    // store centroids == the stream's frozen ones
    assert(SemDedupStore.loadCentroids(spark, out).map(_.toSeq).toSeq ==
      centroids.map(_.toSeq).toSeq)
    // next batch: store verdicts == the stream's own rule over its state
    val b = Seq((10L, eyNear), (11L, Array(0.5f, 0.5f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = ids(SemDedupStore.dedupBatch(spark, out, b, "vec_id", "embedding", 0.95))
    val assigned = SemDedup.assignClusters(b, "embedding", centroids)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"), $"cluster")
    val streamState = spark.read.parquet(s"$stateDir/batch=0", s"$stateDir/batch=1")
      .select($"id", $"cluster", $"vec")
    val dropped = StreamingSemDedup.droppedIds(streamState, assigned, 0.95)
      .withColumnRenamed("drop_id", "vec_id")
    val want = ids(b.join(dropped, Seq("vec_id"), "left_anti"))
    assert(got == want && got == Seq(11L), s"got $got want $want")
  }

  test("appendAuto folds at the segment bound; verdicts preserved") {
    val dir = tmp("sds_auto")
    SemDedupStore.build(Seq((1L, ex), (2L, ey)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, k = 2, iters = 1, nBuckets = 4)
    assert(SemDedupStore.appendAuto(Seq((5L, ez)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, maxSegments = 3) == "append")
    assert(SemDedupStore.appendAuto(
      Seq((8L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, maxSegments = 3) == "append+compact")
    assert(SemDedupStore.committedSegments(spark, dir) == Seq(0L))
    assert(SemDedupStore.loadManifest(spark, dir).maxId == 8L)
    // centroids untouched by the fold; verdicts == an unfolded twin's
    val rb = tmp("sds_auto_rb")
    SemDedupStore.buildFromState(SemDedupStore.readState(spark, dir), rb,
      SemDedupStore.loadCentroids(spark, dir), nBuckets = 4)
    val probe = Seq((20L, exNear), (21L, eyNear)).toDF("vec_id", "embedding")
    assert(ids(SemDedupStore.dedupBatch(spark, dir, probe, "vec_id", "embedding", 0.95)) ==
      ids(SemDedupStore.dedupBatch(spark, rb, probe, "vec_id", "embedding", 0.95)))
  }

}
