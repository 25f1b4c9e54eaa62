package graft

import graft.streaming.CdcApply
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CDC materialization: a changelog stream folded into a
  * parquet snapshot across micro-batches — inserts, updates, deletes,
  * within-batch compaction, and delete-then-reinsert across batches.
  */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  test("changelog stream maintains the snapshot across micro-batches") {
    val snapDir = java.nio.file.Files.createTempDirectory("cdc_snap").toString + "/t"
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, Double, String, Long)]
    val q = CdcApply
      .writer(source.toDF.toDF("k", "name", "v", "op", "seq"), Seq("k"), "seq", "op", snapDir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc_ckpt").toString)
      .start()

    // batch 1: inserts, incl. a within-batch update that must compact
    source.addData((1L, "a", 10.0, "I", 1L), (2L, "b", 20.0, "I", 2L), (1L, "a2", 11.0, "U", 3L))
    q.processAllAvailable()
    // batch 2: delete k=2, insert k=3
    source.addData((2L, "b", 20.0, "D", 4L), (3L, "c", 30.0, "I", 5L))
    q.processAllAvailable()
    // batch 3: re-insert previously deleted k=2
    source.addData((2L, "b2", 21.0, "I", 6L))
    q.processAllAvailable()
    q.stop()

    val snap = CdcApply.readSnapshot(spark, snapDir)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(snap.toSeq == Seq((1L, "a2", 11.0), (2L, "b2", 21.0), (3L, "c", 30.0)))
    // one committed version per applied batch, all readable history
    assert(graft.sources.Versioned.versions(spark, snapDir) == Seq(1, 2, 3))
  }

  test("batch backfill replays a changelog segment idempotently") {
    val snapDir = java.nio.file.Files.createTempDirectory("cdc_bf").toString + "/t"
    val segment = Seq((1L, "a", 1.0, "I", 1L), (2L, "b", 2.0, "I", 2L), (1L, "a", 1.0, "D", 3L))
      .toDF("k", "name", "v", "op", "seq")
    CdcApply.applyBatch(segment, Seq("k"), "seq", "op", snapDir)
    val once = CdcApply.readSnapshot(spark, snapDir).as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    CdcApply.applyBatch(segment, Seq("k"), "seq", "op", snapDir) // replay
    val twice = CdcApply.readSnapshot(spark, snapDir).as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(once == Seq((2L, "b", 2.0)) && twice == once)
    // replay appended a new committed version; pruning bounds history
    assert(graft.sources.Versioned.versions(spark, snapDir) == Seq(1, 2))
    assert(graft.sources.Versioned.prune(spark, snapDir, keep = 1) == Seq(1))
    assert(graft.sources.Versioned.versions(spark, snapDir) == Seq(2))
  }

  test("partitioned apply rewrites ONLY the buckets the batch touches") {
    import java.nio.file.{Files, Paths}
    import scala.collection.JavaConverters._
    val snapDir = Files.createTempDirectory("cdc_part").toString + "/t"
    val nB = 8
    // seed: keys spread over many buckets
    val seed = (0L until 64L).map(k => (k, s"n$k", k * 1.0, "I", k))
      .toDF("k", "name", "v", "op", "seq")
    CdcApply.applyBatchPartitioned(seed, Seq("k"), "seq", "op", snapDir, nBuckets = nB)
    val bucketDirs = Files.list(Paths.get(snapDir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith(CdcApply.BucketCol + "=")).toSeq
    assert(bucketDirs.size > 1, "seed should span multiple buckets")
    def fileState(): Map[String, Long] = bucketDirs.flatMap { d =>
      Files.walk(d).iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
    }.toMap
    val before = fileState()

    // batch touching exactly one key (one bucket)
    val batch = Seq((7L, "upd", 99.0, "U", 100L)).toDF("k", "name", "v", "op", "seq")
    CdcApply.applyBatchPartitioned(batch, Seq("k"), "seq", "op", snapDir, nBuckets = nB)
    val after = fileState()
    import org.apache.spark.sql.functions._
    val touchedBucket = batch.select(pmod(xxhash64(col("k")), lit(nB))).head.getLong(0)
    val untouchedBefore = before.filterNot(_._1.contains(s"${CdcApply.BucketCol}=$touchedBucket"))
    val untouchedAfter = after.filterNot(_._1.contains(s"${CdcApply.BucketCol}=$touchedBucket"))
    // untouched bucket directories: identical files, untouched mtimes
    assert(untouchedBefore == untouchedAfter, "untouched buckets were rewritten")
    // touched bucket: actually rewritten
    assert(before.keySet.filter(_.contains(s"=$touchedBucket")) !=
      after.keySet.filter(_.contains(s"=$touchedBucket")))

    // content correct: k=7 updated, everything else intact
    val snap = CdcApply.readSnapshotPartitioned(spark, snapDir)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(snap.length == 64)
    assert(snap.find(_._1 == 7L).get == ((7L, "upd", 99.0)))
    assert(snap.find(_._1 == 8L).get == ((8L, "n8", 8.0)))

    // deletes drop rows without touching other buckets' files
    val del = Seq((7L, "x", 0.0, "D", 101L)).toDF("k", "name", "v", "op", "seq")
    CdcApply.applyBatchPartitioned(del, Seq("k"), "seq", "op", snapDir, nBuckets = nB)
    val snap2 = CdcApply.readSnapshotPartitioned(spark, snapDir)
    assert(snap2.count() == 63 && snap2.where($"k" === 7L).isEmpty)
    // replay of the same batch is idempotent (stream-restart contract)
    CdcApply.applyBatchPartitioned(del, Seq("k"), "seq", "op", snapDir, nBuckets = nB)
    assert(CdcApply.readSnapshotPartitioned(spark, snapDir).count() == 63)

    // a mismatched nBuckets must be rejected, not silently corrupt
    // (review finding: wrong pruning would duplicate keys)
    intercept[IllegalArgumentException] {
      CdcApply.applyBatchPartitioned(del, Seq("k"), "seq", "op", snapDir, nBuckets = nB * 2)
    }
  }

  test("partitioned snapshot: bucket filter compiles to partition pruning (plan + files read)") {
    import java.nio.file.{Files, Paths}
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.functions._
    val snapDir = Files.createTempDirectory("cdc_prune").toString + "/t"
    val nB = 8
    val seed = (0L until 64L).map(k => (k, s"n$k", k * 1.0, "I", k))
      .toDF("k", "name", "v", "op", "seq")
    CdcApply.applyBatchPartitioned(seed, Seq("k"), "seq", "op", snapDir, nBuckets = nB)
    // the inner read applyBatchPartitioned issues: snapshot scan filtered
    // to the touched buckets — the plan must show PartitionFilters on
    // __graft_bucket (pruning at the FILE INDEX, not a post-scan filter)
    val touched = Seq(0L, 3L)
    val pruned = spark.read.parquet(snapDir)
      .where(col(CdcApply.BucketCol).isin(touched: _*))
    val plan = pruned.queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains(CdcApply.BucketCol),
      s"no partition filter on ${CdcApply.BucketCol}:\n${planStr.linesIterator.take(20).mkString("\n")}")
    // and the physical effect: the scan reads ONLY files under the
    // touched bucket directories (numFiles metric after execution)
    pruned.collect()
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val filesRead = scan.metrics("numFiles").value
    def filesUnder(bucket: Long): Long =
      Files.walk(Paths.get(snapDir, s"${CdcApply.BucketCol}=$bucket")).iterator().asScala
        .count(_.toString.endsWith(".parquet")).toLong
    val expected = touched.map(filesUnder).sum
    val total = Files.walk(Paths.get(snapDir)).iterator().asScala
      .count(_.toString.endsWith(".parquet")).toLong
    assert(filesRead == expected, s"scan read $filesRead files, expected $expected (touched buckets only)")
    assert(expected < total, "test vacuous: touched buckets hold every file")
  }

  test("partitioned apply: a delete that empties its bucket removes the bucket") {
    import java.nio.file.{Files, Paths}
    import scala.collection.JavaConverters._
    val snapDir = Files.createTempDirectory("cdc_empty").toString + "/t"
    // one key per bucket region: k=0 and k=1 land in different buckets
    val seed = Seq((0L, "a", 1.0, "I", 1L), (1L, "b", 2.0, "I", 2L))
      .toDF("k", "name", "v", "op", "seq")
    CdcApply.applyBatchPartitioned(seed, Seq("k"), "seq", "op", snapDir, nBuckets = 64)
    assert(CdcApply.readSnapshotPartitioned(spark, snapDir).count() == 2)
    // delete the ONLY row of its bucket — dynamic overwrite alone would
    // leave the old files (review finding: lost delete); the explicit
    // empty-bucket cleanup must remove them
    val del = Seq((0L, "a", 1.0, "D", 3L)).toDF("k", "name", "v", "op", "seq")
    CdcApply.applyBatchPartitioned(del, Seq("k"), "seq", "op", snapDir, nBuckets = 64)
    val snap = CdcApply.readSnapshotPartitioned(spark, snapDir)
    assert(snap.count() == 1 && snap.where($"k" === 0L).isEmpty, "delete was lost")
    // replay stays a no-op
    CdcApply.applyBatchPartitioned(del, Seq("k"), "seq", "op", snapDir, nBuckets = 64)
    assert(CdcApply.readSnapshotPartitioned(spark, snapDir).count() == 1)
  }
}
