package graft

import graft.dedup.MinHashStore
import org.apache.spark.sql.functions._

/** The in-place compaction swap protocol, crash-injected at EVERY
  * protocol step (MinHashStore as the host store): recovery must
  * converge to a correct store from each window, and a re-entrant
  * finish must never delete freshly-swapped segments.
  *
  * Protocol steps: fold staged under `_compact` → `_SWAP` marker →
  * delete `segs` → rename `_compact/segs` → delete `_compact`.
  */
class SegmentCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  /** A two-segment store plus the reference single-build twin. */
  private def host(): (String, String, Long) = {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .where($"doc_id" < 160)
    val dir = tmp("segswap")
    MinHashStore.build(docs.where($"doc_id" < 100), "text", "doc_id", dir, nBuckets = 4)
    MinHashStore.append(docs.where($"doc_id" >= 100), "text", "doc_id", dir, segmentId = 1L)
    val rb = tmp("segswap_rb")
    MinHashStore.build(docs, "text", "doc_id", rb, nBuckets = 4)
    (dir, rb, 160L)
  }

  private def sigSet(d: String) = MinHashStore.readSigs(spark, d)
    .select($"id", xxhash64($"sig"), xxhash64($"shset")).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("crash injected at every swap step: recovery converges, nothing lost") {
    val probe = spark.read.parquet(s"$sf0001/documents.parquet")
      .where($"doc_id" >= 160 && $"doc_id" < 200)
    def verdicts(d: String) = MinHashStore.dedupBatch(spark, d, probe, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq

    // step (a): fold staged, NO marker — an uncommitted fold is discarded,
    // the pre-fold store intact (both segments still committed)
    locally {
      val (dir, rb, _) = host()
      MinHashStore.compactTo(spark, dir, s"$dir/_compact")
      graft.sources.SegmentCompaction.recover(spark, dir)
      assert(!fsOf(dir).exists(p(s"$dir/_compact")))
      assert(MinHashStore.committedSegments(spark, dir) == Seq(0L, 1L))
      assert(sigSet(dir) == sigSet(rb) && verdicts(dir) == verdicts(rb))
    }
    // step (b): marker written, swap not started — rolls forward to the
    // folded single segment
    locally {
      val (dir, rb, _) = host()
      MinHashStore.compactTo(spark, dir, s"$dir/_compact")
      fsOf(dir).create(p(s"$dir/_compact/_SWAP"), true).close()
      graft.sources.SegmentCompaction.recover(spark, dir)
      assert(MinHashStore.committedSegments(spark, dir) == Seq(0L))
      assert(sigSet(dir) == sigSet(rb) && verdicts(dir) == verdicts(rb))
    }
    // step (c): old segs DELETED, rename pending — the zero-segments
    // window; loadManifest-first paths would throw, recovery completes
    locally {
      val (dir, rb, _) = host()
      MinHashStore.compactTo(spark, dir, s"$dir/_compact")
      fsOf(dir).create(p(s"$dir/_compact/_SWAP"), true).close()
      fsOf(dir).delete(p(s"$dir/segs"), true)
      // append (recover-first) heals it and lands its segment on the fold
      val more = spark.read.parquet(s"$sf0001/documents.parquet")
        .where($"doc_id" >= 160 && $"doc_id" < 180)
      MinHashStore.append(more, "text", "doc_id", dir, segmentId = 7L)
      assert(MinHashStore.committedSegments(spark, dir) == Seq(0L, 7L))
      val rb2 = tmp("segswap_rb2")
      MinHashStore.build(spark.read.parquet(s"$sf0001/documents.parquet")
        .where($"doc_id" < 180), "text", "doc_id", rb2, nBuckets = 4)
      assert(sigSet(dir) == sigSet(rb2))
      assert(rb.nonEmpty) // silence unused
    }
    // step (d): rename DONE, staging cleanup pending — the re-entrant
    // window; a retry must NOT delete the freshly-swapped segs
    locally {
      val (dir, rb, _) = host()
      MinHashStore.compactTo(spark, dir, s"$dir/_compact")
      val fs = fsOf(dir)
      fs.create(p(s"$dir/_compact/_SWAP"), true).close()
      fs.delete(p(s"$dir/segs"), true)
      require(fs.rename(p(s"$dir/_compact/segs"), p(s"$dir/segs")))
      // crash here: _compact/_SWAP still on disk, segs/ is the NEW tree
      graft.sources.SegmentCompaction.recover(spark, dir)
      assert(!fs.exists(p(s"$dir/_compact")))
      assert(MinHashStore.committedSegments(spark, dir) == Seq(0L),
        "re-entrant finish must keep the freshly-swapped fold")
      assert(sigSet(dir) == sigSet(rb) && verdicts(dir) == verdicts(rb))
    }
  }
}
