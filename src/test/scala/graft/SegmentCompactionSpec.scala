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
      graft.sources.SegmentCompaction.commitMarker(spark, dir)
      graft.sources.SegmentCompaction.recover(spark, dir)
      assert(MinHashStore.committedSegments(spark, dir) == Seq(0L))
      assert(sigSet(dir) == sigSet(rb) && verdicts(dir) == verdicts(rb))
    }
    // step (b-legacy): a bare pre-inventory marker (old format) keeps the
    // staging-authoritative behavior
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
      graft.sources.SegmentCompaction.commitMarker(spark, dir)
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
      graft.sources.SegmentCompaction.commitMarker(spark, dir)
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

  /** Object-store rename = COPY every file then DELETE every source file.
    * Simulated at file granularity with crash injection: `copies` /
    * `deletes` bound how many files each phase processes before the
    * "crash" (Int.MaxValue = phase completes). Copy order and delete
    * order are both the sorted listing — deterministic windows.
    */
  private def copyDeleteRename(dir: String, copies: Int, deletes: Int): Unit = {
    val fs = fsOf(dir)
    val src = p(s"$dir/_compact/segs")
    val dst = p(s"$dir/segs")
    val conf = spark.sparkContext.hadoopConfiguration
    val base = fs.makeQualified(src).toUri.getPath.stripSuffix("/") + "/"
    val files = {
      val it = fs.listFiles(src, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext)
        buf += fs.makeQualified(it.next().getPath).toUri.getPath.stripPrefix(base)
      buf.sorted.toSeq
    }
    files.take(copies).foreach { rel =>
      org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src, rel),
        fs, new org.apache.hadoop.fs.Path(dst, rel), false, conf)
    }
    if (copies >= files.size)
      files.take(deletes).foreach(rel =>
        fs.delete(new org.apache.hadoop.fs.Path(src, rel), false))
  }

  test("non-atomic copy+delete rename: every crash window converges or fails loud, nothing lost") {
    val probe = spark.read.parquet(s"$sf0001/documents.parquet")
      .where($"doc_id" >= 160 && $"doc_id" < 200)
    def verdicts(d: String) = MinHashStore.dedupBatch(spark, d, probe, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq

    // window (e): crash MID-COPY — staging still complete, segs partial;
    // recovery discards the partial copy and re-renames the staging
    locally {
      val (dir, rb, _) = host()
      MinHashStore.compactTo(spark, dir, s"$dir/_compact")
      graft.sources.SegmentCompaction.commitMarker(spark, dir)
      fsOf(dir).delete(p(s"$dir/segs"), true)
      copyDeleteRename(dir, copies = 2, deletes = 0)
      graft.sources.SegmentCompaction.recover(spark, dir)
      assert(!fsOf(dir).exists(p(s"$dir/_compact")))
      assert(MinHashStore.committedSegments(spark, dir) == Seq(0L))
      assert(sigSet(dir) == sigSet(rb) && verdicts(dir) == verdicts(rb))
    }
    // window (f): copy COMPLETE, crash MID-SOURCE-DELETE — staging is
    // half-deleted, segs holds the complete fold; the naive rule would
    // delete segs and roll the partial staging forward (silent loss of
    // committed segments); the inventory check must keep segs instead
    locally {
      val (dir, rb, _) = host()
      MinHashStore.compactTo(spark, dir, s"$dir/_compact")
      graft.sources.SegmentCompaction.commitMarker(spark, dir)
      fsOf(dir).delete(p(s"$dir/segs"), true)
      copyDeleteRename(dir, copies = Int.MaxValue, deletes = 3)
      graft.sources.SegmentCompaction.recover(spark, dir)
      assert(!fsOf(dir).exists(p(s"$dir/_compact")))
      assert(MinHashStore.committedSegments(spark, dir) == Seq(0L))
      assert(sigSet(dir) == sigSet(rb) && verdicts(dir) == verdicts(rb))
    }
    // window (f'): the delete phase got everything EXCEPT the marker's
    // parent dirs — staging segs root still exists but empty-ish; same
    // verdict: segs is authoritative
    locally {
      val (dir, rb, _) = host()
      MinHashStore.compactTo(spark, dir, s"$dir/_compact")
      graft.sources.SegmentCompaction.commitMarker(spark, dir)
      fsOf(dir).delete(p(s"$dir/segs"), true)
      copyDeleteRename(dir, copies = Int.MaxValue, deletes = Int.MaxValue - 1)
      graft.sources.SegmentCompaction.recover(spark, dir)
      assert(MinHashStore.committedSegments(spark, dir) == Seq(0L))
      assert(sigSet(dir) == sigSet(rb) && verdicts(dir) == verdicts(rb))
    }
    // window (g): an interleaving rename left NEITHER tree complete (a
    // data file deleted from staging without ever being copied) —
    // recovery must fail LOUD and delete NOTHING: the union of the two
    // trees still holds every committed byte
    locally {
      val (dir, _, _) = host()
      MinHashStore.compactTo(spark, dir, s"$dir/_compact")
      graft.sources.SegmentCompaction.commitMarker(spark, dir)
      val fs = fsOf(dir)
      fs.delete(p(s"$dir/segs"), true)
      copyDeleteRename(dir, copies = 2, deletes = 0)
      // adversarial split: drop a staged file that was NOT among the 2
      // copied (sorted order makes the tail uncopied)
      val base = fs.makeQualified(p(s"$dir/_compact/segs")).toUri.getPath
        .stripSuffix("/") + "/"
      val staged = {
        val it = fs.listFiles(p(s"$dir/_compact/segs"), true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext)
          buf += fs.makeQualified(it.next().getPath).toUri.getPath.stripPrefix(base)
        buf.sorted.toSeq
      }
      fs.delete(p(s"$dir/_compact/segs/${staged.last}"), false)
      val before = staged.size
      val e = intercept[IllegalArgumentException] {
        graft.sources.SegmentCompaction.recover(spark, dir)
      }
      assert(e.getMessage.contains("NEITHER"), e.getMessage)
      // nothing deleted: marker, remaining staging files, and the partial
      // segs copy are all still on disk for manual union reconstruction
      assert(fs.exists(p(s"$dir/_compact/_SWAP")))
      val after = {
        val it = fs.listFiles(p(s"$dir/_compact/segs"), true)
        var n = 0; while (it.hasNext) { it.next(); n += 1 }; n
      }
      assert(after == before - 1, "recovery must not delete staging files in the split state")
      assert(fs.exists(p(s"$dir/segs")))
    }
  }

  test("marker commit is atomic: a _SWAP.tmp leftover reads as UNCOMMITTED " +
      "(staging discarded, store intact)") {
    // crash window inside commitMarker: the inventory landed in the temp
    // file but the rename to _SWAP never happened — recovery must treat
    // the fold as uncommitted (a truncated inventory masquerading as a
    // commit point is the silent-loss window the temp+rename closes)
    val (dir, rb, _) = host()
    MinHashStore.compactTo(spark, dir, s"$dir/_compact")
    val fs = fsOf(dir)
    val out = fs.create(p(s"$dir/_compact/_SWAP.tmp"), true)
    out.write("seg=0/_done\t0\n".getBytes("UTF-8")); out.close()
    graft.sources.SegmentCompaction.recover(spark, dir)
    assert(!fs.exists(p(s"$dir/_compact")))
    assert(MinHashStore.committedSegments(spark, dir) == Seq(0L, 1L),
      "an unrenamed tmp marker must not commit the fold")
    assert(sigSet(dir) == sigSet(rb))
  }

  test("recover takes the lease when acting: a marked staging under a foreign " +
      "holder fails loud instead of racing the holder's swap") {
    val (dir, _, _) = host()
    MinHashStore.compactTo(spark, dir, s"$dir/_compact")
    graft.sources.SegmentCompaction.commitMarker(spark, dir)
    val fs = fsOf(dir)
    fs.create(p(s"$dir/_LEASE"), false).close() // a live compactInPlace elsewhere
    val e = intercept[IllegalStateException] {
      graft.sources.SegmentCompaction.recover(spark, dir)
    }
    assert(e.getMessage.contains("_LEASE"), e.getMessage)
    // nothing acted: staging + marker + old segs all intact
    assert(fs.exists(p(s"$dir/_compact/_SWAP")))
    assert(MinHashStore.committedSegments(spark, dir) == Seq(0L, 1L))
    // and the no-staging fast path never touches the lease (parallel
    // plain appends keep their concurrency)
    fs.delete(p(s"$dir/_compact"), true)
    assert(!graft.sources.SegmentCompaction.recover(spark, dir))
    fs.delete(p(s"$dir/_LEASE"), false)
  }

  test("lease reentrancy is PER-THREAD: same-thread nesting runs, a different " +
      "thread in the same JVM fails loud like any other process") {
    val dir = tmp("lease_threads")
    import graft.sources.AppendLease
    // same-thread nesting (appendAuto -> recover -> finishSwap composition)
    val nested = AppendLease.withLease(spark, dir, "T") {
      AppendLease.withLease(spark, dir, "T") { 42 }
    }
    assert(nested == 42)
    val lease = p(s"$dir/_LEASE")
    assert(!fsOf(dir).exists(lease), "outer frame must release after nesting")
    // a different thread is a genuinely concurrent mutator — pid-keyed
    // reentrancy would wave it through (review-found); it must fail loud
    AppendLease.withLease(spark, dir, "T") {
      val caught = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() =>
        try AppendLease.withLease(spark, dir, "T") { () }
        catch { case e: Throwable => caught.set(e) })
      t.start(); t.join()
      assert(caught.get() != null &&
        caught.get().isInstanceOf[IllegalStateException] &&
        caught.get().getMessage.contains("_LEASE"),
        s"cross-thread acquire must fail loud, got ${caught.get()}")
    }
    assert(!fsOf(dir).exists(lease))
  }

  test("appender lease: a second mutator fails loud with the lease named, " +
      "released on success AND failure") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val (dir, _, _) = host()
    val fs = fsOf(dir)
    val lease = p(s"$dir/_LEASE")
    // simulate an in-flight out-of-process appender holding the lease
    fs.create(lease, false).close()
    val more = docs.where($"doc_id" >= 160 && $"doc_id" < 180)
    val e = intercept[IllegalStateException] {
      MinHashStore.appendAuto(more, "text", "doc_id", dir, maxSegments = 2)
    }
    assert(e.getMessage.contains("_LEASE") && e.getMessage.contains("single-appender"),
      e.getMessage)
    val e2 = intercept[IllegalStateException] {
      MinHashStore.compactInPlace(spark, dir)
    }
    assert(e2.getMessage.contains("_LEASE"), e2.getMessage)
    // the refused calls touched nothing: both original segments intact
    assert(MinHashStore.committedSegments(spark, dir) == Seq(0L, 1L))
    // crashed-holder recovery: delete the lease, re-run converges (and
    // the maxSegments=2 bound makes this append fold in place too —
    // autoRoute's internal fold must not self-deadlock on its own lease)
    fs.delete(lease, false)
    val route = MinHashStore.appendAuto(more, "text", "doc_id", dir, maxSegments = 2)
    assert(route == "append+compact")
    assert(!fs.exists(lease), "lease must release on success")
    val rb = tmp("segswap_lease_rb")
    MinHashStore.build(docs.where($"doc_id" < 180), "text", "doc_id", rb, nBuckets = 4)
    assert(sigSet(dir) == sigSet(rb))
    // a FAILING mutation (monotonic-id guard: same ids again) must release
    // the lease too - a wedged store after a bad batch would be worse
    // than the race the lease closes
    intercept[IllegalArgumentException] {
      MinHashStore.appendAuto(more, "text", "doc_id", dir)
    }
    assert(!fs.exists(lease), "lease must release when the append throws")
    // store still serves
    assert(MinHashStore.committedSegments(spark, dir).nonEmpty)
  }

  test("stale-lease triage: an aged lease is flagged STALE in the failure; " +
      "auto-reclaim only under the explicit opt-in") {
    import graft.sources.AppendLease
    val dir = tmp("lease_stale")
    val fs = fsOf(dir)
    val lease = p(s"$dir/_LEASE")
    fs.mkdirs(p(dir))
    fs.create(lease, false).close()
    // age the lease 2 hours into the past (> the 3600 s default warn bar)
    val old = System.currentTimeMillis() - 2 * 3600 * 1000L
    fs.setTimes(lease, old, -1)
    val e = intercept[IllegalStateException] {
      AppendLease.withLease(spark, dir, "T") { () }
    }
    assert(e.getMessage.contains("STALE") &&
      e.getMessage.contains("staleWarnSec"), e.getMessage)
    assert(fs.exists(lease), "no behavior change without the opt-in")
    // a FRESH lease must not carry the STALE note
    fs.setTimes(lease, System.currentTimeMillis(), -1)
    val e2 = intercept[IllegalStateException] {
      AppendLease.withLease(spark, dir, "T") { () }
    }
    assert(!e2.getMessage.contains("STALE"), e2.getMessage)
    // explicit opt-in: leases older than autoReclaimSec are reclaimed and
    // the mutation proceeds (two reclaiming waiters still elect one
    // winner - the retry create is itself exclusive)
    fs.setTimes(lease, old, -1)
    spark.conf.set("spark.graft.lease.autoReclaimSec", "3600")
    try {
      val got = AppendLease.withLease(spark, dir, "T") { 7 }
      assert(got == 7)
      assert(!fs.exists(lease), "reclaimed lease must release after the body")
      // the rename-claimed stale file is cleaned up (the rename, not a
      // bare delete, is what keeps two reclaiming waiters from both
      // entering - only the rename winner retries the create)
      assert(!fs.listStatus(p(dir)).exists(_.getPath.getName.startsWith("_LEASE.reclaimed")),
        "reclaim must not leave claim debris")
      // a YOUNG foreign lease is still respected under the opt-in
      fs.create(lease, false).close()
      intercept[IllegalStateException] {
        AppendLease.withLease(spark, dir, "T") { () }
      }
      assert(fs.exists(lease))
    } finally spark.conf.unset("spark.graft.lease.autoReclaimSec")
  }

  test("reclaim TOCTOU: a rename-claim that lands on a FRESH lease (another " +
      "reclaimer won the window and re-entered) is restored, not deleted") {
    import graft.sources.AppendLease
    val dir = tmp("lease_toctou")
    val fs = fsOf(dir)
    fs.mkdirs(p(dir))
    val lease = p(s"$dir/_LEASE")
    val claim = p(s"$dir/_LEASE.reclaimed.test.1")
    // the slow waiter's rename claimed a FRESH file (the winner's lease,
    // mtime = now): claimedStale must put it back and refuse
    fs.create(claim, false).close()
    assert(!AppendLease.claimedStale(fs, claim, lease, reclaimSec = 3600, "T"))
    assert(fs.exists(lease) && !fs.exists(claim),
      "fresh claim must be renamed back to the lease path")
    // a genuinely stale claim is deleted and the reclaim proceeds
    fs.delete(lease, false)
    fs.create(claim, false).close()
    fs.setTimes(claim, System.currentTimeMillis() - 2 * 3600 * 1000L, -1)
    assert(AppendLease.claimedStale(fs, claim, lease, reclaimSec = 3600, "T"))
    assert(!fs.exists(claim) && !fs.exists(lease))
    // a vanished claim (FS hiccup mid-race) also proceeds - the retry
    // create is itself exclusive, so safety rides on it either way
    assert(AppendLease.claimedStale(fs, claim, lease, reclaimSec = 3600, "T"))
    // (the rename-back-vs-third-waiter corner is FS-dependent: POSIX
    // rename overwrites an existing dest, HDFS refuses - claimedStale
    // refuses the acquire EITHER way, which is the safety property; the
    // unrestorable-claim triage message is exercised on HDFS semantics
    // only, so it is not pinned here)
    fs.create(lease, false).close()
    fs.create(claim, false).close()
    assert(!AppendLease.claimedStale(fs, claim, lease, reclaimSec = 3600, "T"))
    assert(fs.exists(lease))
    fs.delete(lease, false)
    if (fs.exists(claim)) fs.delete(claim, false)
  }

  test("lease breadcrumb carries host + pid + time (shared-filesystem " +
      "triage needs to know WHERE the pid lives)") {
    import graft.sources.AppendLease
    val dir = tmp("lease_crumb")
    val fs = fsOf(dir)
    fs.mkdirs(p(dir))
    val lease = p(s"$dir/_LEASE")
    // capture the crumb mid-hold (it is deleted on release)
    var crumb = ""
    AppendLease.withLease(spark, dir, "T") {
      val in = fs.open(lease)
      try {
        val buf = new Array[Byte](256)
        val n = math.max(0, in.read(buf))
        crumb = new String(buf, 0, n, "UTF-8").trim
      } finally in.close()
    }
    assert(crumb.matches("host=\\S+ pid=\\d+ time=\\S+"), s"crumb format: '$crumb'")
    assert(crumb.contains(s"pid=${ProcessHandle.current().pid()}"))
  }

  test("commitMarker refuses a staged relpath carrying a tab/newline (the " +
      "inventory is line/tab-delimited; a dropped line weakens completeness)") {
    val (dir, _, _) = host()
    MinHashStore.compactTo(spark, dir, s"$dir/_compact")
    val fs = fsOf(dir)
    val evil = p(s"$dir/_compact/segs/seg=0/bad\tname")
    fs.create(evil, true).close()
    val e = intercept[IllegalArgumentException] {
      graft.sources.SegmentCompaction.commitMarker(spark, dir)
    }
    assert(e.getMessage.contains("tab/newline") && e.getMessage.contains("\\t"),
      e.getMessage)
    // the fold stayed uncommitted: no marker, recovery discards it, the
    // pre-fold store is intact
    assert(!fs.exists(p(s"$dir/_compact/_SWAP")))
    graft.sources.SegmentCompaction.recover(spark, dir)
    assert(MinHashStore.committedSegments(spark, dir) == Seq(0L, 1L))
  }
}
