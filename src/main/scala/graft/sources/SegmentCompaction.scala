package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared IN-PLACE compaction protocol for the committed-segment stores
  * (Bm25Store, MinHashStore, MediaFingerprintStore, SemDedupStore).
  * Their `compactTo` folds are OUT-OF-PLACE by construction (the fold
  * deletes the output's segments before the source's lazy readers
  * materialize), so "compact where it stands" needs a staging dance:
  *
  * {{{
  *   1. fold the store into dir/_compact        (a complete store tree)
  *   2. write dir/_compact/_SWAP                (the commit point)
  *   3. delete dir/segs, rename _compact/segs → segs, delete _compact
  * }}}
  *
  * Roll-forward recovery ([[recover]]): an UNMARKED staging is an
  * incomplete fold — discarded, source untouched. A MARKED staging is a
  * committed fold — [[recover]] finishes the swap. The swap itself is
  * idempotent under re-entry: the rename happens only while the staging
  * `segs` still exists, so a crash after the rename (marker still on
  * disk) skips straight to cleanup instead of deleting the
  * freshly-swapped segments. Store `append`/`appendAuto` entry points
  * call [[recover]] FIRST — otherwise a plain append during the
  * crash-to-recovery window would commit a segment into the OLD `segs`
  * tree and lose it to the pending swap.
  *
  * The root `_manifest.json` is untouched: an in-place fold keeps the
  * store's own parameters (change them with the out-of-place
  * `compactTo`).
  *
  * == Non-atomic (object-store) rename ==
  * Rename is atomic on HDFS/local, but on object stores it is COPY then
  * DELETE — a crash mid-rename leaves BOTH trees partial-looking, and the
  * naive "staging is authoritative while it exists" rule would delete a
  * COMPLETE freshly-copied `segs` and roll forward the half-deleted
  * staging: committed segments silently lost. So the marker is not a bare
  * flag: it records the staged tree's full file INVENTORY (relpath +
  * length, written after the fold completes). [[finishSwap]] then picks
  * the tree the inventory proves complete — staging when every recorded
  * file is still there (the copy never started / stopped partway), `segs`
  * when the copy finished and the crash hit the source delete — and if an
  * interleaving rename left NEITHER tree complete it fails loud with both
  * states named instead of discarding either (the union still holds every
  * byte; that window is manual territory, not silent-loss territory).
  * A legacy empty marker (pre-inventory crash) keeps the old
  * staging-authoritative behavior.
  */
object SegmentCompaction {

  /** Finish (or discard) an interrupted in-place fold. Returns true if a
    * committed fold was rolled forward.
    *
    * ACTING recovery runs under the appender LEASE (reentrant when the
    * caller already holds it): a lease-FREE plain append calls recover
    * first per the family rule, and without the lease its finishSwap
    * could interleave with a lease-held compactInPlace's — B observing
    * the staging, A completing the rename, then B deleting the freshly
    * swapped segs (review-found). The no-staging fast path stays
    * lease-free, so coordinated-id parallel plain appends keep their
    * concurrency; they serialize only when there is an interrupted swap
    * to act on.
    */
  def recover(spark: SparkSession, dir: String): Boolean = {
    val fs = fsFor(spark, dir)
    val staging = new org.apache.hadoop.fs.Path(s"$dir/_compact")
    if (!fs.exists(staging)) false
    else AppendLease.withLease(spark, dir, "SegmentCompaction.recover") {
      // re-check under the lease: the holder we raced may have finished
      if (!fs.exists(staging)) false
      else if (!fs.exists(marker(dir))) { fs.delete(staging, true); false }
      else { finishSwap(fs, dir); true }
    }
  }

  /** Compact `dir` in place: `fold(stagingDir)` must write a complete
    * store (the store's own `compactTo(dir, stagingDir)`), then the segs
    * tree swaps under the marker protocol above. Runs under the appender
    * lease (reentrant under an already-leased appendAuto/compactInPlace).
    */
  def inPlace(spark: SparkSession, dir: String)(fold: String => Unit): Unit =
    AppendLease.withLease(spark, dir, "SegmentCompaction.inPlace") {
      recover(spark, dir)
      val fs = fsFor(spark, dir)
      val staging = new org.apache.hadoop.fs.Path(s"$dir/_compact")
      if (fs.exists(staging)) fs.delete(staging, true) // unmarked leftover
      fold(staging.toString)
      commitMarker(spark, dir) // commit point (carries the fold's inventory)
      finishSwap(fs, dir)
    }

  /** Committed segment ids (marker present), ascending — the shared
    * listing all four segmented stores delegate to (one implementation,
    * one place for a future fix).
    */
  def committedSegments(spark: SparkSession, dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/segs")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_done")))
      .map(_.getPath.getName.stripPrefix("seg=").toLong)
      .sorted
  }

  private def marker(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_compact/_SWAP")

  /** Write the `_SWAP` commit marker carrying the staged segs tree's file
    * inventory (one `relpath\tlength` line per file) — what lets recovery
    * tell a complete tree from one a non-atomic rename half-processed.
    * Exposed to the crash-injection spec; production callers go through
    * [[inPlace]].
    */
  private[graft] def commitMarker(spark: SparkSession, dir: String): Unit = {
    val fs = fsFor(spark, dir)
    val inv = inventory(fs, new org.apache.hadoop.fs.Path(s"$dir/_compact/segs"))
    // temp + rename: the marker IS the commit point, so its own write
    // must be all-or-nothing — a crash mid-write would otherwise leave a
    // truncated inventory that either wedges recovery (cut mid-line) or,
    // worse, records a plausible SUBSET a later half-deleted staging
    // passes, re-opening the silent-loss window (review-found). A crash
    // before the rename leaves only the ignored .tmp: the fold reads as
    // uncommitted and is discarded — correct
    // the inventory is line/tab-delimited: a relpath carrying a tab or
    // newline would serialize to a line readMarker silently drops,
    // weakening the completeness check to a subset — the exact silent-
    // loss window the inventory exists to close. Store-generated names
    // never contain them, but nothing upstream pins that: fail loud at
    // commit time (fold uncommitted, staging discarded — safe)
    inv.foreach { case (rel, _) =>
      require(!rel.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"SegmentCompaction: staged file path ${rel.flatMap {
          case '\t' => "\\t"; case '\n' => "\\n"; case '\r' => "\\r"
          case c => c.toString
        }} contains a tab/newline - the swap marker's inventory is " +
          "line/tab-delimited and cannot record it faithfully; rename the " +
          "file (the fold stays uncommitted, nothing was swapped)")
    }
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/_compact/_SWAP.tmp")
    val out = fs.create(tmp, true)
    try out.write(inv.map { case (rel, len) => s"$rel\t$len\n" }.mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, marker(dir)),
      s"SegmentCompaction: could not commit the swap marker under $dir " +
        "(rename failed); the staged fold remains uncommitted - re-run")
  }

  /** Recursive file inventory of `root`: (path relative to root, length),
    * sorted. Empty when `root` does not exist. [[FsWalk]] keeps this a
    * true metadata listing (local `listFiles` costs ~6 ms/file).
    */
  private def inventory(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(String, Long)] = {
    val base = fs.makeQualified(root).toUri.getPath.stripSuffix("/") + "/"
    FsWalk.files(fs, root)
      .map(s => (fs.makeQualified(s.getPath).toUri.getPath.stripPrefix(base), s.getLen))
      .sortBy(_._1)
  }

  /** The inventory recorded in the marker, or None for a legacy (empty /
    * unparseable) marker. Truncated tails degrade to a weaker subset
    * check, never to a parse failure — recovery must not wedge on a
    * half-written marker.
    */
  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[Seq[(String, Long)]] = {
    val len = fs.getFileStatus(marker(dir)).getLen.toInt
    val in = fs.open(marker(dir))
    val text =
      try {
        val buf = new Array[Byte](len)
        in.readFully(0L, buf)
        new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    val inv = text.split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
      line.split("\t") match {
        case Array(rel, len) if len.forall(_.isDigit) && len.nonEmpty =>
          Some((rel, len.toLong))
        case _ => None
      }
    }
    if (inv.isEmpty) None else Some(inv)
  }

  /** Every recorded file present under `root` at its recorded length.
    * ONE recursive listing + map compare, not a per-file `getFileStatus`
    * loop: recovery verifies the whole inventory, and on an object store
    * a many-thousand-file segs tree would otherwise be a driver-side
    * metadata storm of N HEAD calls (one LIST page ≈ 1000 keys).
    * Measured at the many-file tier: `ScaleProbe compaction_recovery`.
    */
  private def complete(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, inv: Seq[(String, Long)]): Boolean = {
    val have = inventory(fs, root).toMap
    inv.forall { case (rel, len) => have.get(rel).contains(len) }
  }

  private def finishSwap(fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val segs = new org.apache.hadoop.fs.Path(s"$dir/segs")
    val stSegs = new org.apache.hadoop.fs.Path(s"$dir/_compact/segs")
    // idempotent re-entry: act only while the staging segs still exist —
    // after an atomic rename a retry must NOT delete the swapped tree
    if (fs.exists(stSegs)) {
      val invOpt = readMarker(fs, dir)
      val stagingComplete = invOpt.forall(complete(fs, stSegs, _))
      if (stagingComplete) {
        // the fold's inventory is intact in staging (rename never started,
        // stopped mid-copy, or legacy marker): staging is authoritative
        if (fs.exists(segs)) fs.delete(segs, true)
        require(fs.rename(stSegs, segs),
          s"SegmentCompaction: rename $stSegs -> $segs failed; re-run to retry " +
            "(the staging fold is committed and will roll forward)")
      } else {
        // a non-atomic (copy+delete) rename crashed after its copy phase:
        // staging is half-deleted, so the complete fold must be in segs —
        // verify BEFORE discarding staging; if neither tree matches the
        // inventory (an interleaving rename split a file between phases)
        // fail loud with both states on the table, union intact
        require(complete(fs, segs, invOpt.get),
          s"SegmentCompaction: $dir was interrupted mid-rename with NEITHER " +
            s"$stSegs nor $segs holding the committed fold's full inventory " +
            "(a non-atomic rename split the tree between its copy and delete " +
            "phases). Nothing has been deleted: the two trees' union still " +
            "holds every committed byte - reconstruct segs from it manually, " +
            "then remove _compact")
        // segs holds the complete fold: keep it, staging leftovers go below
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_compact"), true)
  }

  private def fsFor(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
