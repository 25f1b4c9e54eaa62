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
  * `compactTo`). Rename is atomic on HDFS/local; on object stores it is
  * copy+delete — the marker discipline stays correct, the window just
  * widens.
  */
object SegmentCompaction {

  /** Finish (or discard) an interrupted in-place fold. Returns true if a
    * committed fold was rolled forward.
    */
  def recover(spark: SparkSession, dir: String): Boolean = {
    val fs = fsFor(spark, dir)
    val staging = new org.apache.hadoop.fs.Path(s"$dir/_compact")
    if (!fs.exists(staging)) false
    else if (!fs.exists(marker(dir))) { fs.delete(staging, true); false }
    else { finishSwap(fs, dir); true }
  }

  /** Compact `dir` in place: `fold(stagingDir)` must write a complete
    * store (the store's own `compactTo(dir, stagingDir)`), then the segs
    * tree swaps under the marker protocol above.
    */
  def inPlace(spark: SparkSession, dir: String)(fold: String => Unit): Unit = {
    recover(spark, dir)
    val fs = fsFor(spark, dir)
    val staging = new org.apache.hadoop.fs.Path(s"$dir/_compact")
    if (fs.exists(staging)) fs.delete(staging, true) // unmarked leftover
    fold(staging.toString)
    fs.create(marker(dir), true).close() // commit point
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

  private def finishSwap(fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val segs = new org.apache.hadoop.fs.Path(s"$dir/segs")
    val stSegs = new org.apache.hadoop.fs.Path(s"$dir/_compact/segs")
    // idempotent re-entry: only delete+rename while the staging segs
    // still exist — after the rename a retry must NOT delete the
    // freshly-swapped tree
    if (fs.exists(stSegs)) {
      if (fs.exists(segs)) fs.delete(segs, true)
      require(fs.rename(stSegs, segs),
        s"SegmentCompaction: rename $stSegs -> $segs failed; re-run to retry " +
          "(the staging fold is committed and will roll forward)")
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_compact"), true)
  }

  private def fsFor(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
