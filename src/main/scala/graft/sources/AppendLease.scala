package graft.sources

import org.apache.spark.sql.SparkSession

/** Exclusive mutation lease shared by the single-appender artifact
  * stores ([[SegmentedStore]]'s four + [[graft.text.LinkGraphStore]]):
  * `dir/_LEASE` is created exclusively for the duration of a mutation so
  * a second out-of-process mutator fails loud instead of interleaving
  * with a mid-swap/mid-fold tree. Exclusive-create is atomic on
  * local/HDFS and best-effort on object stores — a lost race there is no
  * worse than an uncoordinated interleave, and the common misuse (two
  * cron pipelines mutating one store) fails loud. A crashed holder
  * leaves the lease behind; the failure message spells out the recovery
  * (verify the holder is dead, delete `_LEASE`, re-run — every store's
  * mutation entry point rolls interrupted work forward first, so
  * re-running converges). Reads never take the lease.
  */
object AppendLease {

  /** REENTRANT within a process: a nested withLease under the same pid
    * runs `body` without re-acquiring or releasing (the outer holder owns
    * the file) — what lets [[SegmentCompaction.recover]] take the lease
    * for its roll-forward while already running inside a store's leased
    * appendAuto/compactInPlace. Cross-process, pid equality on another
    * machine's lease is a (documented, best-effort) false positive the
    * same way object-store exclusive-create is.
    */
  def withLease[T](spark: SparkSession, dir: String, storeName: String)(body: => T): T = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(s"$dir/_LEASE")
    val self = s"pid=${ProcessHandle.current().pid()}"
    val out =
      try fs.create(lease, false) // overwrite=false: exclusive
      catch {
        case e: java.io.IOException =>
          if (heldBySelf(fs, lease, self)) return body // reentrant: outer owns release
          throw new IllegalStateException(
            s"$storeName: another appender holds the mutation lease $lease - " +
              "this store is single-appender (concurrent mutators can " +
              "interleave a fresh append into a tree mid-swap/mid-fold). If " +
              "the holder is still running, wait for it; if it CRASHED, " +
              "verify it is dead, delete the _LEASE file and re-run - every " +
              "mutation entry point rolls interrupted work forward first, so " +
              "re-running converges", e)
      }
    try {
      // holder breadcrumb: reentrancy key + the stale-lease triage info
      out.write(s"$self time=${java.time.Instant.now()}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      body
    } finally fs.delete(lease, false)
  }

  private def heldBySelf(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path, self: String): Boolean =
    try {
      val in = fs.open(lease)
      val head =
        try {
          val buf = new Array[Byte](64)
          val n = math.max(0, in.read(buf))
          new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      head.startsWith(self + " ")
    } catch { case _: Exception => false } // racing holder released/creating: not ours
}
