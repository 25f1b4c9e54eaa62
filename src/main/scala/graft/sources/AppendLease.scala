package graft.sources

import org.apache.spark.sql.SparkSession

/** Exclusive mutation lease shared by the single-appender artifact
  * stores ([[SegmentedStore]]'s four + [[graft.text.LinkGraphStore]]):
  * `dir/_LEASE` is created exclusively for the duration of a mutation so
  * a second mutator fails loud instead of interleaving with a
  * mid-swap/mid-fold tree. Exclusive-create is atomic on local/HDFS and
  * best-effort on object stores — a lost race there is no worse than an
  * uncoordinated interleave, and the common misuse (two cron pipelines
  * mutating one store) fails loud. A crashed holder leaves the lease
  * behind; the failure message carries the holder breadcrumb + lease age
  * and spells out the recovery (verify the holder is dead, delete
  * `_LEASE`, re-run — every store's mutation entry point rolls
  * interrupted work forward first, so re-running converges). Reads never
  * take the lease.
  */
object AppendLease {

  /** Leases held by the CURRENT THREAD (qualified lease-path strings) —
    * the reentrancy token. Thread-locality is deliberate: a nested
    * withLease on the SAME thread (appendAuto → recover → finishSwap) is
    * the composition the stores need, while a DIFFERENT thread in the
    * same JVM is a genuinely concurrent mutator and must fail loud like
    * any other process (a pid-keyed check would wave it through — and
    * would also mistake a recycled pid after a reboot for ourselves;
    * review-found, twice).
    */
  private val held = new ThreadLocal[java.util.HashSet[String]] {
    override def initialValue(): java.util.HashSet[String] =
      new java.util.HashSet[String]()
  }

  /** Run `body` holding the store's exclusive appender lease. REENTRANT
    * per thread: a nested acquire of the same lease on the same thread
    * runs `body` directly (the outer frame owns creation and release).
    */
  def withLease[T](spark: SparkSession, dir: String, storeName: String)(body: => T): T = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease = fs.makeQualified(new org.apache.hadoop.fs.Path(s"$dir/_LEASE"))
    val key = lease.toString
    if (held.get().contains(key)) return body // nested on this thread
    val out =
      try fs.create(lease, false) // overwrite=false: exclusive
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"$storeName: another appender holds the mutation lease $lease " +
            s"(${holderInfo(fs, lease)}) - this store is single-appender " +
            "(concurrent mutators can interleave a fresh append into a " +
            "tree mid-swap/mid-fold). If the holder is still running, wait " +
            "for it; if it CRASHED, verify it is dead, delete the _LEASE " +
            "file and re-run - every mutation entry point rolls " +
            "interrupted work forward first, so re-running converges", e)
      }
    held.get().add(key)
    try {
      // holder breadcrumb: stale-lease triage info for the failure
      // message above (exclusion itself is the file + the thread-local)
      out.write(s"pid=${ProcessHandle.current().pid()} time=${java.time.Instant.now()}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      body
    } finally {
      held.get().remove(key)
      fs.delete(lease, false)
    }
  }

  /** Triage line for the failure message: the holder's breadcrumb plus
    * the lease file's age — an hours-old lease under a minutes-long
    * mutation is almost certainly a crashed holder. Best-effort text
    * only (a racing release mid-read just degrades the message).
    */
  private def holderInfo(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path): String =
    try {
      val st = fs.getFileStatus(lease)
      val in = fs.open(lease)
      val crumb =
        try {
          val buf = new Array[Byte](128)
          val n = math.max(0, in.read(buf))
          new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8).trim
        } finally in.close()
      val ageSec = math.max(0L,
        (System.currentTimeMillis() - st.getModificationTime) / 1000L)
      val who = if (crumb.nonEmpty) crumb else "<no breadcrumb>"
      s"held by $who, age ${ageSec}s"
    } catch { case _: Exception => "holder released mid-check - retry" }
}
