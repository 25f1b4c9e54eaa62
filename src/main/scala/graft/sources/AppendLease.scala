package graft.sources

import org.apache.spark.sql.SparkSession

/** Exclusive mutation lease shared by the single-appender artifact
  * stores ([[SegmentedStore]]'s four + [[graft.text.LinkGraphStore]]):
  * `dir/_LEASE` is created exclusively for the duration of a mutation so
  * a second mutator fails loud instead of interleaving with a
  * mid-swap/mid-fold tree. Exclusive-create is atomic on HDFS
  * (`create(overwrite=false)` is a single namenode op) and — via
  * `java.nio` `Files.createFile`, true `O_EXCL` — on local paths too
  * (Hadoop's own `RawLocalFileSystem.create(overwrite=false)` is
  * exists-then-create, NOT atomic, so local goes through nio instead);
  * on object stores it is best-effort — a lost race there is no worse
  * than an uncoordinated interleave, and the common misuse (two cron
  * pipelines mutating one store) fails loud. A crashed holder leaves the
  * lease behind; the failure message carries the holder breadcrumb +
  * lease age, flags an obviously STALE lease (age above
  * `spark.graft.lease.staleWarnSec`, default 3600), and spells out the
  * recovery (verify the holder is dead, delete `_LEASE`, re-run — every
  * store's mutation entry point rolls interrupted work forward first, so
  * re-running converges). Setting `spark.graft.lease.autoReclaimSec`
  * (off by default) reclaims a lease older than that many seconds
  * automatically — an explicit opt-in for pipelines whose mutation time
  * is bounded and monitored; leave it off anywhere a holder could
  * legitimately run long. Reads never take the lease.
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
    acquire(spark, fs, lease, storeName)
    held.get().add(key)
    try {
      // holder breadcrumb: stale-lease triage info for the failure
      // message above (exclusion itself is the file + the thread-local;
      // we own the lease here, so an overwrite of OUR file is safe)
      writeCrumb(fs, lease)
      body
    } finally {
      held.get().remove(key)
      fs.delete(lease, false)
    }
  }

  /** Create the lease file exclusively, translating a refused create into
    * the triage-carrying failure. Opt-in auto-reclaim: when
    * `spark.graft.lease.autoReclaimSec` is set and the existing lease is
    * older, CLAIM the stale file by atomic rename and retry the exclusive
    * create ONCE — so of two reclaiming waiters exactly one enters and
    * the other fails loud against the winner's fresh lease.
    */
  private def acquire(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path, storeName: String): Unit =
    try createExclusive(fs, lease)
    catch {
      case e: java.io.IOException =>
        val reclaimSec = confSec(spark, "spark.graft.lease.autoReclaimSec")
        val age = leaseAgeSec(fs, lease)
        if (reclaimSec.exists(r => age.exists(_ > r))) {
          System.err.println(s"[AppendLease] $storeName: auto-reclaiming " +
            s"stale lease $lease (${holderInfo(fs, lease)}; " +
            s"spark.graft.lease.autoReclaimSec=${reclaimSec.get})")
          // claim the STALE file by atomic RENAME, not delete: with a
          // plain delete two reclaiming waiters interleave as A.delete,
          // A.create, B.delete (removing A's FRESH lease), B.create —
          // both inside. Rename of one source succeeds for exactly one
          // waiter; the loser falls through to the retry create and
          // fails loud against the winner's fresh lease (review-found)
          val claim = new org.apache.hadoop.fs.Path(lease.getParent,
            s"_LEASE.reclaimed.${ProcessHandle.current().pid()}.${System.nanoTime()}")
          if ((try fs.rename(lease, claim) catch { case _: java.io.IOException => false })
              && !claimedStale(fs, claim, lease, reclaimSec.get, storeName))
            throw refused(spark, fs, lease, storeName, e)
          try createExclusive(fs, lease)
          catch { case e2: java.io.IOException =>
            throw refused(spark, fs, lease, storeName, e2) }
        } else throw refused(spark, fs, lease, storeName, e)
    }

  /** TOCTOU re-verify after a successful rename-claim (review-found):
    * between OUR staleness check and the rename, a faster reclaimer can
    * have renamed the stale lease away AND entered with a FRESH lease —
    * rename is path-based, not inode-based, so the file we just claimed
    * may be the winner's LIVE lease. The mtime rides the rename, so
    * staleness is re-checked on the claimed file ITSELF: genuinely stale
    * (or vanished) → delete it and return true (proceed to the retry
    * create); fresh → rename it BACK to the lease path and return false
    * (the caller fails loud like any other refused acquire). If the
    * rename-back loses to a third waiter's new lease, the stray claim is
    * NOT deleted — both paths are named for manual triage (this corner
    * needs two reclaim races inside one mtime window, i.e. a reclaim
    * timeout already far too short for the store's mutation time).
    */
  private[graft] def claimedStale(fs: org.apache.hadoop.fs.FileSystem,
      claim: org.apache.hadoop.fs.Path, lease: org.apache.hadoop.fs.Path,
      reclaimSec: Long, storeName: String): Boolean =
    if (leaseAgeSec(fs, claim).forall(_ > reclaimSec)) {
      fs.delete(claim, false) // genuinely stale (or already gone)
      true
    } else {
      val restored =
        try fs.rename(claim, lease)
        catch { case _: java.io.IOException => false }
      if (!restored)
        System.err.println(s"[AppendLease] $storeName: claimed a FRESH " +
          s"lease in a reclaim race and could not restore it: the live " +
          s"holder's lease file is now $claim (a newer lease exists at " +
          s"$lease). Verify the holders and remove the stray file.")
      false
    }

  /** A `spark.graft.lease.*` seconds knob; malformed values fail with the
    * knob named instead of a bare NumberFormatException mid-acquire.
    */
  private def confSec(spark: SparkSession, key: String): Option[Long] =
    spark.conf.getOption(key).map(v => try v.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"AppendLease: $key must be a number of seconds, got '$v'")
    })

  /** True exclusive create: `java.nio` `O_EXCL` for local paths (Hadoop's
    * RawLocalFileSystem `create(overwrite=false)` is exists-then-create —
    * two same-host processes can race past it), Hadoop's atomic
    * namenode create for HDFS, best-effort elsewhere.
    */
  private def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path): Unit =
    if (Option(lease.toUri.getScheme).forall(_ == "file")) {
      val p = java.nio.file.Paths.get(lease.toUri.getPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.createFile(p) // FileAlreadyExistsException is an IOException
    } else fs.create(lease, false).close()

  private def writeCrumb(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path): Unit = {
    // host + pid + time: on a shared filesystem the pid alone points
    // triage at the wrong machine (review-found) — "verify the holder is
    // dead" needs to know WHERE the pid lives
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown-host" }
    val crumb = (s"host=$host pid=${ProcessHandle.current().pid()} " +
      s"time=${java.time.Instant.now()}\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = fs.create(lease, true)
    try out.write(crumb) finally out.close()
  }

  private def refused(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path, storeName: String,
      cause: java.io.IOException): IllegalStateException = {
    val warnSec = confSec(spark, "spark.graft.lease.staleWarnSec").getOrElse(3600L)
    val stale = leaseAgeSec(fs, lease) match {
      case Some(age) if age > warnSec =>
        s" NOTE: this lease looks STALE (age ${age}s > spark.graft.lease." +
          s"staleWarnSec=$warnSec) - almost certainly a crashed holder; " +
          "verify and delete it, or set spark.graft.lease.autoReclaimSec " +
          "to reclaim leases this old automatically."
      case _ => ""
    }
    new IllegalStateException(
      s"$storeName: another appender holds the mutation lease $lease " +
        s"(${holderInfo(fs, lease)}) - this store is single-appender " +
        "(concurrent mutators can interleave a fresh append into a " +
        "tree mid-swap/mid-fold). If the holder is still running, wait " +
        "for it; if it CRASHED, verify it is dead, delete the _LEASE " +
        "file and re-run - every mutation entry point rolls " +
        "interrupted work forward first, so re-running converges." + stale, cause)
  }

  /** Age of the lease file in seconds, None if it vanished mid-check. */
  private def leaseAgeSec(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path): Option[Long] =
    try Some(math.max(0L,
      (System.currentTimeMillis() - fs.getFileStatus(lease).getModificationTime) / 1000L))
    catch { case _: Exception => None }

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
