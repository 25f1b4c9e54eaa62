package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** Streaming CDC materialization: a changelog stream (key + payload +
  * op + seq) continuously folded into a parquet snapshot — the streaming
  * twin of [[Merge.applyChangelog]], and the composition of the engine's
  * snapshot model (reference tables are immutable snapshots) with
  * Structured Streaming's foreachBatch.
  *
  * Each micro-batch applies compact-then-merge: the batch's newest change
  * per key wins, 'D' deletes, others upsert. foreachBatch + the stream
  * checkpoint give per-batch exactly-once application; replays of a
  * committed batch are harmless because [[Merge.applyChangelog]] is
  * idempotent for a fixed batch (MergeSpec).
  *
  * Scale note: [[applyBatch]] rewrites the snapshot per batch (fine for
  * dimension-table-sized state, which is the common CDC target, and buys
  * atomic versioned publish). [[applyBatchPartitioned]] is the
  * fact-table path: key-hash-partitioned snapshot, dynamic partition
  * overwrite, per-batch IO bounded by the touched buckets instead of the
  * table.
  */
object CdcApply {

  /** Wire a streaming changelog into foreachBatch application. Returns
    * the writer (caller sets checkpoint/trigger and starts it).
    */
  def writer(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      snapshotDir: String
  ): DataStreamWriter[Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      applyBatch(batch, keyCols, seqCol, opCol, snapshotDir)
    }

  /** One micro-batch: fold `batch` into the stored snapshot. Also usable
    * from a batch job (backfill replays a changelog segment).
    *
    * Snapshots publish through [[graft.sources.Versioned]] (`v=N` +
    * `_SUCCESS` commit marker), so a crash mid-write can never destroy
    * the previous snapshot — readers ([[readSnapshot]]) only ever see
    * committed versions, and a replayed batch reclaims the uncommitted
    * leftover. A replay of an already-committed batch writes one extra
    * version with identical content — harmless; bound history with
    * [[graft.sources.Versioned.prune]].
    */
  def applyBatch(
      batch: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      snapshotDir: String
  ): Unit = {
    val spark = batch.sparkSession
    val payloadSchema = StructType(batch.schema.filterNot(f => f.name == seqCol || f.name == opCol))
    val snap: DataFrame = graft.sources.Versioned.latestVersion(spark, snapshotDir) match {
      case Some(v) => graft.sources.Versioned.read(spark, snapshotDir, v)
      case None    => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], payloadSchema)
    }
    val next = Merge.applyChangelog(snap, batch, keyCols, seqCol, opCol)
    graft.sources.Versioned.write(next, snapshotDir)
  }

  /** The current committed snapshot (empty-schema-less: throws when no
    * version has ever committed).
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, snapshotDir: String): DataFrame =
    graft.sources.Versioned.readLatest(spark, snapshotDir)

  /** Bucket column name of the partitioned snapshot layout. */
  val BucketCol = "__graft_bucket"

  /** Fact-scale variant: the snapshot lives as ONE parquet table
    * hash-partitioned on the key (`__graft_bucket=N` directories), and a
    * micro-batch rewrites ONLY the buckets its keys hash into — dynamic
    * partition overwrite. Per-batch cost is proportional to the touched
    * key range, not the table: a 100 TB snapshot with a batch touching 3
    * of 4096 buckets reads and rewrites ~75 GB, and partition pruning
    * keeps the untouched 99.9% entirely out of the plan (no scan, no
    * shuffle, no write).
    *
    * Atomicity contract differs from [[applyBatch]]: dynamic overwrite
    * commits per partition via Spark's file-commit protocol rather than a
    * whole-snapshot version flip, so a crash mid-write can leave a
    * PARTIAL batch applied (some buckets new, some old). Recovery is the
    * stream checkpoint replaying the batch: [[Merge.applyChangelog]] is
    * idempotent for a fixed batch, and re-overwriting a bucket from the
    * pre-batch content of the OTHER buckets is consistent because buckets
    * are independent under key-hash partitioning (no cross-bucket reads).
    * Pipelines needing atomic whole-table publish keep [[applyBatch]]'s
    * versioned layout (dimension scale) or front a table format that owns
    * atomic partition swap.
    */
  def applyBatchPartitioned(
      batch: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      snapshotDir: String,
      nBuckets: Int = 4096
  ): Unit = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val spark = batch.sparkSession
    def bucketOf = pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets))
    val payloadSchema = StructType(batch.schema.filterNot(f => f.name == seqCol || f.name == opCol))
    val root = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(root)
    // a snapshot is only readable under the nBuckets it was built with: a
    // mismatched caller would prune the WRONG buckets and write duplicate
    // keys (same hazard ivfTopK guards for nlist). The layout records its
    // bucket count in a sidecar; subsequent applies must match it.
    val bucketsFile = new org.apache.hadoop.fs.Path(root, "_graft_buckets")
    if (exists && fs.exists(bucketsFile)) {
      val in = fs.open(bucketsFile)
      val stored = try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close()
      require(stored == nBuckets,
        s"snapshot at $snapshotDir was built with nBuckets=$stored, caller passed $nBuckets")
    }
    // buckets this batch touches — ≤ nBuckets ints, driver-bounded
    val touched = batch.select(bucketOf.as(BucketCol)).distinct()
      .collect().map(_.getLong(0)).sorted
    val snapTouched: DataFrame =
      if (exists)
        spark.read.parquet(snapshotDir)
          // partition-pruned scan: only touched bucket directories are read
          .where(col(BucketCol).isin(touched: _*))
          .drop(BucketCol)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], payloadSchema)
    val next = Merge.applyChangelog(snapTouched, batch, keyCols, seqCol, opCol)
      .withColumn(BucketCol, bucketOf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // dynamic overwrite only replaces partitions PRESENT in the output:
      // a touched bucket whose rows were all deleted would otherwise keep
      // its old files (the delete would be silently lost) — remove such
      // now-empty buckets explicitly after the write. Idempotent across
      // replays: the recomputed merge yields the same empty set.
      val surviving = next.select(col(BucketCol)).distinct()
        .collect().map(_.getLong(0)).toSet
      next.write
        // per-writer option — scoped to THIS write; mutating the
        // session-global conf would race concurrent writers into a
        // static (whole-table) overwrite
        .option("partitionOverwriteMode", "dynamic")
        .mode(if (exists) "overwrite" else "errorifexists")
        .partitionBy(BucketCol)
        .parquet(snapshotDir)
      touched.filterNot(surviving).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"$BucketCol=$b"), true)
      }
      if (!fs.exists(bucketsFile)) {
        val out = fs.create(bucketsFile, true)
        try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
      }
    } finally next.unpersist()
  }

  /** Streaming wiring for the partitioned layout. */
  def writerPartitioned(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      snapshotDir: String,
      nBuckets: Int = 4096
  ): DataStreamWriter[Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      applyBatchPartitioned(batch, keyCols, seqCol, opCol, snapshotDir, nBuckets)
    }

  /** Read the partitioned snapshot (bucket column stays internal). */
  def readSnapshotPartitioned(spark: org.apache.spark.sql.SparkSession, snapshotDir: String): DataFrame =
    spark.read.parquet(snapshotDir).drop(BucketCol)
}
