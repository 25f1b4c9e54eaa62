package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared surface plumbing for the committed-segment artifact stores
  * (Bm25Store, MinHashStore, MediaFingerprintStore, SemDedupStore) —
  * one home for the protocol-critical pieces that were four structurally
  * identical copies, so the next protocol fix lands once:
  *
  *  - committed-segment listing and the `_done`-marker replay check
  *  - the appendAuto router (append, then fold in place at the
  *    segment-count bound)
  *  - the in-place fold delegation to [[SegmentCompaction]]'s staged
  *    roll-forward swap
  *  - the out-of-place-only compactTo guard
  *  - segment-id resolution (reserved build segment 0, auto-assign)
  *  - the append batch-id guards (unique + monotonic above the stored max)
  *  - the torn-build loud guard (manifest present, zero committed segments)
  *  - the per-segment surface reader (unioned per-segment reads)
  *
  * Store-SPECIFIC logic — what a segment contains, its manifest fields,
  * its bucketing columns, its serve-time pruning — stays in each store.
  * Layout contract shared by all: `dir/_manifest.json` (root parameters),
  * `dir/segs/seg=<id>/` per segment with `_meta.json` + `_done` marker
  * committed LAST, `dir/_compact` as [[SegmentCompaction]]'s staging.
  * (The reference's closest analog is its batch-store file layout with a
  * write-then-flag commit, `ColumnarContainerTable`-style; the segmenting
  * itself is this engine's design for append-without-rewrite.)
  *
  * == Single-writer contract ==
  * Mutation is SINGLE-APPENDER: the recover→append→fold sequence is
  * crash-safe and idempotent against ITSELF, but two concurrent mutators
  * can interleave — one entering `compactInPlace` while the other appends
  * a fresh segment into the tree mid-swap (the appended segment would be
  * lost to the pending swap), or both folding the same segments twice.
  * [[appendAuto]]/[[compactInPlace]] enforce it with a best-effort LEASE:
  * `dir/_LEASE` is created exclusively for the duration of the mutation,
  * so a second out-of-process mutator fails loud with the lease named
  * instead of interleaving. A crashed holder leaves the lease behind —
  * the failure message says so and recovery is "verify the holder is
  * dead, delete `_LEASE`, re-run" (every mutation entry point rolls an
  * interrupted swap forward first, so re-running converges). Plain
  * `append` with caller-chosen segment ids stays lease-free on its fast
  * path: pipelines that shard appends across jobs coordinate ids
  * themselves, and the monotonic-id guard still rejects overlap — but
  * the recover() it runs first DOES take the lease when there is an
  * interrupted swap to act on, so a roll-forward can never interleave
  * with a live compactInPlace's own finishSwap (review-found). NOTE the
  * limit of that contract: id coordination only prevents segment-id
  * OVERLAP — it does NOT make plain `append` safe to run concurrently
  * with `compactInPlace`. A fresh segment landed into `segs/` while a
  * leased fold is mid-flight is absent from the staged tree and is
  * deleted by the fold's finishSwap. Callers sharding plain appends
  * across jobs must also serialize them against compaction (or use
  * `appendAuto`, whose lease covers both). Reads never take the lease.
  */
trait SegmentedStore {

  /** Error-message prefix — the store object's name ("Bm25Store"). */
  protected def storeName: String

  /** Torn-build recovery hint for [[requireCommittedNonEmpty]], e.g.
    * "a build crashed mid-overwrite; rebuild the store with X.build".
    */
  protected def tornBuildHint: String

  /** Noun for the compactTo guard message ("store" or "index"). */
  protected def compactNoun: String = "store"

  /** Fold every committed segment into a fresh SINGLE-segment store at
    * `outDir` — OUT-OF-PLACE only (call [[requireDistinctDirs]] first):
    * the fold deletes the output's segments before the source's lazy
    * readers materialize, so compacting onto the source would scan its
    * own deleted files and destroy the store.
    */
  def compactTo(spark: SparkSession, dir: String, outDir: String,
      nBuckets: Int = -1): Unit

  /** Committed segment ids (marker present), ascending. */
  def committedSegments(spark: SparkSession, dir: String): Seq[Long] =
    SegmentCompaction.committedSegments(spark, dir)

  /** Fold the committed segments where the store stands — the staged
    * roll-forward protocol ([[SegmentCompaction]]): the fold lands under
    * `dir/_compact` first, a marker commits it, and the segs tree swaps;
    * a crash anywhere is either invisible (unmarked staging discarded) or
    * finished by the next append/compact call. Serving is bit-identical
    * across the fold (merge-at-read ≡ merge-at-write; spec-asserted per
    * store).
    */
  def compactInPlace(spark: SparkSession, dir: String): Unit =
    withLease(spark, dir) {
      SegmentCompaction.inPlace(spark, dir)(staging =>
        compactTo(spark, dir, staging))
    }

  // ---- protected plumbing the stores' own entry points compose ----

  /** Run `body` holding the store's exclusive appender lease (see the
    * single-writer contract in the trait doc; shared implementation —
    * incl. the non-segmented LinkGraphStore's — in [[AppendLease]]).
    */
  protected final def withLease[T](spark: SparkSession, dir: String)(body: => T): T =
    AppendLease.withLease(spark, dir, storeName)(body)

  protected final def fsFor(spark: SparkSession,
      dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** compactTo's out-of-place-only guard (see [[compactTo]]). */
  protected final def requireDistinctDirs(spark: SparkSession, dir: String,
      outDir: String): Unit = {
    val a = new org.apache.hadoop.fs.Path(dir)
    val fs = a.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.makeQualified(a) !=
        fs.makeQualified(new org.apache.hadoop.fs.Path(outDir)),
      s"$storeName.compactTo: outDir must differ from the source dir - the " +
        "fold deletes the output's segments before the source readers " +
        s"materialize, so an in-place compact would destroy the $compactNoun")
  }

  /** The appendAuto router: run the store's own append, then fold in
    * place once the committed-segment count reaches `maxSegments` — so a
    * daily-append pipeline never accumulates unbounded per-read segment
    * fan-out without anyone remembering to run the compaction. Amortized
    * fold cost is O(store / maxSegments) per append. Returns the route
    * taken ("append" | "append+compact") for callers/specs to assert.
    */
  protected final def autoRoute(spark: SparkSession, dir: String,
      maxSegments: Int)(doAppend: => Unit): String = {
    require(maxSegments >= 2,
      s"$storeName.appendAuto: maxSegments $maxSegments < 2")
    withLease(spark, dir) {
      doAppend // recovers any interrupted swap itself (append's family rule)
      if (committedSegments(spark, dir).size >= maxSegments) {
        compactInPlace(spark, dir) // lease is thread-reentrant
        "append+compact"
      } else "append"
    }
  }

  /** Whether `segmentId`'s `_done` marker exists — a committed replay's
    * short-circuit.
    */
  protected final def segmentCommitted(spark: SparkSession, dir: String,
      segmentId: Long): Boolean =
    fsFor(spark, dir).exists(
      new org.apache.hadoop.fs.Path(s"$dir/segs/seg=$segmentId/_done"))

  /** Resolve an append's segment id: segment 0 is RESERVED for the build
    * (an explicit 0 would hit the committed-replay short-circuit and
    * silently drop the batch — fail loud instead); negative auto-assigns
    * the next id after the highest committed.
    */
  protected final def resolveSegmentId(committed: Seq[Long],
      segmentIdArg: Long): Long = {
    require(segmentIdArg != 0L,
      s"$storeName.append: segment 0 belongs to the build - explicit " +
        "segment ids start at 1 (a stream passes batchId + 1)")
    if (segmentIdArg >= 0L) segmentIdArg
    else (0L +: committed).max + 1L
  }

  /** The append batch-id contract: ids unique within the batch and
    * strictly above every stored id (disjointness is what makes a
    * committed replay detectable and keeps append cost batch-sized).
    */
  protected final def requireMonotonicIds(n: Long, nDistinct: Long,
      lo: Long, storedMaxId: Long): Unit = {
    require(n == nDistinct,
      s"$storeName.append: batch ids are not unique ($n rows, " +
        s"$nDistinct distinct)")
    require(lo > storedMaxId,
      s"$storeName.append: batch ids start at $lo but the store already " +
        s"contains ids up to $storedMaxId - appended ids must sort above " +
        "every stored id (a committed append retried without an explicit " +
        "segmentId also lands here - the store already holds the batch)")
  }

  /** loadManifest's torn-build loud guard: the build always commits
    * segment 0, so a valid manifest over ZERO committed segments means a
    * rebuild crashed between its segs/ overwrite and seg 0's marker —
    * reading on would serve a silently-empty store.
    */
  protected final def requireCommittedNonEmpty(segs: Seq[Long],
      dir: String): Unit =
    require(segs.nonEmpty,
      s"$storeName: $dir has a manifest but no committed segments - " +
        s"$tornBuildHint; if an IN-PLACE compaction was interrupted " +
        "instead, its committed fold is still staged - any " +
        "append/appendAuto/compactInPlace call rolls it forward " +
        "(SegmentCompaction.recover)")

  /** One surface across the committed segments: per-segment reads
    * unioned, NOT one multi-path read — Spark's partition discovery
    * treats `seg=K/<surface>` roots as conflicting structures. Empty
    * `segs` yields an empty frame of `schema`.
    */
  protected final def readSurface(spark: SparkSession, dir: String,
      segs: Seq[Long], surface: String, schema: StructType): DataFrame =
    if (segs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      segs.map(s => spark.read.schema(schema)
          .parquet(s"$dir/segs/seg=$s/$surface"))
        .reduce(_ unionAll _)
}
