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
  * Scale note: the snapshot is rewritten per batch here (fine for
  * dimension-table-sized state, which is the common CDC target). At
  * fact-table scale, key-partition the snapshot directory and rewrite
  * only partitions containing batch keys (dynamic partition overwrite) —
  * the merge plan itself already touches one snapshot-side shuffle
  * either way.
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
}
