package graft.streaming

import graft.dedup.Dedup
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Continuous corpus ingestion with exact dedup against everything seen
  * so far — the streaming twin of [[Dedup.exactIncremental]].
  *
  * State is NOT a Spark state store: the seen-fingerprint set is a
  * parquet table (16 B/doc), appended per micro-batch. That choice is
  * deliberate for 100 TB pipelines: the fingerprint artifact outlives the
  * stream (restarts, backfills, multiple writers resolve through the
  * table, and batch jobs share the same artifact via
  * [[Dedup.exactIncrementalAgainst]]), whereas state-store contents are
  * private to one query's checkpoint. foreachBatch gives per-batch
  * exactly-once appends when paired with the stream checkpoint.
  *
  * Per micro-batch cost: batch-sized dedup + one scan of the fingerprint
  * table (columnar, fingerprint-only) — at 10⁹ docs that scan is ~16 GB
  * across the cluster, and a bloom-filter or bucketed layout on `__fp`
  * cuts it further; the corpus TEXT is never rescanned.
  */
object IngestDedup {

  /** Wire a streaming `docs` source into foreachBatch ingestion. Returns
    * the writer (caller sets checkpoint/trigger and starts it).
    */
  def writer(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      corpusDir: String,
      fingerprintDir: String
  ): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      ingestBatch(batch, textCol, idCol, corpusDir, fingerprintDir)
    }

  /** One micro-batch: dedup within the batch, drop docs whose fingerprint
    * is already in the store, append survivors + their fingerprints.
    * Also usable directly from a batch job for backfills.
    */
  def ingestBatch(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      corpusDir: String,
      fingerprintDir: String
  ): Unit = {
    val spark = batch.sparkSession
    val seen: DataFrame =
      try spark.read.parquet(fingerprintDir)
      catch { case _: org.apache.spark.sql.AnalysisException => // first batch: no store yet
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__fp", org.apache.spark.sql.types.StringType))))
      }
    // survivors must be materialized BEFORE the fingerprint append below
    // rewrites what `seen` reads, so pin them with a local checkpoint
    val survivors = Dedup.exactIncrementalAgainst(seen, batch, textCol, idCol)
      .localCheckpoint(true)
    survivors.write.mode(SaveMode.Append).parquet(corpusDir)
    survivors.select(T.fingerprint(col(textCol)).as("__fp"))
      .write.mode(SaveMode.Append).parquet(fingerprintDir)
  }
}
