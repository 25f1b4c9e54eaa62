package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous chunk-dedup REWRITE: each micro-batch's documents are
  * re-emitted with every chunk removed that already survived in a
  * previously-committed batch (or at an earlier position of this batch) —
  * the streaming twin of [[Dedup.chunkDedupRewrite]], keep-first across
  * the whole stream in arrival order.
  *
  * State is the admitted chunk-hash table only (8 B/chunk, the same
  * artifact an incremental batch pipeline stores between runs via
  * [[Dedup.admittedChunkHashes]]); document text is never rescanned, so
  * the per-batch cost is batch × stored-hashes, not batch × corpus.
  *
  * Exactly-once across restarts, the [[BatchDirs]] protocol: rewritten
  * docs land in `outDir/batch=N`, the batch's newly-admitted hashes in
  * `stateDir/batch=N`, both OVERWRITTEN on replay; state reads exclude
  * the replaying batch's own directory. Replay convergence holds for any
  * batch, not just the latest: a chunk hash is stored by exactly ONE
  * batch (the first to admit it — any later batch seeing it in state
  * drops it and stores nothing), so excluding the replayed batch's own
  * directory reconstructs precisely the state its first run saw, and the
  * rewrite is deterministic from there.
  */
object StreamingRewrite {

  /** Wire a document stream into the continuous rewrite. Caller sets
    * checkpoint/trigger and starts the writer.
    */
  def writer(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      outDir: String,
      stateDir: String,
      w: Int = 8
  ): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, batchId, textCol, idCol, outDir, stateDir, w)
    }

  /** One micro-batch (also usable for batch backfill replays). */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      textCol: String,
      idCol: String,
      outDir: String,
      stateDir: String,
      w: Int = 8
  ): Unit = {
    val spark = batch.sparkSession
    val prior = BatchDirs.read(spark, stateDir, excludeBatch = Some(batchId))
      .getOrElse(emptyHashes(spark))
      .select(col("h"))
    // the batch is read twice (rewrite + state delta) — a foreachBatch
    // DataFrame is backed by the replayable micro-batch source, and the
    // fused chunk pass is recompute-cheap (the substring-dedup
    // persist-vs-recompute measurement)
    Dedup.chunkDedupRewriteAgainst(prior, batch, textCol, idCol, w)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    Dedup.admittedChunkHashes(prior, batch, textCol, idCol, w)
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
  }

  /** Content-defined-boundary parameters for the CDC stream variant. */
  final case class CdcParams(hashW: Int = 8, maskBits: Int = 3,
      minTokens: Int = 4, maxTokens: Int = 16)

  /** [[writer]] with CONTENT-DEFINED chunk boundaries
    * ([[Dedup.cdcDedupRewriteAgainst]]): a re-ingested near-duplicate
    * with a local edit drops everything outside the edited neighborhood
    * against state admitted batches ago — the property fixed-w chunks
    * lose the moment an upstream source inserts a byte. Same state
    * artifact (8 B/chunk), same [[BatchDirs]] replay protocol; the
    * replay-convergence argument is chunker-independent (one batch owns
    * each admitted hash).
    */
  def cdcWriter(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      outDir: String,
      stateDir: String,
      p: CdcParams = CdcParams()
  ): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyCdcBatch(batch, batchId, textCol, idCol, outDir, stateDir, p)
    }

  /** One CDC micro-batch (also usable for batch backfill replays). */
  def applyCdcBatch(
      batch: DataFrame,
      batchId: Long,
      textCol: String,
      idCol: String,
      outDir: String,
      stateDir: String,
      p: CdcParams = CdcParams()
  ): Unit = {
    val spark = batch.sparkSession
    val prior = BatchDirs.read(spark, stateDir, excludeBatch = Some(batchId))
      .getOrElse(emptyHashes(spark))
      .select(col("h"))
    Dedup.cdcDedupRewriteAgainst(prior, batch, textCol, idCol,
        p.hashW, p.maskBits, p.minTokens, p.maxTokens)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    Dedup.admittedCdcChunkHashes(prior, batch, textCol, idCol,
        p.hashW, p.maskBits, p.minTokens, p.maxTokens)
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
  }

  /** Every rewritten document committed so far. Fails with a clear
    * message before the first batch commits.
    */
  def readRewritten(spark: SparkSession, outDir: String): DataFrame =
    BatchDirs.readAllOrFail(spark, outDir)

  private def emptyHashes(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("h", LongType))))
  }
}
