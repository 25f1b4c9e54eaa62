package graft.streaming

import graft.functions.{TextFunctions => T}
import graft.sources.Export
import graft.text.Packing
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous training-data export — the streaming twin of
  * [[Export.writePackedShardsEpoch]], closing the curate→export pipeline's
  * continuous mode: each micro-batch of curated documents exports as ONE
  * epoch (epoch = the micro-batch id) of packed token shards under the
  * same `epoch=K/shard=J/` layout with the same merged `_manifest.jsonl`
  * certificate, so a downstream trainer consumes a continuously growing
  * shard directory whose manifest only ever lists complete epochs.
  *
  * The vocabulary is a FROZEN artifact ([[freezeVocabulary]] /
  * [[Export.packTokensWithVocab]]): token ids must mean the same thing in
  * epoch 400 as in epoch 0, so ids come from a tokenizer fixed before the
  * stream starts — per-batch vocabularies would silently re-map ids as
  * new tokens arrive. Out-of-vocabulary tokens surface as the explicit
  * `-1` sentinel (count them from the shards to decide when to retrain
  * the tokenizer and start a new export root).
  *
  * Exactly-once across restarts: a replayed micro-batch overwrites its
  * own `epoch=K/` directory and the manifest merge drops the stale
  * generation of its lines, so replay converges bit-for-bit — the
  * [[BatchDirs]] idempotence pattern carried through the manifest-last
  * commit ordering (a crash between data and manifest leaves the epoch
  * uncertified, and the replay certifies it).
  *
  * Scale shape: identical to the batch export — per batch, text never
  * shuffles; the one data-sized exchange moves (seq_id, seq_pos,
  * token_id) int triples on the uniform seq_id key; the manifest merge
  * is driver-side over O(epochs × shards) lines. State is the frozen
  * vocabulary only — nothing grows with the stream.
  */
object StreamingExport {

  /** Persist the frozen vocabulary artifact (overwrites — the vocabulary
    * is the export root's single source of token-id truth).
    */
  def freezeVocabulary(docs: DataFrame, textCol: String, vocabDir: String): Unit =
    Export.vocabulary(docs, textCol)
      .coalesce(1).write.mode("overwrite").parquet(vocabDir)

  /** The frozen vocabulary (schema of [[Export.vocabulary]]). */
  def readVocabulary(spark: SparkSession, vocabDir: String): DataFrame =
    spark.read.parquet(vocabDir)

  /** Wire a curated-document stream into per-batch epoch export. Caller
    * sets checkpoint/trigger and starts the writer.
    */
  def writer(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      vocabDir: String,
      seqLen: Int,
      nShards: Int,
      outDir: String
  ): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, batchId, idCol, textCol, sourceCol, vocabDir, seqLen, nShards, outDir)
    }

  /** One micro-batch (also usable for batch backfill replays): pack the
    * batch against the frozen vocabulary and commit it as epoch
    * `batchId` — data first, merged manifest last. Empty batches write
    * no data and certify nothing.
    */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      sourceCol: String,
      vocabDir: String,
      seqLen: Int,
      nShards: Int,
      outDir: String
  ): Unit = {
    if (batch.isEmpty) return
    val vocab = readVocabulary(batch.sparkSession, vocabDir)
    val spans = Packing.packSequences(batch, idCol, T.tokenCount(col(textCol)), seqLen)
    val packed = Export.packTokensWithVocab(batch, idCol, textCol, vocab, seqLen, nShards)
    Export.writePackedShardsEpoch(packed, spans, batch, idCol, sourceCol,
      seqLen, nShards, outDir, Math.toIntExact(batchId))
  }
}
