package graft.streaming

import graft.text.Bm25
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous BM25 index maintenance — the streaming twin of
  * [[Bm25.mergeIndex]]: each micro-batch of documents becomes one index
  * SEGMENT (postings + df sidecar + scalar stats) written under its own
  * `batch=N` directory; the queryable index is the merge-at-read of all
  * committed segments, exactly what [[Bm25.mergeIndex]] computes, so
  * stream-then-query ≡ batch-rebuild (spec-asserted).
  *
  * State and cost: the stored artifact is postings/df/stats — document
  * text is never kept or rescanned; a micro-batch costs one tokenize +
  * one (doc,term) aggregation over ITSELF only. Read-side merge is a
  * vocabulary-keyed df sum and a metadata-sized stats sum; at scale,
  * periodic segment compaction (rewriting many `batch=N` posting dirs
  * into one) bounds file counts without changing any semantics —
  * df re-aggregation is the same query either way.
  *
  * Exactly-once: the [[BatchDirs]] replay protocol — a replayed batch
  * OVERWRITES its own three segment directories, so restart-from-
  * checkpoint cannot double-count documents (each doc contributes to
  * exactly one segment; the caller streams each doc once, the same
  * disjointness contract as [[Bm25.mergeIndex]]).
  */
object StreamingBm25 {

  /** Wire a document stream into continuous indexing. Caller sets
    * checkpoint/trigger and starts the writer.
    */
  def writer(docs: DataFrame, textCol: String, idCol: String, indexDir: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, batchId, textCol, idCol, indexDir)
    }

  /** One micro-batch → one segment (also usable for batch backfills). */
  def applyBatch(batch: DataFrame, batchId: Long, textCol: String, idCol: String,
      indexDir: String): Unit = {
    val seg = Bm25.buildIndex(batch, textCol, idCol)
    seg.postings.write.mode("overwrite").parquet(s"$indexDir/postings/batch=$batchId")
    seg.dfTab.write.mode("overwrite").parquet(s"$indexDir/df/batch=$batchId")
    val spark = batch.sparkSession
    import spark.implicits._
    Seq((seg.nDocs, seg.sumLen)).toDF("n_docs", "sum_len")
      .write.mode("overwrite").parquet(s"$indexDir/stats/batch=$batchId")
  }

  /** The merged index over all committed segments. Fails with a clear
    * message before the first batch commits.
    */
  def readIndex(spark: SparkSession, indexDir: String): Bm25.Index = {
    val postings = BatchDirs.readAllOrFail(spark, s"$indexDir/postings").drop("batch")
    val df = BatchDirs.readAllOrFail(spark, s"$indexDir/df")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val stats = BatchDirs.readAllOrFail(spark, s"$indexDir/stats")
      .agg(coalesce(sum(col("n_docs")), lit(0L)), coalesce(sum(col("sum_len")), lit(0L))).head()
    Bm25.Index(postings, df, stats.getLong(0), stats.getLong(1))
  }

  /** Query the streamed index — [[Bm25.scoreTopK]] over [[readIndex]]. */
  def topK(spark: SparkSession, indexDir: String, queries: DataFrame, textCol: String,
      idCol: String, k: Int = 5): DataFrame =
    Bm25.scoreTopK(readIndex(spark, indexDir), queries, textCol, idCol, k)

  /** Fold all committed segments into a [[graft.text.Bm25Store]]
    * artifact — the segment-compaction pass the class doc promises,
    * landing directly in the bucketed SERVING shape: reads prune to the
    * query vocabulary's buckets ([[graft.text.Bm25Store.scoreTopKPersisted]])
    * and future ingest folds in through [[graft.text.Bm25Store.append]]
    * without this stream. Scores from the compacted artifact are
    * bit-identical to [[topK]] (merge-at-read ≡ merge-at-write — both
    * are [[Bm25.mergeIndex]]'s df sum and stats add; spec-asserted).
    */
  def compactTo(spark: SparkSession, indexDir: String, outDir: String,
      nBuckets: Int = 64): Unit =
    graft.text.Bm25Store.save(readIndex(spark, indexDir), outDir, nBuckets)
}
