package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous ingestion-rate monitoring: the streaming twin of
  * [[graft.operators.Anomaly.rateZ]]. Each micro-batch contributes its
  * per-(key, bucket) event-count DELTAS — pure integers, so merging
  * state is Long addition (exactly commutative: replay order, batch
  * boundaries, and partitioning cannot change a bit, the same
  * merge ≡ recompute contract as the domain/HLL/KLL incremental
  * stats). The z-score math runs at READ time over the summed counts,
  * so the served result is IDENTICAL to the batch operator over the
  * concatenated stream — a bucket that spans micro-batches (the common
  * case: an hour crossing a trigger boundary) sums correctly where
  * per-batch z-scores would not.
  *
  * Layout: the [[BatchDirs]] `batch=N` convention — each micro-batch
  * owns one delta directory it overwrites on replay (exactly-once),
  * state size is bounded by (#keys × #buckets), never by event volume.
  */
object StreamingAnomaly {

  /** Wire an event stream into per-batch delta accumulation. Caller
    * sets checkpoint/trigger and starts the writer.
    */
  def writer(events: DataFrame, keyCol: String, tsCol: String, bucket: String,
      dir: String): DataStreamWriter[Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, batchId, keyCol, tsCol, bucket, dir)
    }

  /** One micro-batch: write its (key, bucket, n) delta under its own
    * `batch=` directory (idempotent under replay by construction).
    */
  def applyBatch(batch: DataFrame, batchId: Long, keyCol: String, tsCol: String,
      bucket: String, dir: String): Unit =
    batch.groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$dir/batch=$batchId")

  /** Serve the current anomaly table: sum the per-batch deltas to exact
    * per-(key, bucket) counts, then apply the batch operator's exact
    * z-score expression — bit-identical to running
    * [[graft.operators.Anomaly.rateZ]] over all events ever streamed.
    */
  def readAnomalies(spark: SparkSession, dir: String, keyCol: String,
      zThreshold: Double = 3.0): DataFrame =
    graft.operators.Anomaly.zFromCounts(summedCounts(spark, dir, keyCol), keyCol, zThreshold)

  /** The drift readout over the same delta state — bit-identical to
    * [[graft.operators.Anomaly.rateTrend]] over the concatenated stream.
    */
  def readTrend(spark: SparkSession, dir: String, keyCol: String): DataFrame =
    graft.operators.Anomaly.trendFromCounts(summedCounts(spark, dir, keyCol), keyCol)

  private def summedCounts(spark: SparkSession, dir: String, keyCol: String): DataFrame =
    BatchDirs.readAllOrFail(spark, dir)
      .groupBy(col(keyCol), col("bucket")).agg(sum(col("n")).as("n"))
}
