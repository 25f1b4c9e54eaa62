package graft.streaming

import graft.functions.{TextFunctions => T}
import graft.text.Mixture
import graft.text.Mixture.SourceRate
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous domain-mixture sampling with EPOCH-FROZEN rates — the
  * streaming twin of [[Mixture.temperatureSample]]. A training epoch
  * needs ONE mixture: if per-source rates drifted with every arriving
  * micro-batch, two identical documents arriving an hour apart could
  * get different keep verdicts and the epoch's source distribution
  * would depend on arrival order. So the rate table is a frozen
  * artifact: computed once from a snapshot ([[freezeRates]]), applied
  * unchanged to every micro-batch, and re-frozen only at an explicit
  * epoch boundary ([[refreeze]]) from token stats the stream itself
  * accumulated.
  *
  * Keep decisions are a pure function of (id, source, rates) — the
  * [[Mixture.applyRates]] hash filter — so a document's verdict is
  * identical whether it arrives in batch 0, batch 40, or a backfill:
  * stream output ≡ batch [[Mixture.applyRates]] over the union of all
  * batches (spec-checked).
  *
  * Scale shape (100 TB/day ingest): the rate table is #sources rows,
  * broadcast; the per-batch cost is one scan-local filter plus one
  * source-granularity aggregation for the stats sidecar — nothing is
  * ever joined against history, and no state grows with the corpus
  * (unlike the dedup twins, a mixture needs NO memory of past docs —
  * only their per-source token sums, ~16 B/source/batch).
  *
  * Exactly-once across restarts: kept docs and stats land in
  * `batch=<id>` subdirectories ([[BatchDirs]]); a replayed micro-batch
  * overwrites its own previous output, and because rates are frozen
  * the replay reproduces it bit-for-bit.
  */
object StreamingMixture {

  /** Persist a rate table as the epoch artifact (overwrites — rates are
    * the epoch's single source of truth).
    */
  def freezeRates(spark: SparkSession, rates: Seq[SourceRate], ratesDir: String): Unit = {
    import spark.implicits._
    rates.toDF("source", "tokens", "rate")
      .coalesce(1).write.mode("overwrite").parquet(ratesDir)
  }

  /** The frozen epoch rates, ascending by source (the canonical order). */
  def readRates(spark: SparkSession, ratesDir: String): Seq[SourceRate] =
    spark.read.parquet(ratesDir)
      .collect()
      .map(r => SourceRate(r.getAs[String]("source"), r.getAs[Long]("tokens"), r.getAs[Double]("rate")))
      .sortBy(_.source).toSeq

  /** Wire a document stream into frozen-rate mixture sampling. Caller
    * sets checkpoint/trigger and starts the writer. Kept docs land under
    * `keptDir/batch=N/`, per-source token stats under `statsDir/batch=N/`.
    */
  def writer(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      sourceCol: String,
      ratesDir: String,
      keptDir: String,
      statsDir: String
  ): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, batchId, textCol, idCol, sourceCol, ratesDir, keptDir, statsDir)
    }

  /** One micro-batch (also usable for batch backfill replays): filter by
    * the frozen rates, record the batch's per-source token stats. Stats
    * cover the FULL batch (kept and dropped) — they describe the arriving
    * corpus, which is what the next epoch's rates must be computed from.
    */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      textCol: String,
      idCol: String,
      sourceCol: String,
      ratesDir: String,
      keptDir: String,
      statsDir: String
  ): Unit = {
    val spark = batch.sparkSession
    val rates = readRates(spark, ratesDir)
    // one pass over the batch text: stats aggregation and the kept
    // filter both read the batch, but the batch is micro-sized (and the
    // filter is scan-local) — no persist needed
    Mixture.applyRates(batch, idCol, sourceCol, rates)
      .write.mode("overwrite").parquet(s"$keptDir/batch=$batchId")
    batch
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(T.tokenCount(col(textCol)).cast("long")).as("tokens"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
  }

  /** Epoch boundary: recompute rates from ALL accumulated stats batches
    * and overwrite the frozen artifact. Token totals are sums, so the
    * merged stats equal a one-shot recompute over every doc the stream
    * has seen (spec-checked) — the incremental-domain-merge argument.
    */
  def refreeze(spark: SparkSession, statsDir: String, budgetFraction: Double,
      ratesDir: String): Seq[SourceRate] = {
    val stats = BatchDirs.readAllOrFail(spark, statsDir)
      .groupBy(col("source")).agg(sum(col("tokens")).as("tokens"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tokens"))).toSeq
    val rates = Mixture.ratesFromTokenCounts(stats, budgetFraction)
    freezeRates(spark, rates, ratesDir)
    rates
  }

  /** All kept docs so far. Fails with a clear message before the first
    * batch commits.
    */
  def readKept(spark: SparkSession, keptDir: String): DataFrame =
    BatchDirs.readAllOrFail(spark, keptDir)
}
