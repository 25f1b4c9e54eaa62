package graft.streaming

import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous ANN index maintenance: a stream of new embedding vectors
  * assigned to a persisted IVF index's EXISTING centroids (the build's
  * own assignment kernel, via the `_centroids` sidecar) and appended
  * micro-batch by micro-batch — the streaming twin of
  * [[Similarity.appendToIvfIndex]], for the ingest-while-you-serve shape
  * a corpus-scale vector store actually runs (10⁹ vectors indexed once,
  * thousands/sec arriving).
  *
  * Layout: `dir/batch=0/cell=C/` holds the initial build; each
  * micro-batch N lands WHOLE under `dir/batch=${N+1}/cell=C/`. Two
  * consequences, both deliberate:
  *
  *  - '''exactly-once across restarts''': a replayed micro-batch
  *    overwrites its OWN `batch=` directory (the bare `mode("append")`
  *    of the batch API would duplicate rows under replay — the reason
  *    the streaming twin uses a per-batch layout);
  *  - '''probe pruning intact''': `cell` stays a partition column of the
  *    ONE unified read ([[readIndex]]), so [[Similarity.ivfTopK]] probes
  *    get dynamic partition pruning exactly as against a batch-built
  *    index (the spec asserts the subquery).
  *
  * Per-batch manifest: `statsDir/batch=<id>` records (cell, n_rows) for
  * that batch — written AFTER the data (the engine-wide data-first /
  * manifest-last ordering), replay-idempotent, and batch-proportional;
  * total per-cell counts = the base sidecar + the batch manifests, with
  * no index-sized rescan anywhere.
  *
  * Scale shape: per batch, one broadcast of the tiny sidecar centroid
  * set, one map-side-combined assignment over the batch, one partitioned
  * write. Compaction of accumulated small batch files is the standard
  * maintenance pass ([[graft.sources.Layout.compact]] per cell).
  */
object StreamingAnnIndex {

  /** Write the initial index: the [[Similarity.ivfBuild]] result under
    * `batch=0` plus the appendable `_centroids` sidecar at the root
    * (data first, sidecar last).
    */
  def initialize(corpus: DataFrame, vecCol: String, idCol: String, nlist: Int,
      dir: String): Unit = {
    val indexed = Similarity.ivfBuild(corpus, vecCol, idCol, nlist).localCheckpoint(true)
    try {
      indexed.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/batch=0")
      // sidecar last, at the ROOT (one certification point for all batches)
      Similarity.writeIvfSidecarFor(indexed, dir, vecCol, idCol, nlist)
    } finally indexed.unpersist()
  }

  /** Wire a vector stream into continuous index maintenance. Caller sets
    * checkpoint/trigger and starts the writer.
    */
  def writer(
      vectors: DataFrame,
      vecCol: String,
      idCol: String,
      indexDir: String,
      statsDir: String
  ): DataStreamWriter[Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, batchId, vecCol, idCol, indexDir, statsDir)
    }

  /** One micro-batch (also usable for batch backfill replays). */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      vecCol: String,
      idCol: String,
      indexDir: String,
      statsDir: String
  ): Unit = {
    val (assigned, sidecar) =
      Similarity.assignAgainstSidecar(batch.drop("batch"), vecCol, idCol, indexDir)
    try {
      if (assigned == null) return // empty batch
      assigned.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$indexDir/batch=${batchId + 1}")
      // manifest last, per batch: replay overwrites both data and line
      assigned.groupBy(col("cell").cast("long").as("cell"))
        .agg(count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$statsDir/batch=${batchId + 1}")
      assigned.unpersist()
    } finally sidecar.unpersist()
  }

  /** The unified index: base build + every committed batch, `cell`
    * restored as a long partition column (probe-ready for
    * [[Similarity.ivfTopK]]).
    */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir)
      .withColumn("cell", col("cell").cast("long"))
      .withColumn("batch", col("batch").cast("long"))

  /** Per-cell row counts across base + batches: the base `_centroids`
    * sidecar counts plus every batch manifest — certification without an
    * index scan.
    */
  def cellCounts(spark: SparkSession, indexDir: String, statsDir: String): DataFrame = {
    val base = Similarity.loadIvfCentroids(spark, indexDir)
      .select(col("cell"), col("n_rows"))
    val batches =
      try spark.read.parquet(statsDir).select(col("cell").cast("long").as("cell"), col("n_rows"))
      catch { case e: Exception if e.getMessage != null &&
        e.getMessage.toLowerCase.contains("path does not exist") =>
        base.limit(0)
      }
    base.unionAll(batches).groupBy(col("cell"))
      .agg(sum(col("n_rows")).as("n_rows"))
  }
}
