package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous near-dedup: a document stream filtered so each micro-batch
  * admits only docs that are not near-duplicates of previously-ADMITTED
  * docs (nor of lower-id peers in the same batch) — the streaming twin of
  * [[Dedup.minHashIncremental]].
  *
  * The only persistent state is the admitted docs' signature table
  * (~100 B/doc: id + 64-lane MinHash signature + shingle-hash set), the
  * same artifact a batch ingest pipeline stores between runs
  * ([[Dedup.minHashSignatureTable]]) — document text is NEVER rescanned.
  * At 100 TB/day ingest the per-batch cost is
  * batch × (stored signatures via LSH band join), not batch × corpus.
  *
  * Exactly-once across restarts: survivors AND their signatures land in
  * `batch=<id>` subdirectories, so a replayed micro-batch (stream
  * checkpoint behind the last commit) OVERWRITES its own previous output
  * instead of appending duplicates; batches are deduped against the
  * signature state as of their first run, which the replay reproduces
  * (signature reads exclude the replaying batch's own directory).
  */
object StreamingDedup {

  /** Wire a document stream into continuous near-dedup. Caller sets
    * checkpoint/trigger and starts the writer. Survivors land under
    * `survivorsDir/batch=N/`, signatures under `sigDir/batch=N/`.
    */
  def writer(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      survivorsDir: String,
      sigDir: String,
      threshold: Double = 0.7,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16
  ): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, batchId, textCol, idCol, survivorsDir, sigDir,
        threshold, shingleSize, numHashes, bands)
    }

  /** One micro-batch (also usable for batch backfill replays). */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      textCol: String,
      idCol: String,
      survivorsDir: String,
      sigDir: String,
      threshold: Double,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16
  ): Unit = {
    val spark = batch.sparkSession
    // state as of this batch's FIRST run: every batch directory except our
    // own (a replay must not dedup the batch against its own signatures)
    val corpusSigs = readSignatures(spark, sigDir, excludeBatch = Some(batchId))
    val survivors = (corpusSigs match {
      case Some(sigs) =>
        Dedup.minHashIncrementalAgainst(sigs, batch, textCol, idCol,
          shingleSize, numHashes, bands, threshold)
      case None => // first batch: dedup only within itself
        Dedup.minHashIncrementalAgainst(
          emptySignatures(spark), batch, textCol, idCol,
          shingleSize, numHashes, bands, threshold)
    }).localCheckpoint(true)
    survivors.write.mode("overwrite").parquet(s"$survivorsDir/batch=$batchId")
    Dedup.minHashSignatureTable(survivors, textCol, idCol, shingleSize, numHashes)
      .write.mode("overwrite").parquet(s"$sigDir/batch=$batchId")
  }

  /** All admitted survivors so far. */
  def readSurvivors(spark: SparkSession, survivorsDir: String): DataFrame =
    spark.read.option("basePath", survivorsDir).parquet(s"$survivorsDir/batch=*")

  private def emptySignatures(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
      StructField("id", LongType), StructField("sig", ArrayType(LongType, containsNull = false)),
      StructField("shset", ArrayType(LongType, containsNull = false)))))
  }

  private def readSignatures(spark: SparkSession, sigDir: String, excludeBatch: Option[Long]): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(sigDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val dirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filterNot(s => excludeBatch.exists(b => s.getPath.getName == s"batch=$b"))
      .map(_.getPath.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", sigDir).parquet(dirs: _*))
  }
}
