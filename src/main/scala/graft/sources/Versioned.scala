package graft.sources

import graft.operators.Diff
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot store: immutable parquet snapshots under
  * `base/v=N` with read-by-version and version-to-version diff — the
  * dataset-release workflow (reference tables are immutable snapshots;
  * this adds the release history a training-data pipeline keeps:
  * "what changed between corpus v7 and v8?").
  *
  * Deliberately NOT a table format: no transaction log, no concurrent
  * writers — one writer per release is the dataset-publishing model.
  * Each snapshot is a full copy; storage-frugal pipelines keep the
  * [[Diff]] output (id + status) per release instead of deep history.
  */
object Versioned {

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** COMMITTED versions only: a `v=N` directory counts once Spark's
    * `_SUCCESS` marker lands (the job-commit protocol) — a crash
    * mid-write leaves an uncommitted directory that readers never see
    * and the next [[write]] reclaims. Foreign entries under `base`
    * (backups, editor droppings) are ignored, not fatal.
    */
  def versions(spark: SparkSession, base: String): Seq[Int] = {
    val f = fs(spark, base)
    val p = new Path(base)
    if (!f.exists(p)) Seq.empty
    else
      f.listStatus(p).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.matches("v=\\d+") && f.exists(new Path(s"$base/$n/_SUCCESS")) =>
          n.drop(2).toInt
        }
        .sorted
  }

  def latestVersion(spark: SparkSession, base: String): Option[Int] =
    versions(spark, base).lastOption

  /** Write the next snapshot; returns its version number (1-based).
    * Publication is atomic at the `_SUCCESS` marker: an uncommitted
    * leftover from a crashed write at the same number is overwritten, a
    * COMMITTED version is never touched.
    */
  def write(df: DataFrame, base: String): Int = {
    val spark = df.sparkSession
    val next = latestVersion(spark, base).getOrElse(0) + 1
    val target = s"$base/v=$next"
    val f = fs(spark, base)
    val mode =
      if (f.exists(new Path(target)) && !f.exists(new Path(s"$target/_SUCCESS"))) "overwrite"
      else "errorifexists"
    df.write.mode(mode).parquet(target)
    next
  }

  /** Delete committed versions older than the newest `keep` (the
    * retention pass for continuously-written stores, e.g.
    * [[graft.streaming.CdcApply]]).
    */
  def prune(spark: SparkSession, base: String, keep: Int): Seq[Int] = {
    require(keep >= 1)
    val f = fs(spark, base)
    val doomed = versions(spark, base).dropRight(keep)
    doomed.foreach(v => f.delete(new Path(s"$base/v=$v"), true))
    doomed
  }

  def read(spark: SparkSession, base: String, version: Int): DataFrame =
    spark.read.parquet(s"$base/v=$version")

  def readLatest(spark: SparkSession, base: String): DataFrame =
    read(spark, base, latestVersion(spark, base)
      .getOrElse(throw new IllegalStateException(s"no versions under $base")))

  /** Row-level diff between two stored versions (added/removed/changed/
    * unchanged per key — see [[Diff.snapshotDiff]]).
    */
  def diff(spark: SparkSession, base: String, fromVersion: Int, toVersion: Int, keyCols: Seq[String]): DataFrame =
    Diff.snapshotDiff(read(spark, base, fromVersion), read(spark, base, toVersion), keyCols)
}
