package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `batch=N` directory convention shared by the streaming dedup
  * twins ([[StreamingDedup]], [[StreamingMediaDedup]],
  * [[StreamingSemDedup]]) and their exactly-once replay protocol: each
  * micro-batch owns one subdirectory it OVERWRITES on replay, state
  * reads exclude the replaying batch's own directory, and survivor
  * reads fail clearly before the first commit. One implementation so
  * the exclusion/commit-dir semantics cannot diverge between the twins.
  */
private[streaming] object BatchDirs {

  /** All committed `batch=N` subdirectories of `dir` except
    * `excludeBatch`'s; None when none exist (first batch, or a lone
    * replay).
    */
  def read(spark: SparkSession, dir: String, excludeBatch: Option[Long]): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val dirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filterNot(s => excludeBatch.exists(b => s.getPath.getName == s"batch=$b"))
      .map(_.getPath.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", dir).parquet(dirs: _*))
  }

  /** Every committed batch; fails with a clear message before the first
    * commit (the schema is unknowable until then).
    */
  def readAllOrFail(spark: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val any = fs.exists(root) &&
      fs.listStatus(root).exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!any) throw new IllegalStateException(
      s"no committed batches under $dir yet — the stream has not produced output")
    spark.read.option("basePath", dir).parquet(s"$dir/batch=*")
  }
}
