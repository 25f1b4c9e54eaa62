package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout control for the store: hash-bucketed tables (co-located,
  * shuffle-free joins/aggregations on the bucket key) and hive-style
  * partitioned directories (partition pruning at the scan).
  *
  * This is where the engine's 100 TB story lives for repeated workloads:
  *  - bucket both fact tables on the join key once at write time → every
  *    subsequent join on that key is exchange-free (SortMergeJoin reads
  *    bucket-aligned splits);
  *  - partition event/fact data by coarse keys (date, source) → predicate
  *    on the partition column prunes directories before any I/O.
  * The reference has no distributed layout concept (single-machine batch
  * files); this is pure new capability from the Spark runtime.
  */
object Layout {

  /** Write a bucketed+sorted table into the session catalog (parquet under
    * spark.sql.warehouse.dir). Readers get bucket-aligned scans.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None
  ): Unit = {
    val spark = df.sparkSession
    // overwrite semantics across sessions: an in-memory catalog forgets the
    // table between JVMs while its warehouse directory survives — drop both
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, tableName)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val w = df.write.mode("overwrite").format("parquet").bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(tableName)
  }

  def readTable(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)

  /** Hive-style partitioned write; a filter on `partitionCol` prunes
    * directories (PartitionFilters in the scan, zero I/O for pruned
    * partitions).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
