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
    // stale-location cleanup through the Hadoop FS (the warehouse may be
    // HDFS/S3 — java.nio would silently miss it and saveAsTable would
    // fail with "location already exists" forever after)
    val loc = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), tableName)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet").bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(tableName)
  }

  def readTable(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)

  /** Hive-style partitioned write; a filter on `partitionCol` prunes
    * directories (PartitionFilters in the scan, zero I/O for pruned
    * partitions).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    graft.table.WriteModes.staticPartitionOverwrite(df, path, partitionCols: _*)

  /** Globally-sorted parquet layout: range-repartition on the sort key
    * (one sampling pass + one shuffle), sort within partitions, write one
    * file per range. Files then hold DISJOINT key ranges in order, so a
    * range predicate prunes whole files via parquet min/max row-group
    * stats — the scan-pruning analog of the reference's batch-offset
    * random access (reference
    * org.knime.core.columnar.arrow/.../ArrowBatchStore.java:57-62).
    * `numFiles` sizes the layout: at 100 TB pick total/128 MiB-ish; the
    * range exchange is AQE-skew-safe (sampled bounds, not hash).
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String], numFiles: Int): Unit = {
    require(sortCols.nonEmpty && numFiles >= 1)
    import org.apache.spark.sql.functions.col
    val keys = sortCols.map(col)
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max of `keyCol` — the layout check for [[writeSorted]]
    * (disjoint ranges ⇒ file-level pruning works). One aggregation over
    * the file-name pseudo-column.
    */
  def fileKeyRanges(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"), count(lit(1)).as("rows"))
  }

  /** Per-file scan-parallelism diagnostic: (file, bytes, row_groups,
    * rows) from the parquet FOOTERS (no data read), plus the fact the
    * split planner cannot see — the number of concurrent readers a scan
    * of this table can actually use is `Σ row_groups`, NOT the byte-range
    * split count. A file written as one giant row group yields exactly
    * one working task no matter how small `maxPartitionBytes` goes: the
    * split containing the row-group start reads everything, every other
    * split reads nothing. Caught live at the 100× scale tier, where a
    * single-row-group 500 k-doc table serialized every compute-dense
    * pipeline (tokenize / MinHash / codec UDFs) on one core while 13
    * empty splits reported healthy parallelism — SCALE.md round 9.
    *
    * Footers are read on the driver (this is an ops diagnostic for
    * tables with a bounded file count; at fleet scale, sample the files).
    * The fix at write time: size row groups for compute density
    * (`parquet.block.size`, or many files), the discipline
    * [[writeSorted]]/[[compact]] inherit from Spark's one-file-per-task
    * writers.
    */
  def scanParallelism(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = FsWalk.files(fs, root)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val rows = files.map { s =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        (s.getPath.toString, s.getLen, blocks.size().toLong,
          (0 until blocks.size()).map(blocks.get(_).getRowCount).sum)
      } finally reader.close()
    }
    import spark.implicits._
    rows.toDF("file", "bytes", "row_groups", "rows")
  }

  /** Z-order (Morton-curve) layout: quantize each clustering column to a
    * 16-bit cell by min/max scaling (one tiny agg job), interleave cells
    * into one Long sort key (codegen'd [[graft.expressions.ZOrder]]), then
    * range-partition + sort by it. Files then cover small rectangles of
    * the multi-dimensional key space, so predicates on ANY clustered
    * column prune files via parquet min/max stats — where a single-column
    * sort prunes only its leading column (the OPTIMIZE ZORDER analog;
    * Morton-curve locality is public knowledge). Linear quantization
    * assumes roughly-uniform columns; heavily skewed columns should be
    * pre-transformed (log/rank) by the caller.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String], numFiles: Int): Unit = {
    require(cols.size >= 2 && cols.size <= 4, s"z-order takes 2-4 columns, got ${cols.size}")
    require(numFiles >= 1)
    import org.apache.spark.sql.functions._
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"${c}__min"), max(col(c).cast("double")).as(s"${c}__max")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val cells = cols.map { c =>
      val lo = bounds.getAs[Double](s"${c}__min")
      val hi = bounds.getAs[Double](s"${c}__max")
      val span = if (hi > lo) hi - lo else 1.0
      ((col(c).cast("double") - lit(lo)) / lit(span) * lit(65535.0)).cast("int")
    }
    val zCol = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.ZOrder(cells.map(org.apache.spark.sql.graftbridge.Bridge.expression)))
    val tmp = "__graft_z"
    df.withColumn(tmp, zCol)
      .repartitionByRange(numFiles, col(tmp))
      .sortWithinPartitions(col(tmp))
      .drop(tmp)
      .write.mode("overwrite").parquet(path)
  }

  /** Layout REMEDIATION for foreign parquet (the fix for the
    * [[scanParallelism]] diagnosis): rewrite a directory whose row-group
    * layout starves the scan into `targetParallelism` files of
    * row groups no larger than `maxRowGroupBytes` — so a subsequent scan
    * can run ≥ `targetParallelism` concurrent readers regardless of
    * `maxPartitionBytes`. This is the one-off fix users apply to
    * ingested parquet they didn't write: pyarrow's defaults put ≤1M-row
    * tables in ONE row group, which serializes every compute-dense pass
    * (tokenize / MinHash / codec UDFs) on one core while the byte-range
    * split planner reports healthy-looking empty splits (SCALE.md
    * round 9 finding 0; the reference sizes batches on rewrite for the
    * same reason — BatchSizeRecorder in its store layer). Round-robin
    * repartition: contents and schema unchanged; returns the file count.
    *
    * Cost: one full read + shuffle + write of the directory — worth it
    * exactly when the table is re-scanned by compute-dense work. For a
    * ONE-SHOT pipeline, skip the rewrite and use
    * [[repartitionForCompute]] inside the query instead.
    */
  def rewriteForCompute(spark: SparkSession, inPath: String, outPath: String,
      targetParallelism: Int, maxRowGroupBytes: Long = 128L << 20): Int = {
    require(targetParallelism >= 1, s"rewriteForCompute: targetParallelism $targetParallelism < 1")
    require(maxRowGroupBytes >= (1L << 16),
      s"rewriteForCompute: maxRowGroupBytes $maxRowGroupBytes below parquet's useful minimum")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    // enough files that each holds ≥1 row group at the target size even
    // if the writer never splits within a file; block.size bounds groups
    // inside big files on top of that
    val n = math.max(targetParallelism,
      math.ceil(totalBytes.toDouble / maxRowGroupBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode("overwrite")
      .option("parquet.block.size", maxRowGroupBytes.toString)
      .parquet(outPath)
    n
  }

  /** In-query remediation twin of [[rewriteForCompute]]: one round-robin
    * exchange that breaks a row-group-bound scan's parallelism ceiling
    * for the COMPUTE that follows (the scan itself stays serialized —
    * only a rewrite fixes that — but everything downstream of the
    * exchange fans out to `partitions`). Use when the expensive pass is
    * one-shot and a full directory rewrite isn't worth it; defaults to
    * 2 waves per core so AQE/stragglers still balance.
    */
  def repartitionForCompute(df: DataFrame, partitions: Int = 0): DataFrame = {
    val n =
      if (partitions > 0) partitions
      else 2 * df.sparkSession.sparkContext.defaultParallelism
    df.repartition(n)
  }

  /** Compact a parquet directory to ~`targetFileBytes` files (the
    * small-files maintenance pass every long-lived 100 TB store needs:
    * streaming ingest and per-batch writes fragment directories; scan
    * throughput collapses when file count ≫ executor count). File count
    * is computed from the directory's ACTUAL bytes on disk, not
    * estimated row widths. Round-robin repartition — contents and schema
    * are unchanged.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).repartition(n).write.mode("overwrite").parquet(outPath)
    n
  }
}
