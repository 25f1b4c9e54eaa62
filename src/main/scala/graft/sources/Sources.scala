package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1). The reference's storage layer is
  * a single format (LZ4 Arrow IPC batch stores, reference
  * org.knime.core.columnar.arrow/.../offheap/OffHeapArrowBatchStore.java:67)
  * plus a row-push adapter (BufferedDataTableRowAccessible.java:68); the
  * engine's equivalents are Parquet as the canonical store plus the
  * formats a Spark user expects at the boundary. Schemas are explicit,
  * never inferred (reference ColumnarSchema semantics — SURVEY.md §1.3):
  * csv/json readers REQUIRE a schema.
  */
object Sources {

  /** Canonical store read (columnar, compressed, footer-indexed). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Arrow IPC batch store — the reference's NATIVE on-disk format
    * (LZ4-frame compressed; OffHeapArrowBatchStore.java:66). Day-one
    * migration path for existing columnar tables; see [[ArrowIpc]] for
    * the scale notes (one task per file; column pruning via the
    * `columns` overload; filter pushdown via batch statistics on
    * ENGINE-written stores — foreign files carry no stats and read
    * fully, so re-write through [[writeArrowIpc]] or migrate to parquet
    * for repeated filtered analytics over a foreign store).
    */
  def arrowIpc(spark: SparkSession, path: String): DataFrame =
    ArrowIpc.read(spark, path)

  /** Column-pruned Arrow IPC read: only the selected columns' buffer byte
    * ranges are read from each file (see [[ArrowIpc.read]] — zero body
    * IO/decompression/decode for unselected columns), the IPC analog of
    * parquet `ReadSchema` pruning.
    */
  def arrowIpc(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    ArrowIpc.read(spark, path, columns)

  def writeArrowIpc(df: DataFrame, path: String): Unit =
    ArrowIpc.write(df, path)

  /** ORC — second columnar interchange format (same pushdown/pruning
    * properties as parquet; for pipelines whose upstream emits ORC).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** CSV with explicit schema (no inference pass — one scan, not two). */
  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** JSON-lines with explicit schema. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines with malformed-row capture: bad lines land in
    * `corruptCol` instead of poisoning the load (PERMISSIVE mode made
    * explicit). At ingest scale, malformed rows are data to quarantine
    * and count, not a reason to fail a 100 TB job; pair with an `observe`
    * counter on `corruptCol IS NOT NULL`.
    *
    * With `pin = true` (default) the frame is lazily local-checkpointed:
    * Spark refuses queries that reference ONLY the internal
    * corrupt-record column of a raw file scan
    * (`.where(corrupt.isNotNull).count()` — the natural first query on
    * this reader — throws AnalysisException otherwise). The checkpoint
    * materializes the parsed data on first action (blocks release with
    * the reference) — the right trade for quarantine triage. For
    * straight-through bulk loads at ingest scale pass `pin = false`:
    * the scan stays lazy/recomputable and costs nothing extra, but
    * corrupt-column-only queries then need another data column in the
    * plan.
    */
  def jsonLinesQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: String = "_corrupt_record",
      pin: Boolean = true
  ): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(corruptCol)) schema
      else schema.add(corruptCol, org.apache.spark.sql.types.StringType, nullable = true)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
    if (pin) raw.localCheckpoint(false) else raw
  }

  /** In-memory rows → table (the row-push adapter analog at the API edge:
    * reference ColumnarDataContainerDelegate.addRowToTable — row-at-a-time
    * only ever at boundaries, columnar within).
    */
  def fromRows(spark: SparkSession, rows: Seq[org.apache.spark.sql.Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
